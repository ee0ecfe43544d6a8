package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.TimeMachineSink

/** [[TimeMachineSink.maintainAggregate]] delta-rule edge cases the events
  * fixture cannot exercise: deletes (retract-only), group-key moves
  * (retract in one group, assert in another), brand-new keys, and a group
  * whose count reaches zero vanishing from the view. Every case is checked
  * ≡ the full recompute over the merged cell history. */
class AggMaintainSpec extends SparkTestBase {
  import spark.implicits._

  private def cells(rows: (String, String, String, Long, Long)*): DataFrame =
    rows.toSeq.toDF("row_key", "column", "value", "cell_ts", "event_id")
      .withColumn("table", lit("t"))
      .select("table", "row_key", "column", "value", "cell_ts", "event_id")

  private def rowCells(key: String, grp: String, v: String, ts: Long,
      id: Long, status: String): Seq[(String, String, String, Long, Long)] =
    Seq((key, "event_type", grp, ts, id), (key, "value", v, ts, id),
      (key, "row_status", status, ts, id))

  private def fullAgg(allCells: DataFrame): Map[String, (Long, BigDecimal)] =
    TimeMachineSink.rowsAsOfCells(allCells)
      .select(element_at(col("cols"), "event_type").as("grp"),
        element_at(col("cols"), "value").cast("decimal(18,2)").as("v"))
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_value"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap

  private def maintained(snapshot: DataFrame, batch: DataFrame): Map[String, (Long, BigDecimal)] = {
    val stored = TimeMachineSink.rowsAsOfCells(snapshot)
      .select(element_at(col("cols"), "event_type").as("grp"),
        element_at(col("cols"), "value").cast("decimal(18,2)").as("v"))
      .groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(col("v")).as("sum_value"))
    TimeMachineSink.maintainAggregate(stored, snapshot, batch, "event_type", "value")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), BigDecimal(r.getDecimal(2))))).toMap
  }

  private val snapshot = cells(
    (rowCells("r1", "a", "10.00", 100L, 1L, "I") ++
      rowCells("r2", "a", "5.00", 100L, 2L, "I") ++
      rowCells("r3", "b", "1.00", 100L, 3L, "I")): _*)

  test("update, delete, group move, and insert in one batch ≡ full recompute") {
    val batch = cells(
      (rowCells("r1", "a", "20.00", 200L, 10L, "U") ++ // value update in place
        rowCells("r2", "a", "5.00", 200L, 11L, "D") ++ // delete
        rowCells("r3", "a", "1.00", 200L, 12L, "U") ++ // b -> a group move
        rowCells("r4", "b", "7.00", 200L, 13L, "I")): _*) // new key
    val got = maintained(snapshot, batch)
    val want = fullAgg(snapshot.unionByName(batch))
    assert(got == want)
    assert(got == Map(
      "a" -> ((2L, BigDecimal("21.00"))),
      "b" -> ((1L, BigDecimal("7.00")))))
  }

  test("a group retracted to zero vanishes from the view") {
    val batch = cells(rowCells("r3", "b", "1.00", 200L, 10L, "D"): _*)
    val got = maintained(snapshot, batch)
    assert(!got.contains("b"))
    assert(got("a") == ((2L, BigDecimal("15.00"))))
    assert(got == fullAgg(snapshot.unionByName(batch)))
  }

  test("empty batch leaves the view unchanged") {
    val got = maintained(snapshot, snapshot.limit(0))
    assert(got == fullAgg(snapshot))
  }

  test("multi-version batch: only the final state of a key contributes") {
    val batch = cells(
      (rowCells("r1", "a", "11.00", 200L, 10L, "U") ++
        rowCells("r1", "b", "12.00", 300L, 11L, "U") ++
        rowCells("r4", "c", "2.00", 200L, 12L, "I") ++
        rowCells("r4", "c", "2.00", 300L, 13L, "D")): _*)
    val got = maintained(snapshot, batch)
    val want = fullAgg(snapshot.unionByName(batch))
    assert(got == want)
    // r1 ended in b at 12.00; r4 inserted then deleted contributes nothing
    assert(got("b") == ((2L, BigDecimal("13.00"))))
    assert(!got.contains("c"))
  }
}
