package graft

import org.apache.spark.sql.functions._
import graft.streaming.TimeMachineSink

/** Point-in-time reconstruction over the versioned cell store
  * ([[TimeMachineSink.rowsAsOfCells]]): the timestamped-get semantics of
  * the reference's HBase time machine — deletes before T erase the row,
  * deletes after T don't, and a T inside a transaction's 50µs version band
  * reconstructs exactly the cells at or before T. */
class AsOfStateSpec extends SparkTestBase {
  import spark.implicits._

  // k1: INSERT @1s, UPDATE @2s, DELETE @3s. k2: INSERT @2s.
  private def cells() = {
    val stamped = Seq(
      ("u1", 1L, 1000L, 0, 1L, 900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "1", "b" -> "x")),
      ("u2", 2L, 2000L, 0, 2L, 1900L, "t", "UPDATE", "k1", Map("a" -> "1", "b" -> "x"), Map("a" -> "2", "b" -> "x")),
      ("u3", 3L, 3000L, 0, 3L, 2900L, "t", "DELETE", "k1", Map("a" -> "2", "b" -> "x"), Map.empty[String, String]),
      ("u4", 4L, 2000L, 0, 4L, 1900L, "t", "INSERT", "k2", Map.empty[String, String], Map("a" -> "9"))
    ).toDF("txnUuid", "xxid", "commitTsMs", "chunk", "eventId", "tsMs", "table", "kind", "rowKey", "before", "after")
    TimeMachineSink.organize(TimeMachineSink.mutationCells(stamped))
  }

  private def stateAt(asOfMicros: Long): Map[String, (Option[String], String, Long)] =
    TimeMachineSink.rowsAsOfCells(cells().filter(col("cell_ts") <= asOfMicros))
      .select(col("row_key"), element_at(col("cols"), "a").as("a"),
        element_at(col("cols"), "row_status").as("st"), col("state_ts"))
      .as[(String, Option[String], String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("between versions: both rows live, k1 shows the update") {
    val s = stateAt(2500L * 1000)
    assert(s.keySet == Set("k1", "k2"))
    assert(s("k1") == ((Some("2"), "U", 2000L * 1000 - 50)))
    assert(s("k2") == ((Some("9"), "I", 2000L * 1000 - 50)))
  }

  test("after the delete: k1 does not exist at T, k2 still does") {
    val s = stateAt(3500L * 1000)
    assert(s.keySet == Set("k2"))
  }

  test("before the update's version timestamp: k1 shows the insert") {
    val s = stateAt(1500L * 1000)
    assert(s == Map("k1" -> ((Some("1"), "I", 1000L * 1000 - 50))))
  }

  test("T before any version: empty state") {
    assert(stateAt(100L * 1000).isEmpty)
  }

  // ---- incremental snapshot maintenance (applyIncremental) ----

  // k1 updated then deleted IN THE BATCH; k2 only in history; k3 first
  // seen in the batch — the three interesting key classes
  private def incrementalFixture() = {
    val hist = Seq(
      ("u1", 1L, 1000L, 0, 1L, 900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "1")),
      ("u2", 2L, 2000L, 0, 2L, 1900L, "t", "INSERT", "k2", Map.empty[String, String], Map("a" -> "5"))
    ).toDF("txnUuid", "xxid", "commitTsMs", "chunk", "eventId", "tsMs", "table", "kind", "rowKey", "before", "after")
    val batch = Seq(
      ("u3", 3L, 3000L, 0, 3L, 2900L, "t", "UPDATE", "k1", Map("a" -> "1"), Map("a" -> "2")),
      ("u4", 4L, 4000L, 0, 4L, 3900L, "t", "DELETE", "k1", Map("a" -> "2"), Map.empty[String, String]),
      ("u5", 5L, 4000L, 0, 5L, 3900L, "t", "INSERT", "k3", Map.empty[String, String], Map("a" -> "7"))
    ).toDF("txnUuid", "xxid", "commitTsMs", "chunk", "eventId", "tsMs", "table", "kind", "rowKey", "before", "after")
    (TimeMachineSink.organize(TimeMachineSink.mutationCells(hist)),
      TimeMachineSink.organize(TimeMachineSink.mutationCells(batch)))
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("row_key"), element_at(col("cols"), "a").as("a"),
        element_at(col("cols"), "row_status").as("st"), col("state_ts"))
      .as[(String, Option[String], String, Long)].collect().sortBy(_._1).toSeq

  test("applyIncremental equals the full recompute: delete erases, batch-only key appears") {
    val (hist, batch) = incrementalFixture()
    val snapshot = TimeMachineSink.latestCellsKeyed(hist)
    val applied = TimeMachineSink.rowsAsOfCells(
      TimeMachineSink.applyIncremental(snapshot, batch))
    val full = TimeMachineSink.rowsAsOfCells(hist.unionByName(batch))
    assert(rows(applied) == rows(full))
    // and the semantics are right: k1 deleted, k2 untouched passthrough,
    // k3 born in the batch
    assert(rows(applied).map(_._1) == Seq("k2", "k3"))
  }

  test("applyIncremental with an empty batch is the identity on the snapshot") {
    val (hist, batch) = incrementalFixture()
    val snapshot = TimeMachineSink.latestCellsKeyed(hist)
    val applied = TimeMachineSink.rowsAsOfCells(
      TimeMachineSink.applyIncremental(snapshot, batch.filter(col("event_id") < 0)))
    assert(rows(applied) == rows(TimeMachineSink.rowsAsOfCells(hist)))
  }
}
