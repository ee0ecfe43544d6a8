package graft

import org.apache.spark.sql.functions._
import graft.streaming.TimeMachineSink

/** SCD Type-2 interval build ([[TimeMachineSink.scd2Intervals]]) and
  * point-in-time diff ([[TimeMachineSink.snapshotDiff]]) over the versioned
  * cell store — the delete/reinsert paths the parquet fixture (no DELETEs)
  * cannot exercise: a DELETE closes the preceding interval but opens none
  * (a validity gap), a reinsert opens a fresh current interval, and the
  * diff classifies add/remove/change against states at T1/T2. */
class Scd2DiffSpec extends SparkTestBase {
  import spark.implicits._

  // k1: INSERT a=1 @1s, UPDATE a=2 @2s, DELETE @3s, re-INSERT a=3 @4s.
  // k2: INSERT a=9 @2s, never touched again.
  private def cells() = {
    val stamped = Seq(
      ("u1", 1L, 1000L, 0, 1L, 900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "1")),
      ("u2", 2L, 2000L, 0, 2L, 1900L, "t", "UPDATE", "k1", Map("a" -> "1"), Map("a" -> "2")),
      ("u3", 3L, 3000L, 0, 3L, 2900L, "t", "DELETE", "k1", Map("a" -> "2"), Map.empty[String, String]),
      ("u4", 4L, 4000L, 0, 4L, 3900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "3")),
      ("u5", 5L, 2000L, 0, 5L, 1900L, "t", "INSERT", "k2", Map.empty[String, String], Map("a" -> "9"))
    ).toDF("txnUuid", "xxid", "commitTsMs", "chunk", "eventId", "tsMs", "table", "kind", "rowKey", "before", "after")
    TimeMachineSink.organize(TimeMachineSink.mutationCells(stamped))
  }

  private def ts(ms: Long): Long = ms * 1000 - 50

  test("scd2Intervals: versioned intervals with a delete gap and a current reinsert") {
    val iv = TimeMachineSink.scd2Intervals(cells(), Seq("a"))
      .select(col("row_key"), col("valid_from"), col("valid_to"),
        col("is_current"), col("a"))
      .as[(String, Long, Option[Long], Boolean, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(iv == Seq(
      ("k1", ts(1000), Some(ts(2000)), false, "1"),
      ("k1", ts(2000), Some(ts(3000)), false, "2"),
      // the DELETE version [3s, 4s) is a gap — no interval row
      ("k1", ts(4000), None, true, "3"),
      ("k2", ts(2000), None, true, "9")))
  }

  test("scd2Intervals: attribute carried forward across a version that didn't touch it") {
    // add a second attribute b set only at insert time; the update at 2s
    // changes a but not b, so b must carry into the [2s,3s) interval
    val stamped = Seq(
      ("u1", 1L, 1000L, 0, 1L, 900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "1", "b" -> "x")),
      ("u2", 2L, 2000L, 0, 2L, 1900L, "t", "UPDATE", "k1", Map("a" -> "1", "b" -> "x"), Map("a" -> "2", "b" -> "x"))
    ).toDF("txnUuid", "xxid", "commitTsMs", "chunk", "eventId", "tsMs", "table", "kind", "rowKey", "before", "after")
    val iv = TimeMachineSink.scd2Intervals(
        TimeMachineSink.organize(TimeMachineSink.mutationCells(stamped)), Seq("a", "b"))
      .select(col("valid_from"), col("a"), col("b"))
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(iv == Seq((ts(1000), "1", "x"), (ts(2000), "2", "x")))
  }

  private def diff(t1Ms: Long, t2Ms: Long): Seq[(String, String, Option[String], Option[String])] =
    TimeMachineSink.snapshotDiff(cells(), lit(t1Ms * 1000), lit(t2Ms * 1000), Seq("a"))
      .select(col("row_key"), col("change_type"), col("old_a"), col("new_a"))
      .as[(String, String, Option[String], Option[String])]
      .collect().sortBy(_._1).toSeq

  test("snapshotDiff: update classifies C, fresh insert classifies A") {
    assert(diff(1500, 2500) == Seq(
      ("k1", "C", Some("1"), Some("2")),
      ("k2", "A", None, Some("9"))))
  }

  test("snapshotDiff: delete classifies R; untouched keys are absent") {
    assert(diff(2500, 3500) == Seq(("k1", "R", Some("2"), None)))
  }

  test("snapshotDiff: delete + reinsert across the window is a change, not a remove") {
    assert(diff(2500, 4500) == Seq(("k1", "C", Some("2"), Some("3"))))
  }

  test("snapshotDiff: empty window diffs empty") {
    assert(diff(4500, 5000).isEmpty)
  }

  // ---- incremental SCD2 maintenance (applyScd2 / maintainScd2) ----

  private def stampedOf(rows: Seq[(String, Long, Long, Int, Long, Long, String, String, String, Map[String, String], Map[String, String])]) =
    rows.toDF("txnUuid", "xxid", "commitTsMs", "chunk", "eventId", "tsMs", "table", "kind", "rowKey", "before", "after")

  // history: k1 INSERT a=1 @1s, UPDATE a=2 @2s; k2 INSERT a=9 @2s.
  // batch: k1 DELETE @3s then re-INSERT a=3 @4s; k2 untouched;
  //        k3 INSERT a=7 @4s (first seen in the batch).
  private val histStamped = Seq(
    ("u1", 1L, 1000L, 0, 1L, 900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "1")),
    ("u2", 2L, 2000L, 0, 2L, 1900L, "t", "UPDATE", "k1", Map("a" -> "1"), Map("a" -> "2")),
    ("u5", 5L, 2000L, 0, 5L, 1900L, "t", "INSERT", "k2", Map.empty[String, String], Map("a" -> "9")))
  private val batchStamped = Seq(
    ("u3", 3L, 3000L, 0, 3L, 2900L, "t", "DELETE", "k1", Map("a" -> "2"), Map.empty[String, String]),
    ("u4", 4L, 4000L, 0, 4L, 3900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "3")),
    ("u6", 6L, 4000L, 0, 6L, 3900L, "t", "INSERT", "k3", Map.empty[String, String], Map("a" -> "7")))

  private def ivRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("row_key"), col("valid_from"), col("valid_to"),
        col("is_current"), col("a"))
      .as[(String, Long, Option[Long], Boolean, String)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  test("applyScd2 equals the full rebuild: batch delete, reinsert, first-seen key") {
    val hist = TimeMachineSink.organize(TimeMachineSink.mutationCells(stampedOf(histStamped)))
    val batch = TimeMachineSink.organize(TimeMachineSink.mutationCells(stampedOf(batchStamped)))
    val applied = TimeMachineSink.applyScd2(
      TimeMachineSink.scd2Intervals(hist, Seq("a")), batch, Seq("a"))
    val full = TimeMachineSink.scd2Intervals(hist.unionByName(batch), Seq("a"))
    assert(ivRows(applied) == ivRows(full))
    // and the semantics: k1's open interval closed at the delete, gap,
    // reinsert current; k2 untouched passthrough; k3 born current
    assert(ivRows(applied) == Seq(
      ("k1", ts(1000), Some(ts(2000)), false, "1"),
      ("k1", ts(2000), Some(ts(3000)), false, "2"),
      ("k1", ts(4000), None, true, "3"),
      ("k2", ts(2000), None, true, "9"),
      ("k3", ts(4000), None, true, "7")))
  }

  test("applyScd2 carries unset columns across a delete gap on partial re-INSERT (== full rebuild)") {
    // history: k1 INSERT {a=1, b=x} then DELETE — the stored interval
    // table has NO open interval for k1. batch: re-INSERT setting ONLY a.
    // Cell versioning is per-column (a delete marker does not tombstone
    // older cells), so the full rebuild carries b=x across the gap — the
    // incremental fold must too (the review-found divergence this pins).
    val hist = Seq(
      ("u1", 1L, 1000L, 0, 1L, 900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "1", "b" -> "x")),
      ("u2", 2L, 2000L, 0, 2L, 1900L, "t", "DELETE", "k1", Map("a" -> "1", "b" -> "x"), Map.empty[String, String]))
    val batch = Seq(
      ("u3", 3L, 3000L, 0, 3L, 2900L, "t", "INSERT", "k1", Map.empty[String, String], Map("a" -> "2")))
    val hc = TimeMachineSink.organize(TimeMachineSink.mutationCells(stampedOf(hist)))
    val bc = TimeMachineSink.organize(TimeMachineSink.mutationCells(stampedOf(batch)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("row_key"), col("valid_from"), col("valid_to"),
          col("is_current"), col("a"), col("b"))
        .as[(String, Long, Option[Long], Boolean, String, Option[String])]
        .collect().sortBy(r => (r._1, r._2)).toSeq
    val applied = TimeMachineSink.applyScd2(
      TimeMachineSink.scd2Intervals(hc, Seq("a", "b")), bc, Seq("a", "b"))
    val full = TimeMachineSink.scd2Intervals(hc.unionByName(bc), Seq("a", "b"))
    assert(rows(applied) == rows(full))
    assert(rows(applied) == Seq(
      ("k1", ts(1000), Some(ts(2000)), false, "1", Some("x")),
      // gap [2s, 3s); reinsert carries b across it, per-column versioning
      ("k1", ts(3000), None, true, "2", Some("x"))))
  }

  test("applyScd2 with an empty batch is the identity") {
    val hist = TimeMachineSink.organize(TimeMachineSink.mutationCells(stampedOf(histStamped)))
    val iv = TimeMachineSink.scd2Intervals(hist, Seq("a"))
    val applied = TimeMachineSink.applyScd2(iv, hist.filter(col("event_id") < 0), Seq("a"))
    assert(ivRows(applied) == ivRows(iv))
  }

  test("property: state at any T equals the SCD2 interval covering T (random histories)") {
    val rnd = new scala.util.Random(42)
    // random per-key histories with inserts, updates, deletes, reinserts
    var ev = 0L
    val rows = (0 until 4).flatMap { ki =>
      val key = s"k$ki"
      var alive = false
      (0 until (3 + rnd.nextInt(5))).map { j =>
        ev += 1
        val ts = 1000L * (j + 1) + ki * 37
        val (kind, before, after) =
          if (!alive) { alive = true; ("INSERT", Map.empty[String, String], Map("a" -> rnd.nextInt(100).toString)) }
          else if (rnd.nextDouble() < 0.25) { alive = false; ("DELETE", Map("a" -> "x"), Map.empty[String, String]) }
          else ("UPDATE", Map("a" -> "x"), Map("a" -> rnd.nextInt(100).toString))
        (s"u$ev", ev, ts, 0, ev, ts - 100, "t", kind, key, before, after)
      }
    }
    val cells = TimeMachineSink.organize(TimeMachineSink.mutationCells(stampedOf(rows)))
      .persist()
    val iv = TimeMachineSink.scd2Intervals(cells, Seq("a"))
      .select(col("row_key"), col("valid_from"), col("valid_to"), col("a"))
      .as[(String, Long, Option[Long], String)].collect().toSeq
    val versionTimes = cells.select(col("cell_ts")).distinct().as[Long].collect().sorted
    // probe exactly at versions, between versions, before all, after all
    val probes = versionTimes ++ versionTimes.map(_ + 1) ++
      Seq(versionTimes.head - 1, versionTimes.last + 1000000)
    probes.foreach { t =>
      val asOf = TimeMachineSink.rowsAsOfCells(cells.filter(col("cell_ts") <= t))
        .select(col("row_key"), element_at(col("cols"), "a"))
        .as[(String, String)].collect().toMap
      val fromIv = iv.filter(r => r._2 <= t && r._3.forall(_ > t))
        .map(r => r._1 -> r._4).toMap
      assert(asOf == fromIv, s"divergence at T=$t: asOf=$asOf iv=$fromIv")
    }
    cells.unpersist()
    ()
  }

  test("maintainScd2: versioned fold, same-id redelivery idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2-view").toString
    TimeMachineSink.maintainScd2(stampedOf(histStamped), dir, 0L, Seq("a"))
    TimeMachineSink.maintainScd2(stampedOf(batchStamped), dir, 1L, Seq("a"))
    val v1 = ivRows(spark.read.parquet(s"$dir/v=1"))
    // redeliver batch 1: rebuilt from v=0, identical result
    TimeMachineSink.maintainScd2(stampedOf(batchStamped), dir, 1L, Seq("a"))
    assert(ivRows(spark.read.parquet(s"$dir/v=1")) == v1)
    val full = TimeMachineSink.scd2Intervals(
      TimeMachineSink.organize(TimeMachineSink.mutationCells(
        stampedOf(histStamped ++ batchStamped))), Seq("a"))
    assert(v1 == ivRows(full))
  }
}
