package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.augment.SchemaCatalog
import graft.checkpoint.{ProgressListener, SafeCheckpointAggregator}
import graft.streaming.{Op, Watermarked}

/** Watermark-governed streaming ops, safe-checkpoint aggregation, progress
  * instrumentation, schema-history sink. */
class WatermarkCheckpointSpec extends SparkTestBase {
  import spark.implicits._

  private def op(ev: Long, tsMs: Long, kind: String = "INSERT"): Op =
    Op(kind, s"t$ev", ev, ev, tsMs, "t", "k", Map.empty, Map.empty)

  test("windowed counts finalize on-time data and drop late-beyond-watermark events") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Op]
    val q = Watermarked.windowedCounts(mem.toDS(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("wc").outputMode("update").start()
    val base = 1704067200000L // 2024-01-01 00:00:00
    mem.addData(op(1, base), op(2, base + 1000), op(3, base + 90000)) // 2 in w0, 1 in w1
    q.processAllAvailable()
    // advance watermark far past w0 (event time base+10min), then send a late
    // event into w0 — it must be dropped (no updated count for w0)
    mem.addData(op(4, base + 600000))
    q.processAllAvailable()
    mem.addData(op(5, base + 2000)) // late into w0, watermark is ~base+10min-10s
    q.processAllAvailable()
    q.stop()
    val w0 = spark.table("wc")
      .filter(col("window_start") === java.sql.Timestamp.from(java.time.Instant.ofEpochMilli(base)))
      .agg(max("cnt")).as[Long].collect()(0)
    assert(w0 == 2L) // late event 5 never counted
  }

  test("session windows merge within the gap and finalize past the watermark") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Op]
    val q = Watermarked.sessionCounts(mem.toDS(), "1 minute", "10 seconds")
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    val base = 1704067200000L
    mem.addData(op(1, base), op(2, base + 1000),  // one session (1s apart)
      op(3, base + 300000))                        // 5 min later: new session
    q.processAllAvailable()
    mem.addData(op(4, base + 1200000)) // watermark advance finalizes both
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess").select("n_events").as[Long].collect().sorted.toSeq
    assert(sessions == Seq(1L, 2L))
  }

  test("dropDuplicatesWithinWatermark dedups replays inside the horizon") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Op]
    val q = Watermarked.dedupWithinWatermark(mem.toDS(), "1 minute")
      .writeStream.format("memory").queryName("dd").outputMode("append").start()
    val base = 1704067200000L
    mem.addData(op(1, base), op(2, base + 1000))
    q.processAllAvailable()
    mem.addData(op(1, base + 2000), op(3, base + 3000)) // event 1 replayed
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dd").select("eventId").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("stream-stream ack join pairs ops with acks inside the horizon only") {
    implicit val sq = spark.sqlContext
    val opsMem = MemoryStream[Op]
    val acksMem = MemoryStream[(Long, Long, String)]
    val acks = acksMem.toDS().toDF("ackEventId", "ackTsMs", "ackStatus")
    val q = Watermarked.ackJoin(opsMem.toDS(), acks, "30 seconds")
      .writeStream.format("memory").queryName("ackj").outputMode("append").start()
    val base = 1704067200000L
    opsMem.addData(op(1, base), op(2, base + 1000))
    acksMem.addData((1L, base + 5000L, "ok"),          // inside horizon
                    (2L, base + 120000L, "late"))      // outside horizon
    q.processAllAvailable()
    // advance both watermarks so results finalize
    opsMem.addData(op(99, base + 600000))
    acksMem.addData((99L, base + 600000L, "ok"))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("ackj").select("eventId", "ackStatus")
      .as[(Long, String)].collect().toSet
    assert(rows.contains((1L, "ok")))
    assert(!rows.exists(_._2 == "late"))
  }

  test("safe-checkpoint aggregator folds per-task GTID sets map-side") {
    val sets = Seq("u:1-4,v:1-2", "u:6-9", "u:5", "v:4-7").toDS()
    val out = sets.select(SafeCheckpointAggregator.toColumn).collect()(0)
    assert(out == "u:1-9,v:1-2") // u's gap closed by '5'; v still gapped at 3
  }

  test("progress listener records batch metrics (delay SLI plane)") {
    implicit val sq = spark.sqlContext
    val listener = new ProgressListener
    spark.streams.addListener(listener)
    try {
      val mem = MemoryStream[Op]
      val q = mem.toDS().writeStream.format("noop").start()
      mem.addData(op(1, 1704067200000L))
      q.processAllAvailable()
      q.stop()
      assert(listener.batches.exists(_.inputRows == 1))
    } finally spark.streams.removeListener(listener)
  }

  test("schema history sink writes ddl + before/after schema rows") {
    val cat = new SchemaCatalog("mydb")
    cat.applyDdl("CREATE TABLE t (id INT PRIMARY KEY, v VARCHAR(10))", 1000L)
    cat.applyDdl("ALTER TABLE t ADD COLUMN w INT", 2000L)
    val df = cat.historyDf(spark)
    assert(df.count() == 2)
    val alter = df.filter(col("ts_ms") === 2000L).collect()(0)
    assert(alter.getAs[String]("schema_before").contains("\"name\":\"v\""))
    assert(alter.getAs[String]("schema_after").contains("\"name\":\"w\""))
    val dir = java.nio.file.Files.createTempDirectory("hist").toString
    df.write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 2)
  }
}
