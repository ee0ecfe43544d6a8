package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sink.{KafkaRecordForeachWriter, HBaseCellForeachWriter, Sinks, WireSinks}

/** Interface-parity specs for the wire-level sink shims (W3/W5): the
  * per-task producer/mutator lifecycle runs end to end through a REAL
  * Structured Streaming foreach sink against in-memory clients — the same
  * factory seam a `KafkaProducer` / `BufferedMutator` binds to outside the
  * sandbox. */
class WireSinksSpec extends SparkTestBase {
  import spark.implicits._

  test("kafka shim: records flow through a streaming foreach with " +
      "per-task clients, flushed on success") {
    WireSinksSpec.reset()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String, Long)]
    val records = Sinks.kafkaRecords(
      mem.toDF().toDF("txnUuid", "table", "eventId"),
      partitions = 4, partitionKey = "txnUuid")
    val q = records.writeStream
      .foreach(new KafkaRecordForeachWriter("bigdata-db-t-value",
        () => new WireSinksSpec.MemKafka))
      .start()
    mem.addData(("t1", "t", 1L), ("t2", "t", 2L), ("t3", "t", 3L))
    q.processAllAvailable()
    q.stop()
    val sent = WireSinksSpec.kafkaSent.toArray(Array.empty[(String, Int, String, String)])
    assert(sent.length == 3)
    assert(sent.forall(_._1 == "bigdata-db-t-value"))
    // routing parity with the file-modeled sink: same partition column
    assert(sent.map(_._2).toSet.subsetOf((0 until 4).toSet))
    // key is the header JSON, value the full event JSON
    assert(sent.forall { case (_, _, k, v) =>
      k.contains("\"txnUuid\"") && v.contains("\"eventId\"") })
    // every opened client flushed (success path) and closed
    assert(WireSinksSpec.kafkaOpened.get() > 0)
    assert(WireSinksSpec.kafkaClosed.get() == WireSinksSpec.kafkaOpened.get())
    assert(WireSinksSpec.kafkaFlushed.get() == WireSinksSpec.kafkaOpened.get())
  }

  test("hbase shim: versioned cells reach the mutator; buffer cap flushes " +
      "mid-stream; tail flushes on close; failed task does not flush") {
    WireSinksSpec.reset()
    val cells = Seq(
      ("orders", "k1", "a", "1", 1000L), ("orders", "k1", "b", "2", 1000L),
      ("orders", "k2", "a", "3", 1001L), ("orders", "k2", "b", "4", 1001L),
      ("orders", "k3", "a", "5", 1002L))
      .toDF("table", "row_key", "column", "value", "cell_ts")
    val w = new HBaseCellForeachWriter("d", bufferCap = 2,
      () => new WireSinksSpec.MemHBase)
    // drive the exact ForeachWriter lifecycle the engine runs per task
    assert(w.open(0L, 0L))
    cells.collect().foreach(w.process)
    w.close(null)
    val puts = WireSinksSpec.hbasePuts.toArray(Array.empty[(String, String, String, String, Long, String)])
    assert(puts.length == 5)
    assert(puts.forall(_._3 == "d"))
    assert(puts.map(p => (p._2, p._4, p._6)).toSet ==
      Set(("k1", "a", "1"), ("k1", "b", "2"), ("k2", "a", "3"),
        ("k2", "b", "4"), ("k3", "a", "5")))
    // 5 puts at cap 2 → two threshold flushes + one close flush
    assert(WireSinksSpec.hbaseFlushed.get() == 3)
    assert(WireSinksSpec.hbaseClosed.get() == 1)

    // a FAILED task closes without flushing the tail (at-least-once:
    // the epoch retries; nothing half-flushed pretends to be committed)
    val before = WireSinksSpec.hbaseFlushed.get()
    val w2 = new HBaseCellForeachWriter("d", bufferCap = 100,
      () => new WireSinksSpec.MemHBase)
    assert(w2.open(0L, 1L))
    cells.collect().take(3).foreach(w2.process)
    w2.close(new RuntimeException("task failed"))
    assert(WireSinksSpec.hbaseFlushed.get() == before, "failure path flushed")
    assert(WireSinksSpec.hbaseClosed.get() == 2, "client must close either way")
  }

  test("hbase shim end-to-end: the time-machine cell stream drives the " +
      "mutator through a streaming foreach") {
    WireSinksSpec.reset()
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, String, String, String, Long)]
    val q = mem.toDF().toDF("table", "row_key", "column", "value", "cell_ts")
      .writeStream
      .foreach(new HBaseCellForeachWriter("d", bufferCap = 3,
        () => new WireSinksSpec.MemHBase))
      .start()
    mem.addData(("t", "r1", "a", "x", 7L), ("t", "r2", "a", "y", 8L))
    q.processAllAvailable()
    q.stop()
    val puts = WireSinksSpec.hbasePuts.toArray(Array.empty[(String, String, String, String, Long, String)])
    assert(puts.map(p => (p._2, p._5, p._6)).toSet == Set(("r1", 7L, "x"), ("r2", 8L, "y")))
    assert(WireSinksSpec.hbaseClosed.get() == WireSinksSpec.hbaseOpened.get())
  }
  test("joint wire-path drill: crash after BOTH wire sinks flushed, restart " +
      "replays the batch — kafka wire carries the duplicate prefix the seeker " +
      "(K2) drops; hbase cells are idempotent by cell version") {
    WireSinksSpec.reset()
    import java.nio.file.Files
    import graft.streaming.{Op, TimeMachineSink, TransactionAssembler}
    val ckpt = Files.createTempDirectory("wireckpt").toString
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Op]
    def op(kind: String, txn: String, ev: Long, key: String = "k1",
           after: Map[String, String] = Map.empty): Op =
      Op(kind, txn, txn.hashCode.toLong & 0xFFFF, ev, 1704067200000L, "t",
        key, Map.empty, after)
    val crashOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    def run() = TransactionAssembler.assemble(mem.toDS()).writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.StampedOp],
          batchId: Long) =>
        val df = batch.toDF()
        // kafka leg: routed records through the per-partition producer
        // lifecycle (open → send× → flush → close), exactly the applier task
        Sinks.kafkaRecords(df, partitions = 2, partitionKey = "txnUuid")
          .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
            val w = new KafkaRecordForeachWriter("bigdata-db-t-value",
              () => new WireSinksSpec.MemKafka)
            w.open(0L, batchId); try rows.foreach(w.process(_)) finally w.close(null)
          }
        // hbase leg: versioned time-machine cells through the buffered
        // mutator lifecycle against the KEYED store (cell-version semantics)
        TimeMachineSink.organize(TimeMachineSink.mutationCells(df))
          .select("table", "row_key", "column", "value", "cell_ts")
          .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
            val w = new HBaseCellForeachWriter("d", bufferCap = 2,
              () => new WireSinksSpec.MemHBaseKeyed)
            w.open(0L, batchId); try rows.foreach(w.process(_)) finally w.close(null)
          }
        // the reference's ForceRewindException point: sinks flushed, engine
        // commit not yet written — restart must replay this batch id
        if (!batch.isEmpty && crashOnce.getAndSet(false)) sys.error("forced rewind")
      }.start()

    val q1 = run()
    mem.addData(op("BEGIN", "t1", 1),
      op("INSERT", "t1", 2, "k1", Map("a" -> "1")),
      op("INSERT", "t1", 3, "k2", Map("a" -> "2")),
      op("COMMIT", "t1", 4))
    intercept[Exception] { q1.processAllAvailable() }
    q1.stop()

    // the wire tail at crash time: both txn1 records WERE flushed to the
    // broker (at-least-once is real, not hypothetical)
    val evRe = """"eventId":(\d+)""".r
    def sentPairs() = WireSinksSpec.kafkaSent
      .toArray(Array.empty[(String, Int, String, String)])
      .map { case (_, p, _, v) =>
        (p.toLong, evRe.findFirstMatchIn(v).get.group(1).toLong) }
    val tail = sentPairs()
    assert(tail.map(_._2).toSet == Set(2L, 3L), s"crash-time wire tail: ${tail.toSeq}")
    // K2: the seeker's watermarks are the per-partition max event id on the
    // wire — exactly what Sinks.seekWatermarks reads off the sink tail
    val watermarks = tail.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).max }

    val q2 = run()
    q2.processAllAvailable() // replays txn1's batch into both wire sinks
    mem.addData(op("BEGIN", "t2", 5),
      op("INSERT", "t2", 6, "k3", Map("a" -> "3")),
      op("COMMIT", "t2", 7))
    q2.processAllAvailable()
    q2.stop()

    // kafka wire: txn1 records delivered TWICE (doomed attempt + replay),
    // txn2 once — the at-least-once duplicate prefix, on the real wire
    val all = sentPairs()
    assert(all.count(_._2 == 2L) == 2 && all.count(_._2 == 3L) == 2 &&
      all.count(_._2 == 6L) == 1, s"wire contents: ${all.toSeq}")
    // ... and the seeker drops exactly the replayed prefix: what a consumer
    // resuming from the crash-time watermarks accepts is txn2 alone
    val postRestart = Seq(("t1", 2L), ("t1", 3L), ("t2", 6L))
      .toDF("txnUuid", "eventId")
    val accepted = Sinks.seekFilter(postRestart, 2, "txnUuid", watermarks)
      .select("eventId").as[Long].collect().toSet
    assert(accepted == Set(6L), s"seeker must drop the replayed prefix: $accepted")

    // hbase wire: more puts than cells (the duplicates), but the KEYED store
    // converged to the exactly-once cell image — replayed cells carry the
    // same deterministic version (organize is a pure function of the txn),
    // so the re-put overwrites instead of duplicating
    val puts = WireSinksSpec.hbaseKeyedPuts.get()
    val cells = WireSinksSpec.hbaseCellMap
    assert(puts > cells.size(), s"expected duplicate puts: $puts vs ${cells.size()}")
    import scala.jdk.CollectionConverters._
    val aCells = cells.asScala.collect {
      case ((_, rk, "a", _), v) => rk -> v }.toMap
    assert(aCells == Map("k1" -> "1", "k2" -> "2", "k3" -> "3"),
      s"cell image must be exactly-once: $aCells")
  }
}

/** Static in-memory client registry: local-mode tasks share the JVM, so the
  * serialized factory closures can report into these. */
object WireSinksSpec {
  import java.util.concurrent.atomic.AtomicInteger

  val kafkaSent = new ConcurrentLinkedQueue[(String, Int, String, String)]()
  val kafkaOpened = new AtomicInteger(0)
  val kafkaFlushed = new AtomicInteger(0)
  val kafkaClosed = new AtomicInteger(0)

  val hbasePuts = new ConcurrentLinkedQueue[(String, String, String, String, Long, String)]()
  val hbaseOpened = new AtomicInteger(0)
  val hbaseFlushed = new AtomicInteger(0)
  val hbaseClosed = new AtomicInteger(0)

  /** Cell-version-keyed store — real HBase semantics: a Put at an existing
    * (row, qualifier, ts) overwrites the cell, it does not duplicate it. */
  val hbaseCellMap =
    new java.util.concurrent.ConcurrentHashMap[(String, String, String, Long), String]()
  val hbaseKeyedPuts = new AtomicInteger(0)

  def reset(): Unit = {
    kafkaSent.clear(); hbasePuts.clear(); hbaseCellMap.clear()
    Seq(kafkaOpened, kafkaFlushed, kafkaClosed,
      hbaseOpened, hbaseFlushed, hbaseClosed, hbaseKeyedPuts).foreach(_.set(0))
  }

  final class MemKafka extends WireSinks.KafkaClient {
    kafkaOpened.incrementAndGet()
    override def send(topic: String, partition: Int, key: Array[Byte],
        value: Array[Byte]): Unit =
      kafkaSent.add((topic, partition, new String(key, "UTF-8"),
        new String(value, "UTF-8"))): Unit
    override def flush(): Unit = kafkaFlushed.incrementAndGet(): Unit
    override def close(): Unit = kafkaClosed.incrementAndGet(): Unit
  }

  final class MemHBaseKeyed extends WireSinks.HBaseClient {
    hbaseOpened.incrementAndGet()
    override def put(table: String, rowKey: String, family: String,
        qualifier: String, tsMicros: Long, value: Array[Byte]): Unit = {
      hbaseKeyedPuts.incrementAndGet()
      hbaseCellMap.put((table, rowKey, qualifier, tsMicros),
        new String(value, "UTF-8")): Unit
    }
    override def flush(): Unit = hbaseFlushed.incrementAndGet(): Unit
    override def close(): Unit = hbaseClosed.incrementAndGet(): Unit
  }

  final class MemHBase extends WireSinks.HBaseClient {
    hbaseOpened.incrementAndGet()
    override def put(table: String, rowKey: String, family: String,
        qualifier: String, tsMicros: Long, value: Array[Byte]): Unit =
      hbasePuts.add((table, rowKey, family, qualifier, tsMicros,
        new String(value, "UTF-8"))): Unit
    override def flush(): Unit = hbaseFlushed.incrementAndGet(): Unit
    override def close(): Unit = hbaseClosed.incrementAndGet(): Unit
  }
}
