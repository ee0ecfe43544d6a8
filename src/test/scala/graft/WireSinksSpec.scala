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

  def reset(): Unit = {
    kafkaSent.clear(); hbasePuts.clear()
    Seq(kafkaOpened, kafkaFlushed, kafkaClosed,
      hbaseOpened, hbaseFlushed, hbaseClosed).foreach(_.set(0))
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
