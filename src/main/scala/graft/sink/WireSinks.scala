package graft.sink

import org.apache.spark.sql.{ForeachWriter, Row}

/** Wire-level sink shims: the per-task producer/mutator lifecycle of the
  * reference's real network appliers, with the network CLIENT abstracted
  * behind a minimal factory interface so the shims compile, run, and are
  * spec-verified in the sandbox (in-memory clients) and bind to real
  * `org.apache.kafka.clients.producer.KafkaProducer` /
  * `org.apache.hadoop.hbase.client.BufferedMutator` instances outside it
  * with a one-line factory — no new dependencies in the default build.
  *
  * Both writers are `ForeachWriter`s: Structured Streaming's per-partition,
  * per-epoch sink lifecycle (open → process× → close) is exactly the
  * reference appliers' task model (one producer per applier task —
  * KafkaApplier.java:154-237 creates per-partition producers; one
  * BufferedMutator per applier — HBaseApplier.java:197-285). Delivery is
  * at-least-once (an epoch retry re-sends); end-to-end dedup is the
  * seeker's job downstream (K2, `Sinks.seekFilter`), mirroring the
  * reference's Kafka seeker semantics.
  */
object WireSinks {

  /** The slice of the Kafka producer API the applier needs. A real binding:
    * `() => new KafkaClient { val p = new KafkaProducer[Bytes,Bytes](cfg);
    * def send(...) = p.send(new ProducerRecord(topic, partition, k, v));
    * def flush() = p.flush(); def close() = p.close() }`. */
  trait KafkaClient extends AutoCloseable {
    def send(topic: String, partition: Int, key: Array[Byte], value: Array[Byte]): Unit
    def flush(): Unit
    def close(): Unit
  }

  /** The slice of the HBase BufferedMutator API the applier needs
    * (HBaseTimeMachineWriter.java:144-290 emits versioned Puts; the
    * mutator buffers and flushes them). `ts` is the cell version in
    * MICROSECONDS (the RowTimestampOrganizer value). */
  trait HBaseClient extends AutoCloseable {
    def put(table: String, rowKey: String, family: String, qualifier: String,
            tsMicros: Long, value: Array[Byte]): Unit
    def flush(): Unit
    def close(): Unit
  }
}

/** Kafka producer shim: one client per (partition, epoch) task, records
  * from [[Sinks.kafkaRecords]] (columns partition/key/value), flush before
  * close so task success implies broker acks (the reference's
  * producer-per-task + flush-on-commit discipline). The factory must be
  * serializable; the client it builds need not be. */
final class KafkaRecordForeachWriter(topic: String,
    factory: () => WireSinks.KafkaClient) extends ForeachWriter[Row] {
  @transient private var client: WireSinks.KafkaClient = _

  override def open(partitionId: Long, epochId: Long): Boolean = {
    client = factory()
    true
  }

  override def process(row: Row): Unit =
    client.send(topic,
      row.getAs[Long]("partition").toInt,
      row.getAs[String]("key").getBytes("UTF-8"),
      row.getAs[String]("value").getBytes("UTF-8"))

  override def close(errorOrNull: Throwable): Unit =
    if (client != null) {
      // flush only on success: a failed task's buffered sends may still
      // have left the producer, which is why the contract stays
      // at-least-once and the seeker dedups downstream
      try { if (errorOrNull == null) client.flush() } finally client.close()
    }
}

/** HBase BufferedMutator shim over the time-machine cell stream
  * ([[graft.streaming.TimeMachineSink.organize]] output: table, row_key,
  * column, value, cell_ts): explicit count-bounded buffering with
  * flush-on-threshold and flush-on-close — the BufferedMutator contract
  * (the real binding sets hbase.client.write.buffer and this cap becomes
  * a second bound; in-sandbox it IS the buffer). */
final class HBaseCellForeachWriter(family: String, bufferCap: Int,
    factory: () => WireSinks.HBaseClient) extends ForeachWriter[Row] {
  require(bufferCap > 0, "bufferCap must be positive")
  @transient private var client: WireSinks.HBaseClient = _
  @transient private var buffered: Int = 0

  override def open(partitionId: Long, epochId: Long): Boolean = {
    client = factory()
    buffered = 0
    true
  }

  override def process(row: Row): Unit = {
    client.put(
      row.getAs[String]("table"),
      row.getAs[String]("row_key"),
      family,
      row.getAs[String]("column"),
      row.getAs[Long]("cell_ts"),
      row.getAs[String]("value").getBytes("UTF-8"))
    buffered += 1
    if (buffered >= bufferCap) { client.flush(); buffered = 0 }
  }

  override def close(errorOrNull: Throwable): Unit =
    if (client != null) {
      try { if (errorOrNull == null && buffered > 0) client.flush() }
      finally client.close()
    }
}
