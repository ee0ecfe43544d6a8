package graft.sources

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Op

/** Op-stream sources — the engine's supplier layer (reference:
  * BinaryLogSupplier, SURVEY §2.1 S1). A live MySQL binlog supplier is a
  * thin `MicroBatchStream` adapter behind this same Dataset[Op] boundary;
  * the sandbox ships file and rate implementations, which also serve as the
  * backfill path (S3/S4: bootstrap + binlog-flusher ≙ batch read through the
  * identical schema).
  */
object OpSource {

  val opSchema = Encoders.product[Op].schema

  /** Streaming source over a directory of op parquet files (each file drop ≙
    * one binlog segment). Resume-from-checkpoint comes from the engine's
    * offset log (`checkpointLocation`), replacing the reference's ZooKeeper
    * checkpoint store. `maxFilesPerTrigger` is the backpressure knob
    * (≙ replicator.queue.size). */
  def parquetStream(spark: SparkSession, dir: String, maxFilesPerTrigger: Int = 16): Dataset[Op] = {
    import spark.implicits._
    spark.readStream.schema(opSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir).as[Op]
  }

  /** Batch read of the same layout — the bootstrap/backfill path. */
  def parquetBatch(spark: SparkSession, dir: String): Dataset[Op] = {
    import spark.implicits._
    spark.read.schema(opSchema).parquet(dir).as[Op]
  }

  /** Synthetic rate-driven op stream for soak/throughput testing: `rps`
    * single-row transactions per second across `nKeys` row keys. */
  def rateStream(spark: SparkSession, rps: Int, nKeys: Int = 1000): Dataset[Op] = {
    import spark.implicits._
    spark.readStream.format("rate").option("rowsPerSecond", rps.toLong * 2).load()
      .select(
        when(pmod(col("value"), lit(2)) === 0, "INSERT").otherwise("COMMIT").as("kind"),
        (col("value") / 2).cast("long").cast("string").as("txnId"),
        (col("value") / 2).cast("long").as("xxid"),
        col("value").as("eventId"),
        unix_millis(col("timestamp")).as("tsMs"),
        lit("rate").as("table"),
        pmod((col("value") / 2).cast("long"), lit(nKeys.toLong)).cast("string").as("rowKey"),
        lit(null).cast("map<string,string>").as("before"),
        map(lit("v"), col("value").cast("string")).as("after"))
      .as[Op]
  }

  /** Synthetic rate-driven RAW BINLOG stream: each transaction arrives as
    * its four-event block (GTID → TABLE_MAP → WRITE_ROWS → XID) on one
    * server, exercising the streaming supplier state machine
    * ([[graft.operators.RawBinlogAdapter.toOpsStreaming]]) end-to-end —
    * the soak lane for the raw edge, vs [[rateStream]]'s pre-normalized
    * ops. */
  def rawRateStream(spark: SparkSession, rps: Int, nKeys: Int = 1000,
                    servers: Int = 1): Dataset[graft.model.RawEvent] = {
    import spark.implicits._
    import graft.model.{RawEvent, RawEventType => RT, RowImage}
    spark.readStream.format("rate").option("rowsPerSecond", rps.toLong * 4).load()
      .select(col("value"), unix_millis(col("timestamp")).as("ts"))
      .as[(Long, Long)]
      .map { case (v, ts) =>
        val txn = v / 4
        // transactions round-robin across synthetic source servers — the
        // reference's scale-out model (one supplier per server), and the
        // state machine's partition key; each server's positions stay
        // monotone so per-server binlog order is a real binlog's
        val server = 1L + txn % servers
        val pos = v + 4L
        ((v % 4).toInt: @annotation.switch) match {
          case 0 => RawEvent(RT.GTID, server, "bin.000001", pos, ts,
            gtid = Some(s"srv$server:$txn"))
          case 1 => RawEvent(RT.TABLE_MAP, server, "bin.000001", pos, ts,
            tableId = Some(7L), db = Some("db"), table = Some("rate"),
            pkColumns = Seq("id"))
          case 2 => RawEvent(RT.WRITE_ROWS, server, "bin.000001", pos, ts,
            tableId = Some(7L), rows = Seq(RowImage(Map.empty,
              Map("id" -> (txn % nKeys).toString, "v" -> v.toString))))
          case _ => RawEvent(RT.XID, server, "bin.000001", pos, ts,
            xid = Some(txn))
        }
      }
  }
}
