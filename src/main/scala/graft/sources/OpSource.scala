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
}
