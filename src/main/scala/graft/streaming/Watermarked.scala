package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Watermark-governed streaming operators — the engine-native forms of the
  * reference's freshness/dedup machinery (SURVEY §2.9 streaming row):
  * the watermark is the safe-checkpoint analog (everything older is final),
  * and bounded-state dedup replaces KafkaSeeker's replay filter when the
  * replay window is time-bounded.
  */
object Watermarked {

  /** Event-time tumbling-window counts with bounded state: windows older
    * than the watermark finalize and evict. */
  def windowedCounts(ops: Dataset[Op], windowLen: String, delay: String): DataFrame =
    ops.withColumn("event_time", timestamp_millis(col("tsMs")))
      .withWatermark("event_time", delay)
      .groupBy(window(col("event_time"), windowLen), col("kind"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"), col("kind"), col("cnt"))

  /** Event-time session windows: per-key sessions split at `gap` of
    * inactivity; a session finalizes (and its state evicts) once the
    * watermark passes its close. The streaming counterpart of the batch
    * [[graft.operators.Cdc.sessionize]] — merging windows in the state
    * store instead of a window-sum over history. */
  def sessionCounts(ops: Dataset[Op], gap: String, delay: String): DataFrame =
    ops.withColumn("event_time", timestamp_millis(col("tsMs")))
      .withWatermark("event_time", delay)
      .groupBy(session_window(col("event_time"), gap), col("rowKey"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("rowKey"), col("n_events"))

  /** Stream-stream inner join within a watermark horizon: pair each op with
    * its acknowledgement/validation event arriving within `horizon` of it —
    * both sides' state evicts past the watermark (the streaming-native form
    * of the validation source-vs-target compare, W12). */
  def ackJoin(ops: Dataset[Op], acks: DataFrame, horizon: String): DataFrame = {
    val l = ops.toDF()
      .withColumn("op_time", timestamp_millis(col("tsMs")))
      .withWatermark("op_time", horizon)
    val r = acks
      .withColumn("ack_time", timestamp_millis(col("ackTsMs")))
      .withWatermark("ack_time", horizon)
    l.join(r,
      col("eventId") === col("ackEventId") &&
        col("ack_time") >= col("op_time") &&
        col("ack_time") <= col("op_time") + expr(s"INTERVAL $horizon"))
      .select(col("eventId"), col("table"), col("rowKey"), col("op_time"),
        col("ack_time"), col("ackStatus"))
  }

  /** Replay dedup with bounded state: duplicate event ids arriving within the
    * watermark horizon are dropped; state for older ids evicts. The
    * time-bounded form of Cdc.replayDedup (KafkaSeeker analog K2). */
  def dedupWithinWatermark(ops: Dataset[Op], delay: String): Dataset[Op] = {
    import ops.sparkSession.implicits._
    ops.withColumn("event_time", timestamp_millis(col("tsMs")))
      .withWatermark("event_time", delay)
      .dropDuplicatesWithinWatermark("eventId")
      .drop("event_time")
      .as[Op]
  }
}
