package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.Op

/** Adapter: view the driver's `events` table as a CDC op stream, so the full
  * transaction-assembly → time-machine path runs (and is oracle-checked)
  * against real data. Each user_id becomes one transaction over one row:
  * the first event is its INSERT, later events are UPDATEs carrying
  * before-images from `lag`, and a synthesized COMMIT closes the txn at the
  * user's max timestamp.
  */
object EventsAsCdc {

  /** Values rendered through decimal(10,2) so the string form is
    * engine-portable (double→string shortest-repr is not contractual). */
  private def valueStr(c: org.apache.spark.sql.Column) =
    c.cast("decimal(10,2)").cast("string")

  def opsFromEvents(spark: SparkSession, events: DataFrame): Dataset[Op] = {
    import spark.implicits._
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val rowOps = events
      .withColumn("rn", row_number().over(w))
      .withColumn("pv", lag(col("value"), 1).over(w))
      .withColumn("pt", lag(col("event_type"), 1).over(w))
      .select(
        when(col("rn") === 1, "INSERT").otherwise("UPDATE").as("kind"),
        col("user_id").cast("string").as("txnId"),
        col("user_id").as("xxid"),
        col("event_id").as("eventId"),
        unix_millis(col("ts")).as("tsMs"),
        lit("events").as("table"),
        col("user_id").cast("string").as("rowKey"),
        when(col("rn") === 1, lit(null).cast("map<string,string>"))
          .otherwise(map(lit("value"), valueStr(col("pv")), lit("event_type"), col("pt"))).as("before"),
        map(lit("value"), valueStr(col("value")), lit("event_type"), col("event_type")).as("after"))
    val commits = events.groupBy(col("user_id"))
      .agg(max(col("event_id")).as("maxEv"), max(unix_millis(col("ts"))).as("commitMs"))
      .select(
        lit("COMMIT").as("kind"),
        col("user_id").cast("string").as("txnId"),
        col("user_id").as("xxid"),
        (col("maxEv") + 1000000L).as("eventId"),
        col("commitMs").as("tsMs"),
        lit("events").as("table"),
        col("user_id").cast("string").as("rowKey"),
        lit(null).cast("map<string,string>").as("before"),
        lit(null).cast("map<string,string>").as("after"))
    rowOps.unionByName(commits).as[Op]
  }
}
