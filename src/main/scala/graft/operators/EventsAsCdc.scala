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
    // ONE scan, ONE shuffle: the ordered window (row_number/lag) and the
    // full-partition aggregates (max event_id / max ts, replacing a separate
    // groupBy scan + union) share the user_id Exchange; the synthesized
    // COMMIT op emits by exploding a 2-element array on each user's last
    // event. A union-of-scans formulation executes the source twice.
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    def common = Seq(
      col("user_id").cast("string").as("txnId"),
      col("user_id").as("xxid"),
      lit("events").as("table"),
      col("user_id").cast("string").as("rowKey"))
    val opStruct = struct(
      Seq(when(col("rn") === 1, "INSERT").otherwise("UPDATE").as("kind"),
        col("event_id").as("eventId"),
        unix_millis(col("ts")).as("tsMs"),
        when(col("rn") === 1, lit(null).cast("map<string,string>"))
          .otherwise(map(lit("value"), valueStr(col("pv")), lit("event_type"), col("pt"))).as("before"),
        map(lit("value"), valueStr(col("value")), lit("event_type"), col("event_type")).as("after"))
        ++ common: _*)
    val commitStruct = struct(
      Seq(lit("COMMIT").as("kind"),
        (col("maxEv") + 1000000L).as("eventId"),
        col("commitMs").as("tsMs"),
        lit(null).cast("map<string,string>").as("before"),
        lit(null).cast("map<string,string>").as("after"))
        ++ common: _*)
    events
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("pv", lag(col("value"), 1).over(wOrd))
      .withColumn("pt", lag(col("event_type"), 1).over(wOrd))
      .withColumn("maxEv", max(col("event_id")).over(wAll))
      .withColumn("commitMs", max(unix_millis(col("ts"))).over(wAll))
      .select(explode(
        when(col("event_id") === col("maxEv"), array(opStruct, commitStruct))
          .otherwise(array(opStruct))).as("op"))
      .select("op.kind", "op.txnId", "op.xxid", "op.eventId", "op.tsMs",
        "op.table", "op.rowKey", "op.before", "op.after")
      .as[Op]
  }
}
