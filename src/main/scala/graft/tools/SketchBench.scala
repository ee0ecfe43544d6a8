package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measures the stored-sketch-table architecture against the raw-rescan
  * form — the headline 100 TB cube evidence (SCALE.md):
  *
  *   (a) build    — the daily (event_type, day) KMV+KLL sketch table,
  *                  written to parquet (the nightly job, paid ONCE);
  *   (b) rollup   — the three report questions (distinct users, p50/p95,
  *                  purchase-cohort overlap) answered from the STORED
  *                  sketch values only;
  *   (c) rescan   — the same three questions computed exact from raw
  *                  events (what every query pays WITHOUT the table).
  *
  * The architecture's claim is (b) ≪ (c) and (b) independent of raw
  * volume — each extra question amortizes (a) further. Usage:
  *   sbt "runMain graft.tools.SketchBench <sfDir> [runs]"
  */
object SketchBench {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: SketchBench <sfDir> [runs]")
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.KmvSetOps._
    import graft.functions.KllSketchOps._

    val tbl = java.nio.file.Files.createTempDirectory("graft-sketch-tbl").toString

    def time(fn: () => Unit): Double = {
      val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
    }
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def minOf(fn: () => Unit): Double = (1 to runs).map(_ => time(fn)).min

    val events = graft.SparkEntry.t(spark, sfDir, "events")

    // (a) build: one raw scan → cells × O(k) bytes, stored
    val build = minOf { () =>
      events.groupBy(col("event_type"),
          (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        .agg(kmvSketch(xxhash64(col("user_id")), 16384).as("sk_u"),
          kllSketch(col("value"), 8192).as("sk_v"))
        .write.mode("overwrite").parquet(s"$tbl/daily")
    }

    // (b) rollup from the stored table: no raw access at all
    val rollup = minOf { () =>
      val daily = spark.read.parquet(s"$tbl/daily")
      val perType = daily.groupBy("event_type")
        .agg(kmvMerge(col("sk_u")).as("mu"), kllMerge(col("sk_v")).as("mv"))
      import org.apache.spark.sql.expressions.Window
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      noop(perType
        .withColumn("pu", first(
          when(col("event_type") === "purchase", col("mu")), ignoreNulls = true).over(w))
        .select(col("event_type"), kmvEstimate(col("mu")).as("n_users"),
          kllQuantilesOf(col("mv"), Seq(0.5, 0.95))(0).as("p50"),
          kllQuantilesOf(col("mv"), Seq(0.5, 0.95))(1).as("p95"),
          kmvIntersectEst(col("mu"), col("pu")).as("overlap_purchase")))
    }

    // (c) raw-rescan exact: distinct agg + per-type percentile sort +
    // semi-join overlap, straight off the events table
    val rescan = minOf { () =>
      val per = events.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          percentile(col("value"), lit(0.5)).as("p50"),
          percentile(col("value"), lit(0.95)).as("p95"))
      val purch = events.filter(col("event_type") === "purchase")
        .select(col("user_id")).distinct()
      val overlap = events.join(purch, Seq("user_id"), "left_semi")
        .groupBy("event_type").agg(countDistinct(col("user_id")).as("overlap_purchase"))
      noop(per.join(overlap, Seq("event_type"), "left"))
    }

    println(f"""{"sf":"$sfDir","build_sec":$build%.3f,"rollup_sec":$rollup%.3f,"rescan_sec":$rescan%.3f,"runs":$runs}""")
    try {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tbl)).deleteRecursively(): Unit
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
