package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: dump the executed plan of one `SparkEntry.queries` entry
  * after a real run (so AQE's final plan is shown, not the static guess).
  * Usage: `sbt "runMain graft.tools.PlanDump <query> [sfDir]"`. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanDump <queryName> [sfDir]")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(args(0))(spark, sfDir)
    df.write.mode("overwrite").format("noop").save()
    println(s"=== ${args(0)} executed plan (post-AQE) ===")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
