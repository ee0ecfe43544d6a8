package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility (round-12 plan evidence): dump `explain("formatted")` for a
  * comma-separated list of `SparkEntry.queries` entries to
  * `<outDir>/<name>_<suffix>.txt` — one JVM for the whole batch, caches
  * cleared between queries so each plan stands alone.
  *
  * Usage: `sbt "runMain graft.tools.PlanDumpR12 <outDir> <suffix> <q1,q2,...> [sfDir]"`
  *
  * NOTE: queries built on kernels whose `materialize` knob defaults to
  * localCheckpoint run those upstream jobs eagerly at construction; their
  * formatted plan shows the checkpoint scan where the materialized subtree
  * was (the round-11 plan-file convention — noted per file by the caller).
  */
object PlanDumpR12 {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDumpR12 <outDir> <suffix> <q1,q2,...> [sfDir]")
    val out = args(0)
    val suffix = args(1)
    val names = args(2).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
    names.foreach { q =>
      try {
        val df = graft.SparkEntry.queries(q)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$out/${q}_$suffix.txt"),
          txt.getBytes("UTF-8"))
        println(s"[plan] wrote $out/${q}_$suffix.txt (${txt.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plan] $q FAILED: $e")
      } finally {
        spark.sharedState.cacheManager.clearCache()
      }
    }
    spark.stop()
  }
}
