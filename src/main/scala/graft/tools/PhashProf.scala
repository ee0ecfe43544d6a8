package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Multimodal
/** Throwaway profiling main (round-11): stage timings of the mm_phash_neardup
  * pipeline at a given sf dir. */
object PhashProf {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$d/documents.parquet")
    val withPng = docs.filter(length(col("text")) >= 64)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .map { case (id, text) =>
        (id, Multimodal.ImageCodec.buildPng(8, 8,
          java.util.Arrays.copyOf(text.getBytes("US-ASCII"), 64)))
      }.toDF("doc_id", "payload")
    t("buildPng count")(withPng.count())
    t("buildPng count again")(withPng.count())
    val hashed = Multimodal.perceptualHash(withPng, "payload")
    t("perceptualHash count")(hashed.count())
    t("perceptualHash count again")(hashed.count())
    val pairs = Multimodal.phashNearDup(hashed, col("doc_id"), col("ahash"),
      maxHamming = 6, bands = 8, comboBands = 2, saltHotDf = 2048, saltBlocks = 16)
    t("neardup full")(pairs.count())
    t("neardup full again")(pairs.count())
    val fn = graft.SparkEntry.queries("mm_phash_neardup")
    t("verify-shape write 1")(fn(spark, d).coalesce(1).write.mode("overwrite").parquet("/tmp/ppw1"))
    t("verify-shape write 2")(fn(spark, d).coalesce(1).write.mode("overwrite").parquet("/tmp/ppw2"))
    spark.sharedState.cacheManager.clearCache()
    t("verify-shape write post-clear")(fn(spark, d).coalesce(1).write.mode("overwrite").parquet("/tmp/ppw3"))
    spark.stop()
  }
}
