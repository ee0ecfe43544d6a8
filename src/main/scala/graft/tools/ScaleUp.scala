package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev utility: build a ×N scale-up dataset from an sf dir for local
  * scale-ratio evidence (SCALE.md) — documents replicate as one-token
  * near-dups (duplicate CLUSTERS grow ×N, pair volume inside them ~N²),
  * embeddings replicate with a small deterministic last-dim jitter (near-
  * dup pairs exist across replicas), every other table copies through.
  * Usage: `sbt "runMain graft.tools.ScaleUp <srcSfDir> <outDir> [factor]"`.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ScaleUp <srcSfDir> <outDir> [factor]")
    val src = args(0); val out = args(1)
    val n = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head.getLong(0) + 1
    docs.crossJoin(spark.range(n).select(col("id").as("__rep")))
      .select(
        (col("doc_id") + col("__rep") * maxDoc).as("doc_id"),
        when(col("__rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" rep"), col("__rep"))).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + when(col("__rep") === 0, 0).otherwise(5)).as("n_chars"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")

    val emb = spark.read.parquet(s"$src/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head.getLong(0) + 1
    emb.crossJoin(spark.range(n).select(col("id").as("__rep")))
      .select(
        (col("vec_id") + col("__rep") * maxVec).as("vec_id"),
        transform(col("embedding"),
          x => x + (col("__rep").cast("float") * lit(1e-4f))).as("embedding"),
        col("label"))
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")

    // events replicate as N DISTINCT user populations at the same wall
    // clock (event/user ids offset per replica, timestamps kept): the CDC
    // lane's group count — the supplier/assembler state-machine partition
    // key — scales with the data, which is the scaling model a binlog at
    // N× volume actually has. Read via SparkEntry.t so the TIMESTAMP(NANOS)
    // source maps the same way the engine reads it (the rewrite lands as
    // micros, which t() also accepts).
    val events = graft.SparkEntry.t(spark, src, "events")
    val maxEv = events.agg(max("event_id")).head.getLong(0) + 1
    val maxUser = events.agg(max("user_id")).head.getLong(0) + 1
    events.crossJoin(spark.range(n).select(col("id").as("__rep")))
      .select(
        (col("event_id") + col("__rep") * maxEv).as("event_id"),
        col("ts"),
        (col("user_id") + col("__rep") * maxUser).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$out/events.parquet")

    // lineitem optionally replicates with offset order/part keys (flag
    // "lineitem" as 4th arg): ×N DISJOINT co-purchase components — the
    // honest scaling model for the graph lane (a bigger catalog, not a
    // denser clique). Off by default so the TPC-H lanes' historical ×N
    // ratios stay comparable (those were measured with copy-through).
    val replicateLineitem = args.length > 3 && args(3) == "lineitem"
    if (replicateLineitem) {
      val li = spark.read.parquet(s"$src/lineitem.parquet")
      val maxOk = li.agg(max("l_orderkey")).head.getLong(0) + 1
      val maxPk = li.agg(max("l_partkey")).head.getLong(0) + 1
      li.crossJoin(spark.range(n).select(col("id").as("__rep")))
        .select(li.columns.map {
          case "l_orderkey" => (col("l_orderkey") + col("__rep") * maxOk).as("l_orderkey")
          case "l_partkey"  => (col("l_partkey") + col("__rep") * maxPk).as("l_partkey")
          case other        => col(other)
        }: _*)
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    }
    (Seq("region", "nation", "customer", "supplier", "part", "orders") ++
      (if (replicateLineitem) Seq.empty[String] else Seq("lineitem"))).foreach { t =>
      val p = new java.io.File(s"$src/$t.parquet")
      if (p.exists()) {
        java.nio.file.Files.copy(p.toPath,
          new java.io.File(s"$out/$t.parquet").toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    }
    println(s"[scaleup] wrote x$n documents/embeddings/events" +
      (if (replicateLineitem) "/lineitem" else "") + s" to $out")
    spark.stop()
  }
}
