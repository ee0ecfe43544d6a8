package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Sketch operators for corpus-scale approximate analytics: HLL distinct
  * counts, count-min heavy hitters, and Bloom-gated incremental dedup.
  * Sketches are the only honest answer at 100 TB when exact answers would
  * shuffle the world: constant memory, one pass, mergeable across
  * executors.
  */
object Sketches {

  /** Approximate distinct values per group — Spark's native HyperLogLog++
    * (partial-aggregates map-side; relative error `rsd`). */
  def approxDistinct(df: DataFrame, groupCol: Column, valueCol: Column, rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol.as("grp"))
      .agg(approx_count_distinct(valueCol, rsd).as("approx_distinct"),
        count(lit(1)).as("n_rows"))

  /** Heavy hitters via count-min sketch: estimated frequency of the given
    * candidate items over the column, one sketch pass (mergeable across
    * partitions by the stat machinery). */
  def heavyHitterEstimates(df: DataFrame, colName: String, candidates: Seq[String],
                           eps: Double = 0.001, confidence: Double = 0.99): Seq[(String, Long)] = {
    val cms = df.stat.countMinSketch(col(colName), eps, confidence, seed = 42)
    candidates.map(c => c -> cms.estimateCount(c))
  }

  /** Build a Bloom filter of known document fingerprints — the corpus-side
    * artifact of incremental dedup (tiny vs the corpus: ~1.2 GB per 1B docs
    * at 1% fpp; broadcastable). */
  def fingerprintBloom(corpus: DataFrame, fpCol: Column, expected: Long, fpp: Double = 0.01): BloomFilter =
    corpus.stat.bloomFilter(fpCol, expected, fpp)

  /** Incremental dedup gate: drop new docs whose fingerprint is (probably)
    * already in the corpus. No false negatives: a doc the Bloom filter
    * rejects is definitely absent, so nothing new is ever lost; the fpp
    * fraction of genuinely-new docs is mistakenly dropped (tune fpp, or
    * verify positives exactly against the corpus with a join restricted to
    * the Bloom hits — a tiny fraction of the batch). */
  def filterKnown(newDocs: DataFrame, fpColName: String, bloom: BloomFilter): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val mightContain = GraftBridge.toCol(graft.functions.BloomMightContainExpr(
      GraftBridge.toExpr(col(fpColName)), out.toByteArray))
    // null fingerprints PASS the gate (can't be proven known — dropping
    // them would violate the nothing-new-is-ever-lost contract above)
    newDocs.filter(col(fpColName).isNull || !mightContain)
  }

  /** EXACT incremental dedup with the Bloom filter as a pre-gate: new docs
    * the filter rejects are provably novel (no false negatives) and skip
    * the join entirely; only the bloom-positive sliver — fpp of the novel
    * docs plus the true duplicates — pays an anti-join against the corpus
    * fingerprints. Output is BIT-IDENTICAL to the plain anti-join for any
    * Bloom filter (the sketch prunes work, never changes the answer),
    * which is what makes this form oracle-checkable while [[filterKnown]]
    * stays approximate. At 100 TB the gate turns a corpus-sized shuffle
    * into a batch-sized scan plus a sliver-sized join. */
  /** foreachBatch body of a MAINTAINED SKETCH TABLE: each micro-batch
    * writes its per-dimension KMV sketches into its own `batch_id=N`
    * partition with DYNAMIC partition overwrite, so a redelivered batch
    * replaces its previous output (at-least-once → exactly-once — the same
    * contract as the time-machine sink's batch writes). The read side
    * ([[sketchTableDistinct]]) is `kmv_merge` over the stored VALUES, so
    * distinct-count cube cells stay fresh with O(k) bytes per cell per
    * batch and the raw stream is never re-scanned — the streaming arm of
    * the sketch-table architecture. */
  def maintainSketchTable(batch: DataFrame, dir: String, batchId: Long,
      dims: Seq[String], hashCol: Column, k: Int): Unit =
    batch.groupBy(dims.map(col): _*)
      .agg(graft.functions.KmvSetOps.kmvSketch(hashCol, k).as("sk"))
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(dir)

  /** Merge-on-read over a maintained sketch table: per-dimension distinct
    * estimates from the stored sketches (exact while every per-batch
    * sketch stayed below k). */
  def sketchTableDistinct(spark: org.apache.spark.sql.SparkSession,
      dir: String, dims: Seq[String]): DataFrame = {
    import graft.functions.KmvSetOps._
    spark.read.parquet(dir).groupBy(dims.map(col): _*)
      .agg(kmvEstimate(kmvMerge(col("sk"))).as("n_distinct"))
  }

  /** Bloom-pruned equi-join: probe-side rows that cannot match any build-
    * side key are dropped BEFORE the join's shuffle. Output is BIT-
    * IDENTICAL to the plain inner join for any Bloom filter — false
    * positives only survive the pre-filter, the join itself still decides
    * membership — which is what makes the operator oracle-checkable.
    *
    * When it matters at 100 TB: the dim side is too big to broadcast (so
    * Spark picks a shuffle join and the FULL fact table pays the
    * exchange), but its key Bloom filter is a few MB and rides the plan as
    * a literal into whole-stage codegen ([[graft.functions.BloomMightContainExpr]]).
    * With a selective dim the fact shuffle shrinks by the join's
    * selectivity — the same idea as Spark's own runtime row-level
    * filtering, made explicit and available on any plan shape. Keys are
    * probed as strings so integral and string keys share one code path. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val bloom = dim.select(col(dimKey).cast("string").as("__bk"))
      .stat.bloomFilter("__bk", expectedKeys, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val mightContain = GraftBridge.toCol(graft.functions.BloomMightContainExpr(
      GraftBridge.toExpr(col(factKey).cast("string")), out.toByteArray))
    fact.filter(col(factKey).isNotNull && mightContain)
      .join(dim, col(factKey) === dim(dimKey))
  }

  def novelDocs(newDocs: DataFrame, corpus: DataFrame, fpColName: String,
                bloom: BloomFilter): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val mightContain = GraftBridge.toCol(graft.functions.BloomMightContainExpr(
      GraftBridge.toExpr(col(fpColName)), out.toByteArray))
    val definitelyNovel = newDocs.filter(col(fpColName).isNotNull && !mightContain)
    val suspects = newDocs.filter(col(fpColName).isNull || mightContain)
      .join(corpus.select(col(fpColName)).distinct(), Seq(fpColName), "left_anti")
    definitelyNovel.unionByName(suspects.select(definitelyNovel.columns.map(col): _*))
  }
}
