package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling + packing for corpus assembly. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("deterministic sample: rate-proportional, stable across runs, scan-local") {
    val df = (1L to 10000L).toDF("id")
    val kept = Sampling.deterministicSample(df, col("id"), 0.25)
    val n = kept.count()
    assert(math.abs(n - 2500) < 150, s"kept $n of 10000 at rate 0.25")
    // pure function of the key: identical set on re-evaluation
    assert(Sampling.deterministicSample(df, col("id"), 0.25).count() == n)
    // monotone: a higher rate keeps a superset
    val wider = Sampling.deterministicSample(df, col("id"), 0.5)
    assert(kept.join(wider, "id", "left_anti").count() == 0)
    // no shuffle: the decision is a filter over the scan
    assert(!kept.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("stratified mix applies per-source rates; unlisted sources drop") {
    val df = (1L to 4000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val mixed = Sampling.stratifiedSample(df, col("id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1))
    val bySrc = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 1000L)
    assert(math.abs(bySrc("src1") - 500) < 100)
    assert(math.abs(bySrc("src2") - 100) < 50)
    assert(!bySrc.contains("src3"))
  }

  test("sequence packing: bins chunk the cumulative budget per shard, order-stable") {
    val df = Seq(
      ("en", 1L, 4000L), ("en", 2L, 4000L), ("en", 3L, 4000L), ("en", 4L, 9000L),
      ("fr", 10L, 9999L), ("fr", 11L, 2L)).toDF("lang", "doc_id", "n_tokens")
    val packed = Sampling.packSequences(df, col("lang"), col("doc_id"), col("n_tokens"), 10000L)
      .select("lang", "doc_id", "bin_id").as[(String, Long, Long)].collect().toSet
    // en: cum-starts 0,4000,8000,12000 → bins 0,0,0,1 ; fr: 0,9999 → 0,0
    assert(packed == Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 0L),
      ("en", 4L, 1L), ("fr", 10L, 0L), ("fr", 11L, 0L)))
  }
}
