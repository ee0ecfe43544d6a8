package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Late-interaction MaxSim ([[Similarity.maxSimTopK]]): per-query-token
  * best-document-token semantics on constructed vectors where the
  * interaction matrix is known in closed form. */
class MaxSimSpec extends SparkTestBase {
  import spark.implicits._

  // 4-dim vectors, 2 tokens of 2 dims. Basis chunks: ex=(1,0), ey=(0,1).
  private val docs = Seq(
    // doc 1: tokens (ex, ey) — orthogonal pair
    (1L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
    // doc 2: tokens (ex, ex)
    (2L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
    // doc 3: tokens (-ex, -ey) — anti-aligned
    (3L, Array(-1.0f, 0.0f, 0.0f, -1.0f)),
    // query row (excluded from results by id)
    (9L, Array(1.0f, 0.0f, 0.0f, 1.0f))
  ).toDF("vec_id", "embedding")

  private def scores(): Map[Long, Double] =
    Similarity.maxSimTopK(docs, col("vec_id"), col("embedding"),
        docs.filter(col("vec_id") === 9), col("vec_id"), col("embedding"),
        numTokens = 2, k = 10)
      .select(col("vec_id"), col("maxsim"))
      .as[(Long, Double)].collect().toMap

  test("maxsim: each query token takes its best document token") {
    val s = scores()
    // query tokens (ex, ey):
    // doc1: ex matches ex (1) + ey matches ey (1) = 2
    // doc2: ex→ex (1) + ey→best of (ex,ex) (0) = 1
    // doc3: ex→best(-ex,-ey)=0 + ey→best(-ex,-ey)=0 = 0
    assert(s == Map(1L -> 2.0, 2L -> 1.0, 3L -> 0.0))
  }

  test("mips: norm-augmented ranking follows inner product where cosine disagrees") {
    // q=(1,0): cosine ranks a=(0.9,0) first (cos 1.0 vs 0.707), but inner
    // product ranks b=(2,2) first (2.0 vs 0.9) — MIPS must follow dot
    val vecs = Seq(
      (1L, Array(0.9f, 0.0f)),
      (2L, Array(2.0f, 2.0f)),
      (9L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = Similarity.mipsTopK(vecs, col("vec_id"), col("embedding"),
        vecs.filter(col("vec_id") === 9), col("vec_id"), col("embedding"), 10)
      .select(col("vec_id")).as[Long].collect().toSeq
    assert(got == Seq(2L, 1L))
  }

  test("maxsim: k bounds the shortlist with (score desc, id asc) order") {
    val top = Similarity.maxSimTopK(docs, col("vec_id"), col("embedding"),
        docs.filter(col("vec_id") === 9), col("vec_id"), col("embedding"),
        numTokens = 2, k = 2)
      .select(col("vec_id")).as[Long].collect().toSeq
    assert(top == Seq(1L, 2L))
  }

  test("prefixMrrEval: prefix misranking demotes the full-dim ground " +
      "truth to rank 2; outside top-k scores rr 0") {
    // q=[1,0,0]; c1=[0.8,0.6,0] (full cos 0.8 — the true NN);
    // c2=[0.9,0.1,2] (full cos 0.41, but 2-dim prefix cos 0.9939 > 0.8)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 2.0f))
    ).toDF("vec_id", "embedding")
    val r = Similarity.prefixMrrEval(emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") === 0L), col("vec_id"), col("embedding"),
        prefixDims = 2, k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 1L, 2L, 500000L)), s"${r.toSeq}")
    // k = 1 cuts the list above the ground truth: rank and rr report 0
    val r1 = Similarity.prefixMrrEval(emb, col("vec_id"), col("embedding"),
        emb.filter(col("vec_id") === 0L), col("vec_id"), col("embedding"),
        prefixDims = 2, k = 1)
      .as[(Long, Long, Long, Long)].collect()
    assert(r1.toSeq == Seq((0L, 1L, 0L, 0L)), s"${r1.toSeq}")
  }
}
