package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** MMR re-rank ([[graft.functions.MmrSelectExpr]]): diversity beats
  * near-duplicate relevance at low λ, pure relevance at λ=1, bounds and
  * tie determinism. */
class MmrSpec extends SparkTestBase {
  import spark.implicits._

  private def shortlist(cands: Seq[(Long, Seq[Double])], q: Seq[Double]) =
    Seq((0L, q, cands)).toDF("query_id", "qv", "raw")
      .select(col("query_id"), col("qv"),
        expr("transform(raw, c -> struct(c._1 AS id, c._2 AS vec))").as("cands"))

  private val q = Seq(1.0, 0.0)
  private val a = 1L -> Seq(0.9, 0.1)   // most relevant
  private val b = 2L -> Seq(0.89, 0.12) // near-duplicate of a
  private val c = 3L -> Seq(0.5, 0.5)   // diverse, less relevant

  test("λ=0.3 picks the diverse candidate over the near-duplicate") {
    val out = Similarity.mmrRerank(shortlist(Seq(a, b, c), q),
        "query_id", "qv", "cands", lambda = 0.3, k = 2)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 3L))
  }

  test("λ=1 degenerates to pure relevance order") {
    val out = Similarity.mmrRerank(shortlist(Seq(c, b, a), q),
        "query_id", "qv", "cands", lambda = 1.0, k = 3)
      .orderBy("rank").select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L, 3L))
  }

  test("k beyond the shortlist returns every candidate once") {
    val out = Similarity.mmrRerank(shortlist(Seq(a, b), q),
        "query_id", "qv", "cands", lambda = 0.5, k = 10)
      .select("vec_id").as[Long].collect().toSeq
    assert(out.sorted == Seq(1L, 2L))
  }

  test("exact ties break by id ascending regardless of candidate order") {
    val t1 = 7L -> Seq(0.6, 0.8)
    val t2 = 4L -> Seq(0.6, 0.8) // identical vector, smaller id
    for (order <- Seq(Seq(t1, t2), Seq(t2, t1))) {
      val out = Similarity.mmrRerank(shortlist(order, q),
          "query_id", "qv", "cands", lambda = 0.5, k = 1)
        .select("vec_id").as[Long].collect().toSeq
      assert(out == Seq(4L), s"order $order")
    }
  }
}
