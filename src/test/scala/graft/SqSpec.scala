package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Sq}

/** Scalar quantization (SQ8): grid training, encode clamping, and the
  * full-recall contract — on clustered data with a generous shortlist the
  * compressed scan + exact re-rank EQUALS brute force, and a too-narrow
  * shortlist degrades measurably (never silently). */
class SqSpec extends SparkTestBase {
  import spark.implicits._

  // 4 well-separated one-hot clusters of 10 vectors each + deterministic
  // jitter — same geometry family as the ivfadc fixture
  private def clustered(n: Int) = {
    val vec = transform(sequence(lit(0), lit(7)), j =>
      when(j.cast("long") === col("i") % 4, lit(8.0)).otherwise(lit(0.0)) +
        ((col("i") * (j.cast("long") + 3)) % 5).cast("double") * lit(0.25))
    spark.range(n).select(col("id").as("i"))
      .select(col("i").as("vec_id"), vec.as("embedding"))
  }

  test("trainBounds: per-dim grid over the unit-normalized corpus; constant dim gets step 0") {
    val df = Seq(
      (0L, Seq(1.0, 0.0, 2.0)),
      (1L, Seq(2.0, 0.0, 1.0))).toDF("vec_id", "v")
    val (lo, step) = Sq.trainBounds(df, col("vec_id"), col("v"))
    assert(lo.length == 3 && step.length == 3)
    // dim 1 is 0 in both unit vectors -> constant -> step 0
    assert(lo(1) == 0.0 && step(1) == 0.0)
    // dims 0 and 2 span [1,2]/sqrt(5) normalized -> positive step
    assert(step(0) > 0.0 && step(2) > 0.0)
  }

  test("encode: codes land in [0,255], are deterministic, and constant dims encode 0") {
    val df = clustered(40)
    val (lo, step) = Sq.trainBounds(df, col("vec_id"), col("embedding"))
    val codes = Sq.encode(df, col("vec_id"), col("embedding"), lo, step)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect()
    assert(codes.length == 40)
    assert(codes.forall(_._2.forall(c => c >= 0 && c <= 255)))
    val again = Sq.encode(df, col("vec_id"), col("embedding"), lo, step)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect()
    assert(codes.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("dequantization error is bounded by step/2 on every dimension") {
    val df = clustered(60)
    val (lo, step) = Sq.trainBounds(df, col("vec_id"), col("embedding"))
    val codes = Sq.encode(df, col("vec_id"), col("embedding"), lo, step)
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect().toMap
    val raw = df.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Double])].collect()
    raw.foreach { case (id, v) =>
      val norm = math.sqrt(v.map(x => x * x).sum)
      val vn = v.map(_ / norm)
      val cs = codes(id)
      vn.indices.foreach { j =>
        val dequant = lo(j) + cs(j) * step(j)
        assert(math.abs(dequant - vn(j)) <= step(j) / 2 + 1e-9,
          s"vec $id dim $j: |$dequant - ${vn(j)}| > ${step(j) / 2}")
      }
    }
  }

  test("sq8TopK with full-recall shortlist equals brute force on clustered data") {
    val df = clustered(40)
    val queries = df.filter(col("vec_id") < 8)
    val sq = Sq.sq8TopK(df, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), shortlist = 20, finalK = 5)
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, -r._3, r._2))
    val brute = Similarity.bruteForceTopK(df, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), 5)
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().sortBy(r => (r._1, -r._3, r._2))
    assert(sq.toSeq == brute.toSeq)
  }

  test("too-narrow shortlist degrades recall measurably, never errors") {
    val df = clustered(40)
    val queries = df.filter(col("vec_id") < 8)
    val sq = Sq.sq8TopK(df, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), shortlist = 2, finalK = 5)
    // 2-wide shortlist can return at most 2 results per query
    val counts = sq.groupBy("query_id").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 <= 2) && counts.length == 8)
  }
}
