package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Similarity.asDouble

/** Scalar quantization (the FAISS `SQ8` layout, public knowledge): each
  * dimension of the unit-normalized vector is compressed to one byte via a
  * trained per-dimension affine grid `code = round((x - lo[j]) / step[j])`,
  * and queries rank the corpus in the compressed domain with an asymmetric
  * score — the query stays float, the corpus is read as int codes:
  *
  *   dot(qn, dequant(codes)) = Σ qn[j]·lo[j]  +  Σ (qn[j]·step[j])·codes[j]
  *                             \__ per-query base __/   \__ codegen'd scan __/
  *
  * so the per-pair work is one int·double dot ([[graft.functions.SqScoreExpr]]).
  * A bounded shortlist is then exactly re-ranked, same contract as
  * [[Pq.adcTopK]]: with a shortlist wide enough for full recall the output
  * EQUALS brute force and stays oracle-checkable.
  *
  * 100 TB posture: the compressed scan reads d bytes of information per
  * vector instead of 8d (an 8× I/O cut with far better rank fidelity than
  * PQ at the same budget — SQ8 error is ≤ step/2 ≈ range/510 per dim);
  * training is ONE pass whose shuffle carries d rows per input partition
  * (map-side combined min/max), and the trained grid is d-sized — it rides
  * every downstream plan as a literal, like the PQ codebook. Everything is
  * deterministic: fixed-order sums, id tie-breaks in the bounded top-k.
  */
object Sq {

  private def unit(df: DataFrame, vec: String, out: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    df.withColumn(out,
      GraftBridge.toCol(graft.functions.UnitVecExpr(GraftBridge.toExpr(col(vec)))))
  }

  private def litDoubles(a: Array[Double]): Column = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    GraftBridge.toCol(Literal.create(a, ArrayType(DoubleType, containsNull = false)))
  }

  private def sqScore(codes: Column, w: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.SqScoreExpr(
      GraftBridge.toExpr(codes), GraftBridge.toExpr(w)))
  }

  /** Train the per-dimension grid over the unit-normalized corpus: one
    * posexplode + groupBy(pos) pass — partial min/max combine map-side, so
    * the shuffle carries d rows per input partition and the collected
    * result is d rows, driver-tiny at ANY corpus scale (FAISS trains SQ
    * the same way: one pass, per-dim bounds). Returns (lo, step) with
    * step = (hi − lo) / levels; a constant dimension gets step 0 and every
    * code 0. */
  def trainBounds(corpus: DataFrame, idCol: Column, vecCol: Column,
                  levels: Int = 255): (Array[Double], Array[Double]) = {
    val vn = unit(corpus.select(idCol.as("vec_id"), asDouble(vecCol).as("v")), "v", "vn")
    val rows = vn.select(posexplode(col("vn")).as(Seq("pos", "x")))
      .groupBy("pos").agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
      .collect()
    require(rows.nonEmpty, "cannot train SQ bounds on an empty corpus")
    val d = rows.map(_.getInt(0)).max + 1
    val lo = new Array[Double](d)
    val step = new Array[Double](d)
    rows.foreach { r =>
      val p = r.getInt(0)
      lo(p) = r.getDouble(r.fieldIndex("lo"))
      step(p) = (r.getDouble(r.fieldIndex("hi")) - lo(p)) / levels
    }
    (lo, step)
  }

  /** SQ8 encode: a PURE PROJECTION — the trained grid rides the plan as two
    * d-sized literals and each code is `round((vn[j]-lo[j])/step[j])`
    * clamped to [0, levels]. Zero shuffles, zero joins; the encode scan is
    * the write path of a compressed ANN index. */
  def encode(corpus: DataFrame, idCol: Column, vecCol: Column,
             lo: Array[Double], step: Array[Double], levels: Int = 255): DataFrame = {
    val loL = litDoubles(lo)
    val stL = litDoubles(step)
    val vn = unit(corpus.select(idCol.as("vec_id"), asDouble(vecCol).as("v")), "v", "vn")
    val codes = transform(col("vn"), (x, j) => {
      val l = element_at(loL, j + 1)
      val s = element_at(stL, j + 1)
      when(s <= lit(0.0), lit(0))
        .otherwise(least(lit(levels), greatest(lit(0), round((x - l) / s).cast("int"))))
    })
    vn.select(col("vec_id"), codes.as("codes"))
  }

  /** SQ8 top-k: train → encode → compressed-domain asymmetric scan →
    * per-query bounded shortlist → exact cosine re-rank (same float-op
    * order as [[Similarity.bruteForceTopK]], so with full shortlist recall
    * the output equals brute force). Both selection stages are bounded
    * partial top-k aggregates ([[Similarity.topKByScore]]): each map task
    * reduces to ≤ shortlist entries per query before any shuffle, and the
    * query-side tables (d-sized weights per query) broadcast, so the
    * compressed scan stays shuffle-free. */
  def sq8TopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              shortlist: Int, finalK: Int, levels: Int = 255): DataFrame = {
    val (lo, step) = trainBounds(corpus, corpusId, corpusVec, levels)
    val codes = encode(corpus, corpusId, corpusVec, lo, step, levels)
    val loL = litDoubles(lo)
    val stL = litDoubles(step)
    val q0 = unit(queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv")), "qv", "qvn")
    // per-query asymmetric table: d weights + 1 base scalar (the SQ analog
    // of the PQ m·k lookup table)
    val qt = q0.select(col("query_id"),
      zip_with(col("qvn"), stL, (q, s) => q * s).as("w"),
      aggregate(zip_with(col("qvn"), loL, (q, l) => q * l),
        lit(0.0), (acc, x) => acc + x).as("base"))
    val cand = codes.crossJoin(broadcast(qt))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sq", col("base") + sqScore(col("codes"), col("w")))
      .groupBy("query_id")
      .agg(Similarity.topKByScore(col("sq"), col("vec_id"), shortlist).as("__tk"))
      .select(col("query_id"), explode(col("__tk").getField("id")).as("vec_id"))
    val c = corpus.select(corpusId.as("vec_id"), asDouble(corpusVec).as("cv"))
    val q = queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv"))
    // shortlist is |q|·shortlist rows by construction — broadcast it so the
    // exact re-rank is one more scan-local pass over the corpus
    c.join(broadcast(cand), "vec_id").join(broadcast(q), "query_id")
      .withColumn("cos_sim", round(Similarity.cosine(col("cv"), col("qv")), 6))
      .groupBy("query_id")
      .agg(Similarity.topKByScore(col("cos_sim"), col("vec_id"), finalK).as("__tk"))
      .select(col("query_id"), explode(col("__tk")).as("__e"))
      .select(col("query_id"), col("__e.id").as("vec_id"), col("__e.score").as("cos_sim"))
  }
}
