package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Similarity.asDouble

/** Product quantization (Jégou/Douze/Schmid, "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public knowledge): vectors are
  * compressed to `m` small subspace code ids, and queries rank the whole
  * corpus in the compressed domain via an m·k lookup table (ADC), touching
  * full vectors only for a bounded shortlist that is exactly re-ranked.
  *
  * 100 TB posture: the compressed scan reads m ints per vector instead of
  * the d-dim float payload (16–64× less I/O and shuffle), the per-pair score
  * is a codegen'd m-element table walk ([[graft.functions.AdcScoreExpr]]),
  * and the expensive exact cosine runs only on shortlist·|queries| rows.
  * Everything is deterministic: the codebook derives from the first-k
  * corpus vectors by id, argmin ties break by code id, and the ADC sum is
  * fixed-order — so with a shortlist wide enough for full recall the final
  * top-k EQUALS the brute-force result and stays oracle-checkable.
  */
object Pq {

  /** Native ADC score ([[graft.functions.AdcScoreExpr]]). */
  def adc(codes: Column, table: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.AdcScoreExpr(
      GraftBridge.toExpr(codes), GraftBridge.toExpr(table), k))
  }

  /** Bounded partial top-k ([[Similarity.topKByScore]]) — the shortlist/
    * re-rank selector; map-side caps each partition at k entries per query
    * before the shuffle, where a per-query `row_number()` window would ship
    * and fully sort the whole candidate set on one task. */
  private def topKPairs(score: Column, id: Column, k: Int): Column =
    Similarity.topKByScore(score, id, k)

  /** Unit-normalized copy of a double-array column via the native
    * [[graft.functions.UnitVecExpr]] (same float-op order as the
    * transform-lambda form it replaces; zero-norm rows pass through —
    * 0/0 would poison ADC). Native matters twice: the lambda form was
    * interpreted per element, and fused generator stages (explode over an
    * encode projection) re-evaluate their input expression — measured
    * 8-16× wall on sim_pq_encode before the switch. */
  private def withUnit(df: DataFrame, vec: String, out: String): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    df.withColumn(out,
      GraftBridge.toCol(graft.functions.UnitVecExpr(GraftBridge.toExpr(col(vec)))))
  }

  /** Subspace slices (sub_id, sv) of a unit-normalized vector column. */
  private def subspaces(df: DataFrame, keep: Seq[String], vn: String, m: Int): DataFrame =
    df.select(keep.map(col) :+ explode(sequence(lit(0), lit(m - 1))).as("sub_id")
        :+ col(vn) :+ (size(col(vn)) / m).as("__sublen"): _*)
      .select(keep.map(col) :+ col("sub_id")
        :+ slice(col(vn), col("sub_id") * col("__sublen") + 1, col("__sublen")).as("sv"): _*)

  /** Deterministic codebook: subspace slices of the first `k` corpus vectors
    * by id (unit-normalized domain). Driver-tiny (m·k rows) and collected
    * local, so every downstream use broadcasts a literal relation instead of
    * re-running the limit. */
  def seedCodebook(corpus: DataFrame, idCol: Column, vecCol: Column, m: Int, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val base = withUnit(
        corpus.select(idCol.as("vec_id"), asDouble(vecCol).as("v")).orderBy("vec_id").limit(k),
        "v", "vn")
      .withColumn("code_id", row_number().over(Window.orderBy(col("vec_id"))) - 1)
    val sub = subspaces(base, Seq("code_id"), "vn", m)
      .select(col("sub_id"), col("code_id"), col("sv").as("cw"))
    val local = sub.collect().toSeq.map(r =>
      (r.getInt(r.fieldIndex("sub_id")), r.getInt(r.fieldIndex("code_id")),
        r.getSeq[Double](r.fieldIndex("cw"))))
    import spark.implicits._
    local.toDF("sub_id", "code_id", "cw")
  }

  /** Codebook localized and flattened subspace-major ([s][c][j] at
    * ((s·k)+c)·sublen + j) into ONE literal array<double> column, plus the
    * inferred k. The codebook is m·k rows — driver-tiny at any corpus scale
    * (the same bounded-collect contract as [[seedCodebook]]) — so shipping
    * it as a plan literal lets encode/query-table become scan-local
    * projections instead of explode+join+groupBy subplans. */
  private def flatCodebook(codebook: DataFrame, m: Int): (Column, Int) = {
    val rows = codebook.select(col("sub_id"), col("code_id"), col("cw")).collect()
    require(rows.nonEmpty, "codebook is empty")
    val k = rows.map(_.getInt(1)).max + 1
    val sublen = rows.head.getSeq[Double](2).length
    val flat = new Array[Double](m * k * sublen)
    rows.foreach { r =>
      val off = (r.getInt(0) * k + r.getInt(1)) * sublen
      val cw = r.getSeq[Double](2)
      var j = 0
      while (j < sublen) { flat(off + j) = cw(j); j += 1 }
    }
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    (GraftBridge.toCol(Literal.create(flat, ArrayType(DoubleType, containsNull = false))), k)
  }

  /** Native scan-local encode column ([[graft.functions.PqEncodeExpr]]). */
  private def encodeCol(vn: Column, cbFlat: Column, m: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.PqEncodeExpr(
      GraftBridge.toExpr(vn), GraftBridge.toExpr(cbFlat), m, k))
  }

  /** Encode the corpus: per (vector, subspace) the L2-argmin codeword id,
    * ties broken by code id, assembled subspace-major into an array<int> of
    * length m. A PURE PROJECTION: the codebook rides the plan as a literal
    * and [[graft.functions.PqEncodeExpr]] computes all m argmins in one
    * codegen'd pass — zero shuffles, zero joins (the former
    * explode+join+double-groupBy plan paid two corpus-scale shuffles for
    * bit-identical codes: same d2 float-op order, same smaller-id
    * tie-break). */
  def encode(corpus: DataFrame, idCol: Column, vecCol: Column,
             codebook: DataFrame, m: Int): DataFrame = {
    val (cbFlat, k) = flatCodebook(codebook, m)
    val v = withUnit(corpus.select(idCol.as("vec_id"), asDouble(vecCol).as("v")), "v", "vn")
    v.select(col("vec_id"), encodeCol(col("vn"), cbFlat, m, k).as("codes"))
  }

  /** Per-query flattened ADC lookup table: entry (s, c) = dot(q_s, cw_{s,c})
    * over the unit-normalized query, subspace-major array<double> of m·k —
    * so ADC approximates the cosine of the normalized pair. Scan-local for
    * the same reason as [[encode]] ([[graft.functions.PqQueryTableExpr]]). */
  def queryTables(codebook: DataFrame, queries: DataFrame,
                  queryId: Column, queryVec: Column, m: Int): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val (cbFlat, k) = flatCodebook(codebook, m)
    val q = withUnit(queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv")),
      "qv", "qvn")
    q.select(col("query_id"), GraftBridge.toCol(graft.functions.PqQueryTableExpr(
      GraftBridge.toExpr(col("qvn")), GraftBridge.toExpr(cbFlat), m, k)).as("qtable"))
  }

  /** IVFADC (Jégou et al. §V: coarse quantizer + product-quantized
    * residual scan — the FAISS billion-scale layout, here on raw vectors):
    * Lloyd's centroids partition the corpus into inverted lists whose
    * members are stored as PQ codes; each query probes its `nProbe`
    * nearest lists, ADC-scores ONLY those members in the compressed
    * domain, and exactly re-ranks a bounded shortlist.
    *
    * 100 TB posture — this is the layout the big-ANN world actually runs:
    * the corpus shuffles once (by centroid id) at build; a query touches
    * nProbe/k of the corpus and reads m bytes per member instead of the
    * d-dim payload, so scan volume drops by (k/nProbe)·(4d/m)×; the exact
    * re-rank touches shortlist·|queries| full vectors. Recall is the
    * product of probe recall and shortlist recall — both measurable (the
    * spec pins full recall on clustered data with generous settings). */
  def ivfAdcTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
                 queries: DataFrame, queryId: Column, queryVec: Column,
                 kClusters: Int, iters: Int, m: Int, kCodes: Int,
                 nProbe: Int, shortlist: Int, finalK: Int): DataFrame = {
    val cts = Similarity.kmeansCentroids(corpus, corpusId, corpusVec, kClusters, iters)
    val assigned = Similarity.ivfAssign(corpus, corpusId, corpusVec, cts)
    val cb = seedCodebook(corpus, corpusId, corpusVec, m, kCodes)
    // encode FUSED onto the assignment scan (both are projections over the
    // same vector column) — the former plan joined two corpus-scale
    // subplans on vec_id just to put codes next to centroid ids
    val (cbFlat, _) = flatCodebook(cb, m)
    val lists = withUnit(assigned, "v", "vn")
      .select(col("vec_id"), col("centroid_id"),
        encodeCol(col("vn"), cbFlat, m, kCodes).as("codes"))
    // query-side probe plan: nProbe nearest centroids by cosine, via the
    // same struct-min argmax trick k times -> a rank over k rows per query
    // (centroids are driver-tiny, so this window input is |q|·k rows)
    val q = queries.select(queryId.as("query_id"), Similarity.asDouble(queryVec).as("qv"))
    val probed = q.join(broadcast(cts))
      .withColumn("sim", round(Similarity.cosine(col("qv"), col("cvec")), 6))
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("centroid_id"))))
      .filter(col("__rn") <= nProbe)
      .select("query_id", "centroid_id")
    val qt = queryTables(cb, queries, queryId, queryVec, m)
    // both selection stages are bounded partial top-k aggregates, not
    // per-query windows: the ADC candidate set (nProbe lists × |q|) never
    // sorts whole per-query partitions on single tasks — each map task
    // reduces to ≤ shortlist entries per query before the shuffle. The
    // probe plan (|q|·nProbe rows) and per-query tables broadcast, so the
    // compressed scan of the lists side stays shuffle-free.
    val cand = lists.join(broadcast(probed), "centroid_id")
      .join(broadcast(qt), "query_id")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adc(col("codes"), col("qtable"), kCodes))
      .groupBy("query_id")
      .agg(topKPairs(col("adc"), col("vec_id"), shortlist).as("__tk"))
      .select(col("query_id"), explode(col("__tk").getField("id")).as("vec_id"))
    val c = corpus.select(corpusId.as("vec_id"), asDouble(corpusVec).as("cv"))
    val qv = queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv"))
    // the shortlist is |q|·shortlist rows by construction (the operator's
    // bounded-re-rank contract) — broadcast it so the exact re-rank is one
    // more scan-local pass over the corpus
    c.join(broadcast(cand), "vec_id").join(broadcast(qv), "query_id")
      .withColumn("cos_sim", round(Similarity.cosine(col("cv"), col("qv")), 6))
      .groupBy("query_id")
      .agg(topKPairs(col("cos_sim"), col("vec_id"), finalK).as("__tk"))
      .select(col("query_id"), explode(col("__tk")).as("__e"))
      .select(col("query_id"), col("__e.id").as("vec_id"), col("__e.score").as("cos_sim"))
  }

  /** PQ top-k: compressed-domain ADC scan → per-query shortlist → exact
    * cosine re-rank (same float-op order as [[Similarity.bruteForceTopK]]).
    * With `shortlist` wide enough for full recall the output equals the
    * brute-force top-k; the spec asserts that equality, and recall
    * degradation under a too-narrow shortlist is measurable, not silent. */
  def adcTopK(corpus: DataFrame, corpusId: Column, corpusVec: Column,
              queries: DataFrame, queryId: Column, queryVec: Column,
              m: Int, k: Int, shortlist: Int, finalK: Int): DataFrame = {
    val cb = seedCodebook(corpus, corpusId, corpusVec, m, k)
    val codes = encode(corpus, corpusId, corpusVec, cb, m)
    val qt = queryTables(cb, queries, queryId, queryVec, m)
    // bounded partial top-k in both stages — see [[topKPairs]]; the
    // compressed-domain scan reduces map-side to ≤ shortlist rows per query
    val cand = codes.crossJoin(broadcast(qt))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("adc", adc(col("codes"), col("qtable"), k))
      .groupBy("query_id")
      .agg(topKPairs(col("adc"), col("vec_id"), shortlist).as("__tk"))
      .select(col("query_id"), explode(col("__tk").getField("id")).as("vec_id"))
    val c = corpus.select(corpusId.as("vec_id"), asDouble(corpusVec).as("cv"))
    val q = queries.select(queryId.as("query_id"), asDouble(queryVec).as("qv"))
    c.join(broadcast(cand), "vec_id").join(broadcast(q), "query_id")
      .withColumn("cos_sim", round(Similarity.cosine(col("cv"), col("qv")), 6))
      .groupBy("query_id")
      .agg(topKPairs(col("cos_sim"), col("vec_id"), finalK).as("__tk"))
      .select(col("query_id"), explode(col("__tk")).as("__e"))
      .select(col("query_id"), col("__e.id").as("vec_id"), col("__e.score").as("cos_sim"))
  }
}
