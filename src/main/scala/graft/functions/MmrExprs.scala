package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `mmr_select(queryVec, candidates, λ, k)` → array<bigint>: the ids of k
  * candidates greedily selected by Maximal Marginal Relevance (Carbonell &
  * Goldstein, SIGIR '98) — at each step the unselected candidate
  * maximizing λ·cos(q, d) − (1−λ)·max_{s∈S} cos(d, s), ties broken by id
  * ascending (deterministic). Candidates arrive as
  * array<struct<id:bigint, vec:array<double>>> — one scan-local loop per
  * query row over its shortlist, O(k·n·dim); no shuffle, no driver loop.
  * CodegenFallback: branchy iterative argmax, evaluated once per query
  * row on a k'-bounded array. */
case class MmrSelectExpr(query: Expression, candidates: Expression,
    lambda: Double, k: Int)
  extends BinaryExpression with CodegenFallback {
  require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
  require(k >= 1, "k must be >= 1")

  override def left: Expression = query
  override def right: Expression = candidates
  override def prettyName: String = "mmr_select"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val okQ = query.dataType == ArrayType(DoubleType, containsNull = false) ||
      query.dataType == ArrayType(DoubleType, containsNull = true)
    val okC = candidates.dataType match {
      // the vec field must be array<double> specifically: toVec reads with
      // getDouble, so an array<float> that merely passed isInstanceOf would
      // misread at runtime instead of failing analysis
      case ArrayType(StructType(fields), _) if fields.length == 2 &&
        fields(0).dataType == LongType &&
        (fields(1).dataType match {
          case ArrayType(DoubleType, _) => true
          case _ => false
        }) => true
      case _ => false
    }
    if (okQ && okC) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<struct<id:bigint, vec:array<double>>>)")
  }

  private def toVec(a: ArrayData): Array[Double] = {
    val n = a.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i); i += 1 }
    out
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0
    else round6(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** The engine-portability discipline every green cosine row uses
    * ([[graft.operators.Similarity]] rounds at 6 digits before any argmax):
    * replicates Spark's `round(x, 6)` exactly — BigDecimal HALF_UP over the
    * double's shortest decimal rendering — so the greedy loop's comparisons
    * run over values DuckDB's round(x, 6) reproduces bit-for-bit, and the
    * whole iterative selection becomes oracle-checkable. */
  private def round6(x: Double): Double =
    if (x.isNaN || x.isInfinite) x
    else BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  override protected def nullSafeEval(q: Any, cands: Any): Any = {
    val qv = toVec(q.asInstanceOf[ArrayData])
    val arr = cands.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vecs(i) = toVec(row.getArray(1))
      i += 1
    }
    val rel = vecs.map(cos(qv, _))
    val selected = new Array[Int](math.min(k, n))
    val used = new Array[Boolean](n)
    // running max-sim-to-selected per candidate, updated incrementally so
    // the loop is O(k·n) cosine evaluations, not O(k·n·|S|)
    val maxSim = Array.fill(n)(0.0)
    var step = 0
    while (step < selected.length) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var j = 0
      while (j < n) {
        if (!used(j)) {
          val score =
            if (step == 0) rel(j)
            else lambda * rel(j) - (1.0 - lambda) * maxSim(j)
          if (score > bestScore || (score == bestScore && best >= 0 && ids(j) < ids(best))) {
            best = j; bestScore = score
          }
        }
        j += 1
      }
      selected(step) = best
      used(best) = true
      var m = 0
      while (m < n) {
        if (!used(m)) {
          val s = cos(vecs(best), vecs(m))
          if (s > maxSim(m)) maxSim(m) = s
        }
        m += 1
      }
      step += 1
    }
    new GenericArrayData(selected.map(ids(_)))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MmrSelectExpr =
    copy(query = newLeft, candidates = newRight)
}
