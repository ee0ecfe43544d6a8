package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop vector kernels called from generated code — the embedding
  * analog of [[HashAlgos]]. The composed higher-order-function forms
  * (`aggregate(zip_with(...))`) are interpreted per row per pair; in the LSH
  * verify and brute-force scoring paths the dot product IS the CPU budget,
  * so these run as one static call whose loop the JIT vectorizes.
  *
  * Dot-product float semantics match the built-in fold for equal-length
  * inputs (left-to-right accumulation over j = 0..n-1), so scores are
  * bit-equal and the DuckDB oracles stay green; length-mismatch surfacing
  * (NULL) lives in [[DotProductExpr]], which gates this kernel.
  */
object VecAlgos {

  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Dot product of two double arrays (sequential left-to-right sum —
    * bit-identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)` for
    * equal-length inputs; callers guarantee equal lengths, see
    * [[DotProductExpr]]). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  /** Asymmetric scalar-quantization score term: Σ_j codes[j]·w[j] for an
    * SQ8-encoded vector (int codes) against a query's precomputed
    * per-dimension weights w[j] = qn[j]·step[j]. Left-to-right sum, so
    * bit-deterministic across the cluster; the query's constant base term
    * Σ qn[j]·lo[j] is added outside (plain column add). */
  def sqDot(codes: ArrayData, w: ArrayData): Double = {
    val n = math.min(codes.numElements(), w.numElements())
    var s = 0.0d
    var i = 0
    while (i < n) {
      s += codes.getInt(i) * w.getDouble(i)
      i += 1
    }
    s
  }

  /** Asymmetric-distance (ADC) score for a product-quantized vector: the
    * query's per-subspace lookup table is flattened to `m·k` doubles
    * (subspace-major), the vector is `m` code ids, and the score is
    * Σ_s table[s·k + codes[s]] — left-to-right, so bit-deterministic.
    * Returns NaN only if a code indexes out of range, which
    * [[AdcScoreExpr]] surfaces as NULL (corrupt codes must not rank). */
  def adcScore(codes: ArrayData, table: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    var s = 0.0d
    var i = 0
    while (i < m) {
      val c = codes.getInt(i)
      if (c < 0 || c >= k || i * k + c >= table.numElements()) return Double.NaN
      s += table.getDouble(i * k + c)
      i += 1
    }
    s
  }

  /** PQ-encode a unit-normalized vector against a flattened codebook
    * (subspace-major: entry [s][c][j] at ((s·k)+c)·sublen + j, sublen =
    * cwFlat.length / (m·k)): per subspace the L2-argmin codeword id, ties
    * to the smaller id. Distance is computed in the EXACT float-op order of
    * the relational formulation this replaces (and of the DuckDB oracle):
    * d2 = dot(sv,sv) − 2·dot(sv,cw) + dot(cw,cw), each dot a sequential
    * left-to-right sum — so codes are bit-identical to the former
    * join+groupBy plan. Returns null if the vector is shorter than the
    * codebook's m·sublen span (corrupt/mismatched embedding — must not
    * encode). Zero shuffles: this turns corpus encoding into a pure
    * scan-local projection. */
  def pqEncode(vec: ArrayData, cwFlat: ArrayData, m: Int, k: Int): ArrayData = {
    val sublen = cwFlat.numElements() / (m * k)
    if (vec.numElements() < m * sublen) return null
    val codes = new Array[Int](m)
    var s = 0
    while (s < m) {
      val vOff = s * sublen
      // dot(sv, sv) once per subspace
      var ss = 0.0d
      var j = 0
      while (j < sublen) { val x = vec.getDouble(vOff + j); ss += x * x; j += 1 }
      var bestD2 = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val cwOff = (s * k + c) * sublen
        var sc = 0.0d
        var cc = 0.0d
        j = 0
        while (j < sublen) {
          val x = vec.getDouble(vOff + j)
          val w = cwFlat.getDouble(cwOff + j)
          sc += x * w
          j += 1
        }
        j = 0
        while (j < sublen) { val w = cwFlat.getDouble(cwOff + j); cc += w * w; j += 1 }
        val d2 = ss - 2.0d * sc + cc
        if (d2 < bestD2) { bestD2 = d2; bestC = c } // strict <: ties keep smaller c
        c += 1
      }
      codes(s) = bestC
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(codes)
  }

  /** Per-query flattened ADC lookup table against the same flattened
    * codebook layout as [[pqEncode]]: entry s·k + c = dot(q_s, cw[s][c])
    * (sequential sum — bit-identical to the former join+collect_list plan).
    * Returns null on a short query vector. Scan-local: replaces a
    * subspace-explode + broadcast-join + groupBy per query set. */
  def pqQueryTable(vec: ArrayData, cwFlat: ArrayData, m: Int, k: Int): ArrayData = {
    val sublen = cwFlat.numElements() / (m * k)
    if (vec.numElements() < m * sublen) return null
    val table = new Array[Double](m * k)
    var s = 0
    while (s < m) {
      val vOff = s * sublen
      var c = 0
      while (c < k) {
        val cwOff = (s * k + c) * sublen
        var e = 0.0d
        var j = 0
        while (j < sublen) { e += vec.getDouble(vOff + j) * cwFlat.getDouble(cwOff + j); j += 1 }
        table(s * k + c) = e
        c += 1
      }
      s += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(table)
  }

  /** Unit-normalized copy of a double vector, in the EXACT float-op order
    * of the `transform(v, x => x / sqrt(dot(v,v)))` form it replaces
    * (sequential dot, one sqrt, per-element divide): zero-or-negative
    * norms return the input unchanged (0/0 must not poison downstream
    * scores). Native because the HOF form is interpreted per element AND
    * re-evaluated by fused generator stages — measured 8-16× on
    * explode-over-encode pipelines. */
  def unitVec(v: ArrayData): ArrayData = {
    val n = v.numElements()
    var s = 0.0d
    var i = 0
    while (i < n) { val x = v.getDouble(i); s += x * x; i += 1 }
    val norm = math.sqrt(s)
    if (!(norm > 0.0d)) return v
    val out = new Array[Double](n)
    i = 0
    while (i < n) { out(i) = v.getDouble(i) / norm; i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Spark's `round(x, 6)` for doubles, exactly (RoundBase semantics):
    * NaN/Infinity pass through, otherwise decimal HALF_UP at scale 6 via
    * the Double.toString-exact BigDecimal — bit-identical to the built-in,
    * which the DuckDB oracles are calibrated against. */
  @inline private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Nearest centroid by rounded cosine — the IVF assignment argmax as one
    * codegen'd kernel. `ctsFlat` is the centroid matrix (centroid-major,
    * k rows of dim = ctsFlat.length/k), `ids` the k centroid ids; both are
    * plan literals (the centroid table is driver-tiny at any corpus
    * scale). Selection order is EXACTLY the relational struct-min the
    * kernel replaces: highest round(cos, 6) wins, ties to the smaller id;
    * NaN sims (zero norms, dim mismatch) never beat a real sim, and an
    * all-NaN row falls to the smallest id — so assignments are
    * bit-identical to the `array_min(transform(...))` form and the SQL
    * oracle. */
  def nearestCentroid(v: ArrayData, ctsFlat: ArrayData, ids: ArrayData, k: Int): Long = {
    val dim = ctsFlat.numElements() / k
    val n = v.numElements()
    var nv = 0.0d
    var j = 0
    while (j < n) { val x = v.getDouble(j); nv += x * x; j += 1 }
    val normV = math.sqrt(nv)
    var bestSim = Double.NaN
    var bestId = 0L
    var have = false
    var c = 0
    while (c < k) {
      val id = ids.getLong(c)
      val sim =
        if (n != dim) Double.NaN
        else {
          val off = c * dim
          var dot = 0.0d
          var cc = 0.0d
          j = 0
          while (j < dim) {
            val w = ctsFlat.getDouble(off + j)
            dot += v.getDouble(j) * w
            cc += w * w
            j += 1
          }
          round6(dot / (normV * math.sqrt(cc)))
        }
      if (!have) { have = true; bestSim = sim; bestId = id }
      else if (java.lang.Double.isNaN(bestSim)) {
        if (!java.lang.Double.isNaN(sim) || id < bestId) { bestSim = sim; bestId = id }
      } else if (!java.lang.Double.isNaN(sim) &&
        (sim > bestSim || (sim == bestSim && id < bestId))) { bestSim = sim; bestId = id }
      c += 1
    }
    bestId
  }

  /** Top-`p` nearest centroids by rounded cosine — the MULTIPROBE
    * generalization of [[nearestCentroid]] (p = 1 selects the identical
    * centroid). Same plan-literal centroid matrix, same total order
    * (higher round(cos, 6) first, ties to the smaller id; NaN sims sort
    * after every real sim, NaN ties to the smaller id), returned in
    * selection order. O(k·p) selection per row — both driver-tiny — so
    * probing stays a pure scan-local projection. */
  def topCentroids(v: ArrayData, ctsFlat: ArrayData, ids: ArrayData, k: Int, p: Int): ArrayData = {
    val dim = ctsFlat.numElements() / k
    val n = v.numElements()
    var nv = 0.0d
    var j = 0
    while (j < n) { val x = v.getDouble(j); nv += x * x; j += 1 }
    val normV = math.sqrt(nv)
    val sims = new Array[Double](k)
    var c = 0
    while (c < k) {
      sims(c) =
        if (n != dim) Double.NaN
        else {
          val off = c * dim
          var dot = 0.0d
          var cc = 0.0d
          j = 0
          while (j < dim) {
            val w = ctsFlat.getDouble(off + j)
            dot += v.getDouble(j) * w
            cc += w * w
            j += 1
          }
          round6(dot / (normV * math.sqrt(cc)))
        }
      c += 1
    }
    val m = math.min(p, k)
    val out = new Array[Long](m)
    val taken = new Array[Boolean](k)
    var r = 0
    while (r < m) {
      var best = -1
      c = 0
      while (c < k) {
        if (!taken(c)) {
          if (best < 0) best = c
          else {
            val bs = sims(best); val cs = sims(c)
            val better =
              if (java.lang.Double.isNaN(bs))
                !java.lang.Double.isNaN(cs) || ids.getLong(c) < ids.getLong(best)
              else !java.lang.Double.isNaN(cs) &&
                (cs > bs || (cs == bs && ids.getLong(c) < ids.getLong(best)))
            if (better) best = c
          }
        }
        c += 1
      }
      taken(best) = true
      out(r) = ids.getLong(best)
      r += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Random-hyperplane sign signature over `planes` pseudo-random planes.
    * Plane component (i, j) = (hash64(i + offset, j) % 1000) / 1000.0 via
    * XXH64.hashLong chains (seed 42) — deterministic, driver-state-free,
    * identical on every executor; see [[HyperplaneSigExpr]] for the
    * compatibility note vs the composed built-in formulation. */
  def hyperplaneSig(vec: ArrayData, planes: Int, planeOffset: Int): Long = {
    val n = vec.numElements()
    var sig = 0L
    var i = 0
    while (i < planes) {
      val planeSeed = XXH64.hashLong((i + planeOffset).toLong, Seed)
      var s = 0.0d
      var j = 0
      while (j < n) {
        val h = XXH64.hashLong(j.toLong, planeSeed)
        s += vec.getDouble(j) * ((h % 1000L).toDouble / 1000.0d)
        j += 1
      }
      if (s >= 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
