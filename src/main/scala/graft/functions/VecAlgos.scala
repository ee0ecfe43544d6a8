package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData

/** Tight-loop vector kernels called from generated code — the embedding
  * analog of [[HashAlgos]]. The composed higher-order-function forms
  * (`aggregate(zip_with(...))`) are interpreted per row per pair; in the LSH
  * verify and brute-force scoring paths the dot product IS the CPU budget,
  * so these run as one static call whose loop the JIT vectorizes.
  *
  * Float semantics are IDENTICAL to the built-in fold they replace
  * (left-to-right accumulation over j = 0..n-1, same xxhash64 composition),
  * so scores are bit-equal and the DuckDB oracles stay green.
  */
object VecAlgos {

  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Dot product of two double arrays (sequential left-to-right sum —
    * bit-identical to `aggregate(zip_with(a, b, _*_), 0.0, _+_)`). */
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

  /** Random-hyperplane sign signature over `planes` pseudo-random planes.
    * Plane component (i, j) = (xxhash64(i + offset, j) % 1000) / 1000.0 —
    * exactly the composed-builtin formulation it replaces (Spark's
    * xxhash64(c1, c2) chains XXH64.hashLong with seed 42), so bucket ids are
    * bit-identical while the loop hashes without any per-plane array pass. */
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
