package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop hash kernels called from generated code (whole-stage codegen
  * emits a static call; the JIT inlines the loop). These exist because the
  * composed-built-in formulations allocate an intermediate array per element
  * per pass — at 100 TB the signature build is the CPU budget.
  *
  * Used by [[graft.functions.SimHash64Expr]] / [[graft.functions.MinHashSigExpr]].
  */
object HashAlgos {

  private final val Seed = 42L

  private def tokenHash(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), Seed)

  /** SimHash-64: bit i of the signature is the sign of the sum over tokens of
    * (+1 if bit i of hash(token) else -1) — near-identical token bags give
    * near-identical signatures (small Hamming distance). One pass, one
    * 64-int accumulator, zero allocation. */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** MinHash signature: each token string is hashed once; the k permutations
    * re-mix the 8-byte hash with XXH64's long finalizer (a distinct seed per
    * slot). Single pass over tokens, one k-length accumulator. */
  def minhashSig(tokens: ArrayData, k: Int): ArrayData = {
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i))
        var j = 0
        while (j < k) {
          val hj = XXH64.hashLong(h, j.toLong)
          if (hj < mins(j)) mins(j) = hj
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
