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

  /** Positional n-gram span hashes: entry i = xxhash64 (seed 42) of the
    * UTF-8 bytes of tokens[i..i+n-1] joined with a single space —
    * bit-identical to `xxhash64(array_join(slice(toks, i+1, n), " "))`,
    * which is the form the span operators' DuckDB oracles compute. Edge
    * parity with the `sequence(0, greatest(L-n, 0))` starts it replaces:
    * one entry per start 0..max(L-n, 0), so a shorter-than-n (even empty)
    * document yields ONE truncated span. One pass, one byte-buffer build
    * per span — a native kernel because the transform+slice+array_join
    * composition is interpreted per element AND re-evaluated wholesale by
    * fused generator stages (the explode-over-expensive-projection trap,
    * measured 8-16× on the PQ encode path). */
  def posSpanHashes(tokens: ArrayData, n: Int): ArrayData = {
    val L = tokens.numElements()
    val count = math.max(L - n, 0) + 1
    val out = new Array[Long](count)
    var i = 0
    while (i < count) {
      val end = math.min(i + n, L)
      var len = 0
      var j = i
      while (j < end) {
        if (!tokens.isNullAt(j)) len += tokens.getUTF8String(j).numBytes() + 1
        j += 1
      }
      val buf = new Array[Byte](math.max(len, 0))
      var pos = 0
      var emitted = 0
      j = i
      while (j < end) {
        // null elements vanish WITH their separator — array_join semantics
        if (!tokens.isNullAt(j)) {
          if (emitted > 0) { buf(pos) = ' '.toByte; pos += 1 }
          val s = tokens.getUTF8String(j)
          s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + pos)
          pos += s.numBytes()
          emitted += 1
        }
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, pos, Seed)
      i += 1
    }
    new GenericArrayData(out)
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
