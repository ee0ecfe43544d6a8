package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) theta-sketch buffer: the k smallest DISTINCT
  * 64-bit hashes seen, compared as unsigned. Internally hashes are stored
  * sign-flipped (`h ^ Long.MinValue`) so natural signed order equals the
  * unsigned order of the raw hash — the TreeSet is ascending in unsigned
  * hash space and `last()` is the k-th minimum (the theta frontier).
  *
  * Size O(k) regardless of stream size; union-mergeable (insert the other
  * sketch's survivors); distinct-ness is free (set semantics). This is the
  * classic distinct-count sketch of Bar-Yossef et al. (RANDOM '02) /
  * Beyer et al. (SIGMOD '07, the (k-1)/θ_k unbiased estimator), the same
  * family as the DataSketches Theta sketch.
  */
final class KmvBuf(val k: Int) {
  // flipped-hash order == unsigned order of the raw hash
  val set = new java.util.TreeSet[java.lang.Long]()

  def insert(rawHash: Long): Unit = {
    val f = rawHash ^ Long.MinValue
    if (set.size < k) { set.add(f): Unit }
    else if (f < set.last()) {
      if (set.add(f)) { set.pollLast(): Unit }
    }
  }

  def mergeFrom(other: KmvBuf): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) {
      val f = it.next().longValue()
      if (set.size < k) { set.add(f): Unit }
      else if (f < set.last()) { if (set.add(f)) { set.pollLast(): Unit } }
    }
  }

  /** Distinct-count estimate: EXACT while fewer than k distinct hashes
    * have been seen (the sketch IS the distinct set); above that, the
    * unbiased KMV estimator (k-1)/θ_k with θ_k the k-th minimum hash
    * normalized to (0, 1). */
  def estimate(): Long = {
    val n = set.size
    if (n < k) n.toLong
    else {
      // flipped value back to unsigned position in [0, 2^64)
      val theta = (set.last().longValue().toDouble - Long.MinValue.toDouble) /
        18446744073709551616.0 // 2^64
      if (theta <= 0.0) n.toLong else math.rint((k - 1) / theta).toLong
    }
  }

  def serialize(): Array[Byte] = {
    val n = set.size
    val buf = ByteBuffer.allocate(SketchWire.HeaderBytes + 4 + 8 * n)
    SketchWire.putHeader(buf, SketchWire.KmvMagic)
    buf.putInt(n)
    val it = set.iterator()
    while (it.hasNext) buf.putLong(it.next().longValue())
    buf.array()
  }
}

object KmvBuf {
  def deserialize(bytes: Array[Byte], k: Int): KmvBuf = {
    if (k <= 0) SketchWire.fail("KMV", s"implausible k=$k")
    val buf = ByteBuffer.wrap(bytes)
    SketchWire.checkHeader(buf, SketchWire.KmvMagic, "KMV")
    SketchWire.need(buf, 4, "KMV", "count field")
    val n = buf.getInt
    SketchWire.need(buf, 8L * n, "KMV", s"hash payload ($n hashes)")
    val b = new KmvBuf(k)
    var i = 0
    // already flipped on the wire; add directly (all survivors fit: n <= k)
    while (i < n) { b.set.add(buf.getLong): Unit; i += 1 }
    b
  }
}

/** `kmv_distinct(hash, k)` → approximate COUNT(DISTINCT) as a bigint, from
  * a 64-bit hash column (feed it `xxhash64(col)` — codegen'd by Spark).
  *
  * Why this exists next to `approx_count_distinct` (HLL++): the KMV sketch
  * is EXACT below k distinct values and degrades gracefully into the
  * (k-1)/θ estimator above — which makes it ORACLE-GATEABLE (an engine
  * computing true COUNT(DISTINCT) must agree exactly on any group with
  * < k distinct members) while still being a genuine O(k) mergeable sketch
  * at 100 TB: the shuffle carries one ≤k-entry sketch per group per map
  * task, never the value set. Relative error above k is ~1/sqrt(k-2)
  * (Beyer et al. SIGMOD '07), spec-pinned in KmvSketchSpec.
  */
case class KmvDistinctAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {
  require(k >= 16, "k must be at least 16")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (hash.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint hash input (use xxhash64(col)), got " +
        hash.dataType.simpleString)

  override def createAggregationBuffer(): KmvBuf = new KmvBuf(k)

  override def update(buffer: KmvBuf, input: InternalRow): KmvBuf = {
    val h = hash.eval(input)
    if (h != null) buffer.insert(h.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: KmvBuf, other: KmvBuf): KmvBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KmvBuf): Any = buffer.estimate()

  override def serialize(buffer: KmvBuf): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): KmvBuf =
    KmvBuf.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvDistinctAgg =
    copy(hash = newChildren.head)
}

object KmvDistinctAgg {
  /** Column form: `kmvDistinct(xxhash64(col), 16384)`. */
  def kmvDistinct(hash: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(KmvDistinctAgg(GraftBridge.toExpr(hash), k).toAggregateExpression())
  }
}
