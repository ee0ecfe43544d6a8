package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Sketch-as-column KMV theta operations (the DataSketches architecture,
  * Dasgupta et al. "Theta-Sketch Framework", PODS '16): [[KmvSketchAgg]]
  * aggregates a stream into a serialized sketch VALUE, and scalar
  * expressions estimate / union / intersect those values.
  *
  * Why sketches as columns matter at 100 TB: a nightly job can aggregate
  * per-(day, dimension) sketches once — O(k) bytes per cell — and every
  * later query (distinct over any date range, overlap between any two
  * cohorts) is a cheap fold over stored sketches instead of a re-scan of
  * the raw corpus. Union is lossless sketch-merge; intersection uses the
  * standard theta rule (θ = min θ_a θ_b, count survivors present in both,
  * scale by 1/θ). Both are EXACT while the operand sketches are below k —
  * the oracle regime.
  *
  * Wire format: int k, then the [[KmvBuf]] payload (count + flipped hashes).
  */
object KmvWire {
  def write(b: KmvBuf): Array[Byte] = {
    val inner = b.serialize()
    val out = ByteBuffer.allocate(4 + inner.length)
    out.putInt(b.k)
    out.put(inner)
    out.array()
  }

  def read(bytes: Array[Byte]): KmvBuf = {
    val buf = ByteBuffer.wrap(bytes)
    SketchWire.need(buf, 4, "KMV", "k header")
    val k = buf.getInt
    val rest = new Array[Byte](bytes.length - 4)
    buf.get(rest)
    KmvBuf.deserialize(rest, k)
  }

  /** Normalized theta in (0, 1]: 1.0 while the sketch is below k (every
    * hash retained), else the k-th minimum hash as a fraction of 2^64. */
  def theta(b: KmvBuf): Double =
    if (b.set.size < b.k) 1.0
    else (b.set.last().longValue().toDouble - Long.MinValue.toDouble) /
      18446744073709551616.0

  /** Theta intersection estimate: survivors below min(θa, θb) present in
    * BOTH sketches, scaled by 1/θ. Exact when both operands are exact. */
  def intersectEstimate(a: KmvBuf, b: KmvBuf): Long = {
    val th = math.min(theta(a), theta(b))
    // flipped-space frontier for the shared theta
    val frontier =
      if (th >= 1.0) Long.MaxValue
      else (th * 18446744073709551616.0 + Long.MinValue.toDouble).toLong
    var common = 0L
    val it = a.set.iterator()
    var done = false
    while (!done && it.hasNext) {
      val f = it.next().longValue()
      if (f > frontier) done = true
      else if (b.set.contains(f)) common += 1L
    }
    if (th >= 1.0) common else math.rint(common / th).toLong
  }
}

/** `kmv_sketch(hash, k)` → binary: the serialized KMV theta sketch of a
  * 64-bit hash stream (feed `xxhash64(col)`; wrap in `when(cond, ...)` for
  * cohort sketches — nulls are skipped, so the filter rides the aggregate). */
case class KmvSketchAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {
  require(k >= 16, "k must be at least 16")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (hash.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
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

  override def eval(buffer: KmvBuf): Any = KmvWire.write(buffer)

  override def serialize(buffer: KmvBuf): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuf =
    KmvBuf.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(hash = newChildren.head)
}

/** `kmv_merge(sketch)` → binary: aggregate MERGE of stored sketch VALUES —
  * the rollup half of the sketch-table architecture. A nightly job stores
  * per-(day, dim) sketches with [[KmvSketchAgg]]; any coarser cube cell
  * (weekly, all-dims) is then `kmv_estimate(kmv_merge(sketch))` over the
  * stored rows — O(k) state, no raw-data re-scan, exact while the operands
  * are exact. The capacity rides in each operand's wire header; the buffer
  * adopts the first operand's k (mixed-k inputs merge at the smaller
  * effective frontier, the standard theta-sketch downgrade). */
case class KmvMergeAgg(
    sketch: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuf] {

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_merge"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    if (sketch.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a kmv_sketch binary, got " +
        sketch.dataType.simpleString)

  // k unknown until the first operand arrives: start with a 0-entry
  // sentinel that adopts the first real sketch wholesale
  override def createAggregationBuffer(): KmvBuf = new KmvBuf(16)

  private def fold(buffer: KmvBuf, other: KmvBuf): KmvBuf =
    if (buffer.set.isEmpty && buffer.k == 16 && other.k != 16) {
      other
    } else if (other.set.isEmpty && other.k == 16) {
      buffer
    } else {
      val (into, from) =
        if (buffer.k <= other.k) (buffer, other) else (other, buffer)
      into.mergeFrom(from)
      into
    }

  override def update(buffer: KmvBuf, input: InternalRow): KmvBuf = {
    val b = sketch.eval(input)
    if (b == null) buffer
    else fold(buffer, KmvWire.read(b.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: KmvBuf, other: KmvBuf): KmvBuf =
    fold(buffer, other)

  override def eval(buffer: KmvBuf): Any = KmvWire.write(buffer)

  override def serialize(buffer: KmvBuf): Array[Byte] = KmvWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): KmvBuf = KmvWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(sketch = newChildren.head)
}

/** `kmv_estimate(sketch)` → bigint distinct-count estimate. Post-aggregate
  * scalar (runs on O(groups) rows, not the stream) — CodegenFallback is
  * deliberate. */
case class KmvEstimateExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def prettyName: String = "kmv_estimate"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a kmv_sketch binary, got " + child.dataType.simpleString)
  override protected def nullSafeEval(input: Any): Any =
    KmvWire.read(input.asInstanceOf[Array[Byte]]).estimate()
  override protected def withNewChildInternal(newChild: Expression): KmvEstimateExpr =
    copy(child = newChild)
}

/** `kmv_union(a, b)` → binary: lossless sketch merge (min-k of the union
  * of survivors) — distinct-of-union when estimated. */
case class KmvUnionExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kmv_union"
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two kmv_sketch binaries")
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ba = KmvWire.read(a.asInstanceOf[Array[Byte]])
    val bb = KmvWire.read(b.asInstanceOf[Array[Byte]])
    ba.mergeFrom(bb)
    KmvWire.write(ba)
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvUnionExpr =
    copy(left = newLeft, right = newRight)
}

/** `kmv_intersect_est(a, b)` → bigint: theta-rule intersection cardinality
  * (exact when both operands are below k). */
case class KmvIntersectEstExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def prettyName: String = "kmv_intersect_est"
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two kmv_sketch binaries")
  override protected def nullSafeEval(a: Any, b: Any): Any =
    KmvWire.intersectEstimate(
      KmvWire.read(a.asInstanceOf[Array[Byte]]),
      KmvWire.read(b.asInstanceOf[Array[Byte]]))
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvIntersectEstExpr =
    copy(left = newLeft, right = newRight)
}

object KmvSetOps {
  import org.apache.spark.sql.GraftBridge
  /** Column form of the sketch aggregate. */
  def kmvSketch(hash: Column, k: Int): Column =
    GraftBridge.toCol(
      KmvSketchAgg(GraftBridge.toExpr(hash), k).toAggregateExpression())
  def kmvMerge(sketch: Column): Column =
    GraftBridge.toCol(
      KmvMergeAgg(GraftBridge.toExpr(sketch)).toAggregateExpression())
  def kmvEstimate(sketch: Column): Column =
    GraftBridge.toCol(KmvEstimateExpr(GraftBridge.toExpr(sketch)))
  def kmvUnion(a: Column, b: Column): Column =
    GraftBridge.toCol(KmvUnionExpr(GraftBridge.toExpr(a), GraftBridge.toExpr(b)))
  def kmvIntersectEst(a: Column, b: Column): Column =
    GraftBridge.toCol(
      KmvIntersectEstExpr(GraftBridge.toExpr(a), GraftBridge.toExpr(b)))
}
