package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** SpaceSaving heavy-hitters buffer (Metwally, Agrawal & El Abbadi,
  * ICDT '05): at most `m` (value → count, maxErr) counters. While fewer
  * than m distinct values have been seen the counts are EXACT (maxErr 0);
  * once full, a new value evicts the minimum counter and inherits its
  * count as overestimation error — any value with true frequency
  * > N/m is guaranteed present, and every reported count overestimates
  * by at most its maxErr.
  *
  * Merge is counter-wise ([[SpaceSavingBuf.mergeFrom]]): each entry of
  * the other sketch re-inserts with its count and error, evicting at the
  * current minimum when full. In the exact regime (global distinct ≤ m)
  * merge introduces no error and no eviction, which is what makes the
  * aggregate oracle-gateable against exact GROUP BY counts. */
final class SpaceSavingBuf(val m: Int) {
  val counts = new java.util.HashMap[Long, Long]()
  val errs = new java.util.HashMap[Long, Long]()
  // Stream-Summary style bucket index: count → keys at that count, so the
  // eviction victim (min count, largest key deterministic tie-break) is
  // O(log m) instead of an O(m) scan per eviction — the difference between
  // ~m·N and N·log m once the stream's distinct count exceeds m (measured:
  // the scan form cost 20 s on 1M rows / 15k distinct at m=8192; this
  // form 1.3 s).
  private val buckets = new java.util.TreeMap[Long, java.util.TreeSet[java.lang.Long]]()
  // largest count ever evicted (0 while exact); new entries start from it
  var evictedFloor: Long = 0L

  private def bucketAdd(c: Long, k: Long): Unit = {
    var s = buckets.get(c)
    if (s == null) { s = new java.util.TreeSet[java.lang.Long](); buckets.put(c, s): Unit }
    s.add(k): Unit
  }

  private def bucketRemove(c: Long, k: Long): Unit = {
    val s = buckets.get(c)
    if (s != null) {
      s.remove(k)
      if (s.isEmpty) { buckets.remove(c): Unit }
    }
  }

  def add(v: Long, by: Long = 1L, err: Long = 0L): Unit = {
    if (counts.containsKey(v)) {
      val c = counts.get(v)
      bucketRemove(c, v)
      counts.put(v, c + by)
      bucketAdd(c + by, v)
      if (err > 0) errs.put(v, errs.getOrDefault(v, 0L) + err)
      ()
    } else if (counts.size < m) {
      counts.put(v, evictedFloor + by)
      bucketAdd(evictedFloor + by, v)
      val e = evictedFloor + err
      if (e > 0) errs.put(v, e)
      ()
    } else {
      val minC = buckets.firstKey()
      val mk = buckets.get(minC).last().longValue() // largest key among minima
      bucketRemove(minC, mk)
      counts.remove(mk); errs.remove(mk)
      evictedFloor = math.max(evictedFloor, minC)
      counts.put(v, minC + by)
      bucketAdd(minC + by, v)
      errs.put(v, minC + err)
      ()
    }
  }

  private[functions] def restoreBucket(c: Long, k: Long): Unit = bucketAdd(c, k)

  /** Counter-wise merge: every entry of `other` feeds [[add]] with its
    * count and accumulated error, so the size-≤m invariant holds
    * throughout (add evicts at the current minimum when full — no
    * post-hoc trim exists or is needed). Below global capacity
    * (distinct ≤ m) the merge is exact and order-free — the oracle
    * regime; above it, which survivors the evictions keep depends on
    * entry order (inherent to parallel SpaceSaving merging), while the
    * overestimate bound count ≤ true + maxErr is order-independent. */
  def mergeFrom(other: SpaceSavingBuf): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      add(e.getKey, e.getValue, other.errs.getOrDefault(e.getKey, 0L))
    }
    evictedFloor = math.max(evictedFloor, other.evictedFloor)
  }

  /** Top-k by (count desc, value asc): (value, count, maxErr) triples. */
  def topK(k: Int): Array[(Long, Long, Long)] = {
    val arr = new Array[(Long, Long, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue, errs.getOrDefault(e.getKey, 0L)); i += 1
    }
    arr.sortBy { case (v, c, _) => (-c, v) }.take(k)
  }

  def serialize(): Array[Byte] = {
    val n = counts.size
    val buf = ByteBuffer.allocate(SketchWire.HeaderBytes + 8 + 4 + 24 * n)
    SketchWire.putHeader(buf, SketchWire.SsvMagic)
    buf.putLong(evictedFloor)
    buf.putInt(n)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      buf.putLong(e.getKey); buf.putLong(e.getValue)
      buf.putLong(errs.getOrDefault(e.getKey, 0L))
    }
    buf.array()
  }
}

object SpaceSavingBuf {
  def deserialize(bytes: Array[Byte], m: Int): SpaceSavingBuf = {
    if (m <= 0) SketchWire.fail("SpaceSaving", s"implausible m=$m")
    val buf = ByteBuffer.wrap(bytes)
    SketchWire.checkHeader(buf, SketchWire.SsvMagic, "SpaceSaving")
    SketchWire.need(buf, 8 + 4, "SpaceSaving", "fixed fields")
    val b = new SpaceSavingBuf(m)
    b.evictedFloor = buf.getLong
    val n = buf.getInt
    SketchWire.need(buf, 24L * n, "SpaceSaving", s"counter payload ($n counters)")
    var i = 0
    while (i < n) {
      val k = buf.getLong; val c = buf.getLong; val e = buf.getLong
      b.counts.put(k, c)
      b.restoreBucket(c, k)
      if (e > 0) b.errs.put(k, e)
      i += 1
    }
    b
  }
}

/** `heavy_hitters(value, m, k)` → `array<struct<value: bigint, cnt:
  * bigint, max_err: bigint>>` — the top-k most frequent values by the
  * SpaceSaving sketch with m counters. EXACT (max_err 0) while distinct ≤
  * m — the oracle-gateable regime — and the classic ε = N/m overestimate
  * above; mergeable O(m) state, so the shuffle carries ≤m counters per
  * group per map task regardless of stream size. Complements
  * [[KmvDistinctAgg]] (distinct count) on the frequency side. */
/** Wire form of a SpaceSaving sketch VALUE: int m header + the buffer
  * payload — the heavy-hitters half of the sketch-table architecture
  * (store per-(day, dim) sketches, roll up any coarser cell with
  * [[HhMergeAgg]] + [[HhTopKExpr]], no raw re-scan). Exact while the
  * global distinct count stays ≤ m, same two-regime contract as the
  * aggregate itself. */
object HhWire {
  def write(b: SpaceSavingBuf): Array[Byte] = {
    val inner = b.serialize()
    val out = java.nio.ByteBuffer.allocate(4 + inner.length)
    out.putInt(b.m)
    out.put(inner)
    out.array()
  }

  def read(bytes: Array[Byte]): SpaceSavingBuf = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    SketchWire.need(buf, 4, "SpaceSaving", "m header")
    val m = buf.getInt
    val rest = new Array[Byte](bytes.length - 4)
    buf.get(rest)
    SpaceSavingBuf.deserialize(rest, m)
  }
}

/** `hh_sketch(value, m)` → binary: serialized SpaceSaving sketch of a
  * bigint stream (cohort filters via null-skipping conditional input). */
case class HhSketchAgg(
    value: Expression,
    m: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] {
  require(m >= 16, "m must be at least 16")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def prettyName: String = "hh_sketch"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (value.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got " + value.dataType.simpleString)

  override def createAggregationBuffer(): SpaceSavingBuf = new SpaceSavingBuf(m)

  override def update(buffer: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val v = value.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: SpaceSavingBuf, other: SpaceSavingBuf): SpaceSavingBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuf): Any = HhWire.write(buffer)

  override def serialize(buffer: SpaceSavingBuf): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf =
    SpaceSavingBuf.deserialize(bytes, m)

  override def withNewMutableAggBufferOffset(newOffset: Int): HhSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HhSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HhSketchAgg =
    copy(value = newChildren.head)
}

/** `hh_merge(sketch)` → binary: aggregate merge of stored SpaceSaving
  * sketch VALUES (counter-wise, the exact-regime-preserving rule). The
  * buffer adopts the first operand's m. */
case class HhMergeAgg(
    sketch: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] {

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def prettyName: String = "hh_merge"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (sketch.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an hh_sketch binary, got " + sketch.dataType.simpleString)

  override def createAggregationBuffer(): SpaceSavingBuf = new SpaceSavingBuf(16)

  private def fold(buffer: SpaceSavingBuf, other: SpaceSavingBuf): SpaceSavingBuf =
    if (buffer.counts.isEmpty && buffer.m == 16 && other.m != 16) other
    else if (other.counts.isEmpty && other.m == 16) buffer
    else {
      val (into, from) =
        if (buffer.m <= other.m) (buffer, other) else (other, buffer)
      into.mergeFrom(from)
      into
    }

  override def update(buffer: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val b = sketch.eval(input)
    if (b == null) buffer
    else fold(buffer, HhWire.read(b.asInstanceOf[Array[Byte]]))
  }

  override def merge(buffer: SpaceSavingBuf, other: SpaceSavingBuf): SpaceSavingBuf =
    fold(buffer, other)

  override def eval(buffer: SpaceSavingBuf): Any = HhWire.write(buffer)

  override def serialize(buffer: SpaceSavingBuf): Array[Byte] = HhWire.write(buffer)
  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf = HhWire.read(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HhMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HhMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HhMergeAgg =
    copy(sketch = newChildren.head)
}

/** `hh_topk(sketch, k)` → array<struct<value, cnt, maxerr>>: the top-k
  * frequency report of a stored sketch value (count desc, value asc —
  * deterministic). Post-aggregate scalar, CodegenFallback by design. */
case class HhTopKExpr(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1, "k must be >= 1")

  override def prettyName: String = "hh_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", LongType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("maxerr", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an hh_sketch binary")

  override protected def nullSafeEval(input: Any): Any = {
    val b = HhWire.read(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(b.topK(k).map { case (v, c, e) =>
      org.apache.spark.sql.catalyst.InternalRow(v, c, e)
    }.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): HhTopKExpr =
    copy(child = newChild)
}

case class HeavyHittersAgg(
    value: Expression,
    m: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpaceSavingBuf] {
  require(m >= 8 && k >= 1 && k <= m, "need m >= 8 and 1 <= k <= m")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"
  override def dataType: DataType = ArrayType(
    new StructType().add("value", LongType, nullable = false)
      .add("cnt", LongType, nullable = false)
      .add("max_err", LongType, nullable = false),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (value.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint value, got ${value.dataType.simpleString}")

  override def createAggregationBuffer(): SpaceSavingBuf = new SpaceSavingBuf(m)

  override def update(buffer: SpaceSavingBuf, input: InternalRow): SpaceSavingBuf = {
    val v = value.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: SpaceSavingBuf, other: SpaceSavingBuf): SpaceSavingBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: SpaceSavingBuf): Any =
    new GenericArrayData(buffer.topK(k).map { case (v, c, e) => InternalRow(v, c, e) })

  override def serialize(buffer: SpaceSavingBuf): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuf =
    SpaceSavingBuf.deserialize(bytes, m)

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HeavyHittersAgg =
    copy(value = newChildren.head)
}

object HeavyHittersAgg {
  def heavyHitters(value: Column, m: Int, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(HeavyHittersAgg(GraftBridge.toExpr(value), m, k).toAggregateExpression())
  }
}

object HhSketchOps {
  import org.apache.spark.sql.GraftBridge
  def hhSketch(value: Column, m: Int): Column =
    GraftBridge.toCol(
      HhSketchAgg(GraftBridge.toExpr(value), m).toAggregateExpression())
  def hhMerge(sketch: Column): Column =
    GraftBridge.toCol(
      HhMergeAgg(GraftBridge.toExpr(sketch)).toAggregateExpression())
  def hhTopK(sketch: Column, k: Int): Column =
    GraftBridge.toCol(HhTopKExpr(GraftBridge.toExpr(sketch), k))
}
