package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KLL-style streaming quantile sketch (Karnin, Lang & Liberty, FOCS '16):
  * a ladder of buffers where level `i` holds values of weight `2^i`. Values
  * enter at level 0; when the total footprint exceeds the ladder's capacity
  * the lowest over-full level is compacted — sorted, then every other value
  * (alternating parity per compaction, the deterministic-alternation variant
  * of the KLL coin) is promoted to level `i+1` at doubled weight and the
  * rest are discarded.
  *
  * Two regimes, same trick as [[KmvBuf]] / [[SpaceSavingBuf]]:
  *   - while total inserts ≤ level-0 capacity NO compaction ever fires, every
  *     value is present at weight 1, and any rank query is EXACT — that is
  *     the oracle gate (== the SQL order statistic at the fixture's group
  *     cardinality);
  *   - above capacity the sketch answers with rank error ~O(1/c) of n for
  *     ladder constant c, spec-pinned empirically in KllSketchSpec.
  *
  * Merge is ladder-wise concatenation followed by the same compaction rule,
  * so the aggregate is a genuine mergeable sketch: map-side partials carry
  * O(k) doubles per group per task — never the value stream.
  */
final class KllBuf(val k: Int) {
  // levels(i): values of weight 2^i; only level 0 receives raw inserts
  val levels = ArrayBuffer(new ArrayBuffer[Double]())
  var n: Long = 0L
  // compaction counter; parity chooses kept-offset (deterministic coin)
  var compactions: Long = 0L

  /** Per-level capacity: top level gets k, lower levels shrink geometrically
    * (2/3 ratio, floor 8) — the KLL memory layout. */
  private def cap(level: Int): Int = {
    val depth = levels.size - 1 - level
    math.max(8, math.ceil(k * math.pow(2.0 / 3.0, depth.toDouble)).toInt)
  }

  private def totalItems: Int = {
    var s = 0; var i = 0
    while (i < levels.size) { s += levels(i).size; i += 1 }
    s
  }

  private def totalCap: Int = {
    var s = 0; var i = 0
    while (i < levels.size) { s += cap(i); i += 1 }
    s
  }

  def insert(v: Double): Unit = {
    levels(0) += v
    n += 1L
    compress()
  }

  private def compress(): Unit = {
    while (totalItems > totalCap) {
      // compact the lowest level that is individually over its capacity;
      // if none is (merge can overfill the total while each level is under
      // its own cap), compact the fullest level
      var lvl = -1
      var i = 0
      while (lvl < 0 && i < levels.size) {
        if (levels(i).size > cap(i)) lvl = i
        i += 1
      }
      if (lvl < 0) {
        var best = 0; var bestSz = -1; var j = 0
        while (j < levels.size) {
          if (levels(j).size > bestSz) { best = j; bestSz = levels(j).size }
          j += 1
        }
        lvl = best
      }
      compact(lvl)
    }
  }

  private def compact(level: Int): Unit = {
    val buf = levels(level)
    if (buf.size < 2) {
      // can't halve a single item; push it up whole (weight doubling would
      // be wrong, so instead just grow the ladder — only reachable via
      // pathological merges, kept for safety)
      if (level + 1 >= levels.size) levels += new ArrayBuffer[Double]()
      levels(level + 1) ++= buf
      buf.clear()
      return
    }
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val offset = (compactions & 1L).toInt // deterministic alternating coin
    compactions += 1L
    if (level + 1 >= levels.size) levels += new ArrayBuffer[Double]()
    val up = levels(level + 1)
    var i = offset
    while (i < sorted.length) { up += sorted(i); i += 2 }
    buf.clear()
  }

  def mergeFrom(other: KllBuf): Unit = {
    while (levels.size < other.levels.size) levels += new ArrayBuffer[Double]()
    var i = 0
    while (i < other.levels.size) { levels(i) ++= other.levels(i); i += 1 }
    n += other.n
    compactions += other.compactions
    compress()
  }

  /** Weighted rank query: smallest value whose cumulative weight reaches
    * `ceil(q*n)` (clamped to ≥1) over the (value, 2^level) pairs. In the
    * exact regime all weights are 1 and this is precisely the SQL
    * `row_number() = ceil(q*n)` order statistic. */
  def quantiles(qs: Array[Double]): Array[Double] = {
    if (n == 0L) return qs.map(_ => Double.NaN)
    var m = 0; var i = 0
    while (i < levels.size) { m += levels(i).size; i += 1 }
    val vals = new Array[Double](m)
    val wts = new Array[Long](m)
    var p = 0; i = 0
    while (i < levels.size) {
      val w = 1L << i
      val b = levels(i)
      var j = 0
      while (j < b.size) { vals(p) = b(j); wts(p) = w; p += 1; j += 1 }
      i += 1
    }
    // sort pairs by value (indices sorted by vals)
    val idx = Array.range(0, m).sortBy(vals(_))
    val totalW = wts.sum
    qs.map { q =>
      val target = math.max(1L, math.ceil(q * totalW).toLong)
      var cum = 0L
      var r = Double.NaN
      var t = 0
      var done = false
      while (!done && t < m) {
        cum += wts(idx(t))
        if (cum >= target) { r = vals(idx(t)); done = true }
        t += 1
      }
      if (done) r else vals(idx(m - 1))
    }
  }

  def serialize(): Array[Byte] = {
    var bytes = SketchWire.HeaderBytes + 4 + 8 + 8 + 4 // hdr, k, n, compactions, numLevels
    var i = 0
    while (i < levels.size) { bytes += 4 + 8 * levels(i).size; i += 1 }
    val buf = ByteBuffer.allocate(bytes)
    SketchWire.putHeader(buf, SketchWire.KllMagic)
    buf.putInt(k); buf.putLong(n); buf.putLong(compactions)
    buf.putInt(levels.size)
    i = 0
    while (i < levels.size) {
      val b = levels(i)
      buf.putInt(b.size)
      var j = 0
      while (j < b.size) { buf.putDouble(b(j)); j += 1 }
      i += 1
    }
    buf.array()
  }
}

object KllBuf {
  def deserialize(bytes: Array[Byte]): KllBuf = {
    val buf = ByteBuffer.wrap(bytes)
    SketchWire.checkHeader(buf, SketchWire.KllMagic, "KLL")
    SketchWire.need(buf, 4 + 8 + 8 + 4, "KLL", "fixed fields")
    val k = buf.getInt
    if (k < 2 || k > (1 << 24)) SketchWire.fail("KLL", s"implausible k=$k")
    val b = new KllBuf(k)
    b.n = buf.getLong
    b.compactions = buf.getLong
    val nl = buf.getInt
    // a 64-level ladder would hold 2^64 items; anything above is corruption
    if (nl < 0 || nl > 64) SketchWire.fail("KLL", s"implausible level count $nl")
    while (b.levels.size < nl) b.levels += new ArrayBuffer[Double]()
    var i = 0
    while (i < nl) {
      SketchWire.need(buf, 4, "KLL", s"level-$i size field")
      val sz = buf.getInt
      SketchWire.need(buf, 8L * sz, "KLL", s"level-$i payload ($sz values)")
      val lvl = b.levels(i)
      var j = 0
      while (j < sz) { lvl += buf.getDouble; j += 1 }
      i += 1
    }
    b
  }
}

/** `kll_quantiles(value, k, [q...])` → array<double> of the requested
  * quantiles, one mergeable O(k) sketch per group.
  *
  * Why this exists next to `percentile_approx` (which Spark also ships):
  * the KLL ladder is EXACT below its level-0 capacity and therefore
  * oracle-gateable against the SQL order statistic, while staying a true
  * sub-linear mergeable sketch above it — the same two-regime design as
  * [[KmvDistinctAgg]] and [[HeavyHittersAgg]]. At 100 TB the shuffle moves
  * one ≤O(k)-double ladder per group per map task, never the values.
  */
case class KllQuantileAgg(
    value: Expression,
    k: Int,
    qs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {
  require(k >= 16, "k must be at least 16")
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantiles must be in [0, 1]")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (value.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got " + value.dataType.simpleString)

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)

  override def update(buffer: KllBuf, input: InternalRow): KllBuf = {
    val v = value.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllBuf, other: KllBuf): KllBuf = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: KllBuf): Any =
    new GenericArrayData(buffer.quantiles(qs.toArray))

  override def serialize(buffer: KllBuf): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): KllBuf =
    KllBuf.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllQuantileAgg =
    copy(value = newChildren.head)
}

object KllQuantileAgg {
  /** Column form: `kllQuantiles(col.cast("double"), 4096, Seq(0.5, 0.9))`. */
  def kllQuantiles(value: Column, k: Int, qs: Seq[Double]): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(
      KllQuantileAgg(GraftBridge.toExpr(value), k, qs).toAggregateExpression())
  }
}

/** `kll_sketch(value, k)` → binary: the serialized KLL ladder as a VALUE —
  * the quantile member of the sketch-table architecture (store per-cell
  * ladders once, answer any coarser cell's percentiles with [[KllMergeAgg]]
  * + [[KllQuantilesExpr]], no raw re-scan). */
case class KllSketchAgg(
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {
  require(k >= 16, "k must be at least 16")

  override def children: Seq[Expression] = Seq(value)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (value.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a double input, got " + value.dataType.simpleString)

  override def createAggregationBuffer(): KllBuf = new KllBuf(k)
  override def update(buffer: KllBuf, input: InternalRow): KllBuf = {
    val v = value.eval(input)
    if (v != null) buffer.insert(v.asInstanceOf[Double])
    buffer
  }
  override def merge(buffer: KllBuf, other: KllBuf): KllBuf = {
    buffer.mergeFrom(other); buffer
  }
  override def eval(buffer: KllBuf): Any = buffer.serialize()
  override def serialize(buffer: KllBuf): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuf = KllBuf.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(value = newChildren.head)
}

/** `kll_merge(sketch)` → binary: aggregate merge of stored KLL VALUES
  * (ladder-wise concatenation + compaction — exact while the combined
  * ladder stays below capacity). The buffer adopts the first operand. */
case class KllMergeAgg(
    sketch: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllBuf] {

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (sketch.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a kll_sketch binary, got " + sketch.dataType.simpleString)

  override def createAggregationBuffer(): KllBuf = new KllBuf(16)

  private def fold(buffer: KllBuf, other: KllBuf): KllBuf =
    if (buffer.n == 0L && buffer.k == 16 && other.k != 16) other
    else if (other.n == 0L && other.k == 16) buffer
    else {
      val (into, from) =
        if (buffer.k >= other.k) (buffer, other) else (other, buffer)
      into.mergeFrom(from)
      into
    }

  override def update(buffer: KllBuf, input: InternalRow): KllBuf = {
    val b = sketch.eval(input)
    if (b == null) buffer
    else fold(buffer, KllBuf.deserialize(b.asInstanceOf[Array[Byte]]))
  }
  override def merge(buffer: KllBuf, other: KllBuf): KllBuf = fold(buffer, other)
  override def eval(buffer: KllBuf): Any = buffer.serialize()
  override def serialize(buffer: KllBuf): Array[Byte] = buffer.serialize()
  override def deserialize(bytes: Array[Byte]): KllBuf = KllBuf.deserialize(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(sketch = newChildren.head)
}

/** `kll_quantiles_of(sketch, [q...])` → array<double>: quantile report of
  * a stored ladder value. Post-aggregate scalar, CodegenFallback. */
case class KllQuantilesExpr(child: Expression, qs: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
    "quantiles must be in [0, 1]")

  override def prettyName: String = "kll_quantiles_of"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a kll_sketch binary")
  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      KllBuf.deserialize(input.asInstanceOf[Array[Byte]]).quantiles(qs.toArray))
  override protected def withNewChildInternal(newChild: Expression): KllQuantilesExpr =
    copy(child = newChild)
}

object KllSketchOps {
  import org.apache.spark.sql.GraftBridge
  def kllSketch(value: Column, k: Int): Column =
    GraftBridge.toCol(
      KllSketchAgg(GraftBridge.toExpr(value), k).toAggregateExpression())
  def kllMerge(sketch: Column): Column =
    GraftBridge.toCol(
      KllMergeAgg(GraftBridge.toExpr(sketch)).toAggregateExpression())
  def kllQuantilesOf(sketch: Column, qs: Seq[Double]): Column =
    GraftBridge.toCol(KllQuantilesExpr(GraftBridge.toExpr(sketch), qs))
}
