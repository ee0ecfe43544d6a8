package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer over (score: double, id: long) pairs, ordered best =
  * (score desc, id asc). Holds at most k entries at every moment — the point
  * of the whole construction: a `row_number() over (partition by q order by
  * score)` window must ship and fully sort EVERY candidate row of a query on
  * one task, while this aggregate's partial (map-side) phase already reduces
  * each input partition to ≤ k entries per group, so the shuffle carries
  * k·partitions rows and the merge phase is a k-list merge. The binary-heap
  * eviction makes updates O(log k) with zero allocation per row.
  */
final class TopKPairs(val k: Int) {
  // min-heap keyed worst-first: heap head is the entry to evict — the
  // LOWEST score, ties broken toward the LARGER id (since ties prefer
  // smaller ids, the larger id is the worse entry)
  private var scores = new Array[Double](math.min(k, 16))
  private var ids = new Array[Long](math.min(k, 16))
  private var n = 0

  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def siftUp(pos0: Int): Unit = {
    var pos = pos0
    while (pos > 0) {
      val parent = (pos - 1) >> 1
      if (worse(scores(pos), ids(pos), scores(parent), ids(parent))) {
        val ts = scores(pos); val ti = ids(pos)
        scores(pos) = scores(parent); ids(pos) = ids(parent)
        scores(parent) = ts; ids(parent) = ti
        pos = parent
      } else return
    }
  }

  private def siftDown(): Unit = {
    var pos = 0
    while (true) {
      val l = 2 * pos + 1; val r = l + 1
      var worst = pos
      if (l < n && worse(scores(l), ids(l), scores(worst), ids(worst))) worst = l
      if (r < n && worse(scores(r), ids(r), scores(worst), ids(worst))) worst = r
      if (worst == pos) return
      val ts = scores(pos); val ti = ids(pos)
      scores(pos) = scores(worst); ids(pos) = ids(worst)
      scores(worst) = ts; ids(worst) = ti
      pos = worst
    }
  }

  def insert(score: Double, id: Long): Unit = {
    if (n < k) {
      if (n == scores.length) {
        val cap = math.min(k, scores.length * 2)
        scores = java.util.Arrays.copyOf(scores, cap)
        ids = java.util.Arrays.copyOf(ids, cap)
      }
      scores(n) = score; ids(n) = id; n += 1
      siftUp(n - 1)
    } else if (k > 0 && worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      siftDown()
    }
  }

  def mergeFrom(other: TopKPairs): Unit = {
    var i = 0
    while (i < other.n) { insert(other.scores(i), other.ids(i)); i += 1 }
  }

  /** Entries best-first: (score desc, id asc). */
  def sortedBestFirst(): Array[(Double, Long)] = {
    val out = new Array[(Double, Long)](n)
    var i = 0
    while (i < n) { out(i) = (scores(i), ids(i)); i += 1 }
    out.sortBy { case (s, i) => (-s, i) }
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + 16 * n)
    val out = new DataOutputStream(bos)
    out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(scores(i)); out.writeLong(ids(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }
}

object TopKPairs {
  def deserialize(bytes: Array[Byte], k: Int): TopKPairs = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getInt
    val b = new TopKPairs(k)
    var i = 0
    while (i < n) { b.insert(buf.getDouble, buf.getLong); i += 1 }
    b
  }
}

/** Partial top-k aggregate: `top_k_by_score(score, id, k)` →
  * `array<struct<id: long, score: double>>` sorted (score desc, id asc),
  * capped at k. The scale-correct replacement for per-group
  * `row_number()`-window shortlists: the window sorts a query's ENTIRE
  * candidate set on one task (no map-side reduction — the r4 IVFADC bench
  * profile was two such sorts back to back), whereas this aggregate's
  * partial phase bounds every map task's output at k entries per group and
  * the final phase merges k-lists. Deterministic: ties break toward the
  * smaller id, the same (score desc, id asc) total order the windows used.
  * Null scores/ids are skipped (a null cosine — corrupt embedding — must
  * not rank). */
case class TopKByScoreAgg(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKPairs] {
  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"
  override def dataType: DataType = ArrayType(
    new StructType().add("id", LongType, nullable = false)
      .add("score", DoubleType, nullable = false),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) inputs, got " +
        s"${score.dataType.simpleString}, ${id.dataType.simpleString}")

  override def createAggregationBuffer(): TopKPairs = new TopKPairs(k)

  override def update(buffer: TopKPairs, input: InternalRow): TopKPairs = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buffer.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    buffer
  }

  override def merge(buffer: TopKPairs, other: TopKPairs): TopKPairs = {
    buffer.mergeFrom(other)
    buffer
  }

  override def eval(buffer: TopKPairs): Any =
    new GenericArrayData(buffer.sortedBestFirst().map {
      case (s, i) => InternalRow(i, s)
    })

  override def serialize(buffer: TopKPairs): Array[Byte] = buffer.serialize()

  override def deserialize(bytes: Array[Byte]): TopKPairs =
    TopKPairs.deserialize(bytes, k)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScoreAgg =
    copy(score = newChildren(0), id = newChildren(1))
}
