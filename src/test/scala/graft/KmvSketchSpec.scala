package graft

import org.apache.spark.sql.functions._
import graft.functions.{KmvBuf, KmvDistinctAgg}

/** KMV theta sketch ([[graft.functions.KmvDistinctAgg]]): exactness below
  * k, estimator error above k, unsigned hash ordering, merge ≡ single-pass,
  * and the distributed path (merge across shuffle partials) against
  * Spark's own count_distinct. */
class KmvSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def hash(x: Long): Long =
    // any well-mixed 64-bit hash works for the pure-buffer tests;
    // splitmix64 finalizer keeps them independent of Spark
    { var z = x + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31) }

  test("exact below k: estimate equals the true distinct count, duplicates free") {
    val b = new KmvBuf(1024)
    (0L until 500L).foreach(i => b.insert(hash(i)))
    (0L until 500L).foreach(i => b.insert(hash(i))) // duplicates
    assert(b.estimate() == 500L)
  }

  test("estimator above k: relative error within 4/sqrt(k) for 100k distinct") {
    val k = 1024
    val b = new KmvBuf(k)
    val n = 100000L
    (0L until n).foreach(i => b.insert(hash(i)))
    val est = b.estimate().toDouble
    val relErr = math.abs(est - n) / n
    assert(relErr < 4.0 / math.sqrt(k.toDouble),
      s"estimate $est for true $n: relErr $relErr")
  }

  test("unsigned ordering: negative (high-bit) hashes rank above positive ones") {
    val b = new KmvBuf(16)
    // 20 positive smalls then negatives — negatives are LARGE unsigned, so
    // the k minima must all be the positive values
    (1L to 20L).foreach(b.insert)
    (1L to 20L).foreach(i => b.insert(-i))
    assert(b.estimate() >= 16) // saturated
    assert(b.set.first().longValue() == (1L ^ Long.MinValue))
    assert(b.set.last().longValue() == (16L ^ Long.MinValue))
  }

  test("merge of split streams equals the single-pass sketch") {
    val k = 256
    val whole = new KmvBuf(k)
    val left = new KmvBuf(k)
    val right = new KmvBuf(k)
    (0L until 5000L).foreach { i =>
      whole.insert(hash(i))
      if (i % 2 == 0) left.insert(hash(i)) else right.insert(hash(i))
    }
    left.mergeFrom(right)
    assert(left.set.equals(whole.set))
    assert(left.estimate() == whole.estimate())
  }

  test("serialization round trip preserves the sketch") {
    val b = new KmvBuf(128)
    (0L until 1000L).foreach(i => b.insert(hash(i)))
    val back = KmvBuf.deserialize(b.serialize(), 128)
    assert(back.set.equals(b.set) && back.estimate() == b.estimate())
  }

  test("distributed: sketch across 8 shuffle partitions matches count_distinct exactly below k") {
    val df = spark.range(0, 20000).repartition(8)
      .select((col("id") % 3000).as("v"), (col("id") % 4).as("g"))
    val got = df.groupBy("g")
      .agg(KmvDistinctAgg.kmvDistinct(xxhash64(col("v")), 4096).as("d"))
      .as[(Long, Long)].collect().toMap
    val want = df.groupBy("g").agg(count_distinct(col("v")).as("d"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("distributed estimator: 50k distinct through k=512 lands within 20%") {
    val df = spark.range(0, 50000).repartition(16).select(col("id").as("v"))
    val est = df.agg(KmvDistinctAgg.kmvDistinct(xxhash64(col("v")), 512).as("d"))
      .as[Long].head()
    assert(math.abs(est - 50000.0) / 50000.0 < 0.2, s"est $est")
  }
}
