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

  test("maintenance idempotence: re-folding a delivered batch leaves the " +
      "sketch bit-identical (no redelivery fence needed, unlike xor)") {
    // the cdc_distinct_maintain contract: k-min union is idempotent, so
    // an at-least-once replay of the same batch is a no-op on the view
    val k = 64
    val stored = new KmvBuf(k)
    (0L until 500L).foreach(i => stored.insert(hash(i)))
    val batch = new KmvBuf(k)
    (450L until 600L).foreach(i => batch.insert(hash(i))) // overlaps stored
    stored.mergeFrom(batch)
    val once = stored.serialize()
    val est = stored.estimate()
    stored.mergeFrom(batch) // redelivery
    assert(java.util.Arrays.equals(stored.serialize(), once),
      "replayed batch must not change the sketch state")
    assert(stored.estimate() == est)
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

  // ---- SpaceSaving heavy hitters ----

  test("spacesaving: exact below capacity, zero error") {
    val b = new graft.functions.SpaceSavingBuf(64)
    (0L until 1000L).foreach(i => b.add(i % 20))
    val top = b.topK(3)
    assert(top.toSeq == Seq((0L, 50L, 0L), (1L, 50L, 0L), (2L, 50L, 0L)))
  }

  test("spacesaving: true heavy hitter survives eviction pressure, error bounded by N/m") {
    val m = 32
    val b = new graft.functions.SpaceSavingBuf(m)
    var n = 0L
    // hot value 999 every 3rd insert, cold long-tail values once each
    (0L until 3000L).foreach { i =>
      if (i % 3 == 0) b.add(999L) else b.add(100000L + i); n += 1
    }
    val top = b.topK(1).head
    assert(top._1 == 999L, s"heavy hitter evicted: $top")
    // reported >= true count, overestimate bounded by N/m
    assert(top._2 >= 1000L && top._2 - 1000L <= n / m)
    assert(top._3 <= n / m)
  }

  test("spacesaving: merge of split streams equals single-pass in the exact regime") {
    val whole = new graft.functions.SpaceSavingBuf(256)
    val l = new graft.functions.SpaceSavingBuf(256)
    val r = new graft.functions.SpaceSavingBuf(256)
    (0L until 5000L).foreach { i =>
      val v = i % 100
      whole.add(v); if (i % 2 == 0) l.add(v) else r.add(v)
    }
    l.mergeFrom(r)
    assert(l.topK(100).toSeq == whole.topK(100).toSeq)
  }

  test("spacesaving: serialization round trip") {
    val b = new graft.functions.SpaceSavingBuf(16)
    (0L until 500L).foreach(i => b.add(i % 40)) // forces evictions
    val back = graft.functions.SpaceSavingBuf.deserialize(b.serialize(), 16)
    assert(back.topK(16).toSeq == b.topK(16).toSeq)
    assert(back.evictedFloor == b.evictedFloor)
  }

  test("spacesaving distributed: exact top-k across 8 partitions matches GROUP BY") {
    val df = spark.range(0, 30000).repartition(8)
      .select((col("id") % 300).as("v"))
    val got = df.agg(graft.functions.HeavyHittersAgg.heavyHitters(col("v"), 1024, 5).as("hh"))
      .select(explode(col("hh")).as("h"))
      .select(col("h.value"), col("h.cnt"), col("h.max_err"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.forall(_._3 == 0L))
    assert(got.map(t => (t._1, t._2)) ==
      Seq((0L, 100L), (1L, 100L), (2L, 100L), (3L, 100L), (4L, 100L)))
  }

  test("distributed estimator: 50k distinct through k=512 lands within 20%") {
    val df = spark.range(0, 50000).repartition(16).select(col("id").as("v"))
    val est = df.agg(KmvDistinctAgg.kmvDistinct(xxhash64(col("v")), 512).as("d"))
      .as[Long].head()
    assert(math.abs(est - 50000.0) / 50000.0 < 0.2, s"est $est")
  }
}
