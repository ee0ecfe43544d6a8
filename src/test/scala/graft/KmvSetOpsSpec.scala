package graft

import org.apache.spark.sql.functions._
import graft.functions.{KmvBuf, KmvSetOps, KmvWire}

/** Sketch-as-column theta set operations ([[graft.functions.KmvSetOps]]):
  * exactness below k, theta-rule accuracy above, wire round-trip, and the
  * SQL surface. */
class KmvSetOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def hash(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def buf(k: Int, xs: Range): KmvBuf = {
    val b = new KmvBuf(k)
    xs.foreach(i => b.insert(hash(i.toLong)))
    b
  }

  test("exact regime: union and intersection are the true cardinalities") {
    val a = buf(4096, 0 until 1000)      // {0..999}
    val b = buf(4096, 500 until 1800)    // {500..1799}
    assert(KmvWire.intersectEstimate(a, b) == 500L)
    val u = KmvWire.read(KmvWire.write(a))
    u.mergeFrom(b)
    assert(u.estimate() == 1800L)
  }

  test("disjoint and empty operands") {
    val a = buf(1024, 0 until 100)
    val b = buf(1024, 1000 until 1100)
    assert(KmvWire.intersectEstimate(a, b) == 0L)
    val e = new KmvBuf(1024)
    assert(KmvWire.intersectEstimate(a, e) == 0L)
    assert(KmvWire.intersectEstimate(e, e) == 0L)
  }

  test("theta regime: intersection estimate within 10% for 50% overlap at k=4096") {
    val n = 100000
    val a = buf(4096, 0 until n)
    val b = buf(4096, n / 2 until n + n / 2)
    val est = KmvWire.intersectEstimate(a, b).toDouble
    val truth = (n / 2).toDouble
    assert(math.abs(est - truth) / truth < 0.10,
      s"intersect est $est vs $truth")
  }

  test("wire round-trip preserves k and survivors") {
    val a = buf(256, 0 until 5000) // saturated
    val back = KmvWire.read(KmvWire.write(a))
    assert(back.k == 256 && back.set.equals(a.set))
  }

  test("distributed: cohort sketches via conditional input match exact sets") {
    import KmvSetOps._
    val df = (1 to 2000).map { i =>
      (i % 700, if (i % 3 == 0) "x" else "y")
    }.toDF("uid", "tag").repartition(8)
    val r = df.agg(
        kmvSketch(when(col("tag") === "x", xxhash64(col("uid"))), 8192).as("sa"),
        kmvSketch(when(col("tag") === "y", xxhash64(col("uid"))), 8192).as("sb"))
      .select(
        kmvEstimate(col("sa")).as("na"),
        kmvEstimate(col("sb")).as("nb"),
        kmvEstimate(kmvUnion(col("sa"), col("sb"))).as("nu"),
        kmvIntersectEst(col("sa"), col("sb")).as("ni"))
      .collect()(0)
    val xs = (1 to 2000).filter(_ % 3 == 0).map(_ % 700).toSet
    val ys = (1 to 2000).filterNot(_ % 3 == 0).map(_ % 700).toSet
    assert(r.getLong(0) == xs.size.toLong)
    assert(r.getLong(1) == ys.size.toLong)
    assert(r.getLong(2) == (xs ++ ys).size.toLong)
    assert(r.getLong(3) == xs.intersect(ys).size.toLong)
  }

  test("kmv_merge rolls up stored sketch values; exact below k") {
    import KmvSetOps._
    val df = (1 to 3000).map(i => (i % 5, s"d${i % 7}", i % 900))
      .toDF("tpe", "day", "uid").repartition(8)
    val daily = df.groupBy("tpe", "day")
      .agg(kmvSketch(xxhash64(col("uid")), 4096).as("sk"))
    val got = daily.groupBy("tpe")
      .agg(kmvEstimate(kmvMerge(col("sk"))).as("n"))
      .as[(Int, Long)].collect().toMap
    val want = df.groupBy("tpe").agg(countDistinct("uid").as("n"))
      .as[(Int, Long)].collect().toMap
    assert(got == want)
  }

  test("kmv_merge with mixed capacities downgrades to the smaller k") {
    val big = buf(4096, 0 until 3000)
    val small = buf(256, 2000 until 2600) // saturated at 256
    val rows = Seq(KmvWire.write(big), KmvWire.write(small)).toDF("sk")
    val merged = rows.agg(
        org.apache.spark.sql.GraftBridge.toCol(
          graft.functions.KmvMergeAgg(
            org.apache.spark.sql.GraftBridge.toExpr(col("sk")))
            .toAggregateExpression()).as("m"))
      .select(col("m")).collect()(0).getAs[Array[Byte]](0)
    val back = KmvWire.read(merged)
    assert(back.k == 256 && back.set.size == 256)
    // estimator still lands near the truth (3600 distinct)
    val est = back.estimate().toDouble
    assert(math.abs(est - 3600.0) / 3600.0 < 0.3, s"est $est")
  }

  test("hh sketch-table rollup: merged stored sketches ≡ exact top-k below m") {
    import graft.functions.HhSketchOps._
    val df = (1 to 6000).map(i => (i % 4, s"d${i % 5}", (i % 300).toLong))
      .toDF("tpe", "day", "uid").repartition(8)
    val got = df.groupBy("tpe", "day")
      .agg(hhSketch(col("uid"), 4096).as("sk"))
      .groupBy("tpe").agg(hhMerge(col("sk")).as("m"))
      .select(col("tpe"), explode(hhTopK(col("m"), 5)).as("h"))
      .select(col("tpe"), col("h.value"), col("h.cnt"))
      .as[(Int, Long, Long)].collect().toSet
    val want = df.groupBy("tpe", "uid").agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("tpe")
          .orderBy(col("c").desc, col("uid"))))
      .filter(col("rk") <= 5).select("tpe", "uid", "c")
      .as[(Int, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("hh_merge above capacity keeps the guaranteed-present heavy hitter") {
    import graft.functions.{HhWire, SpaceSavingBuf}
    // two saturated m=64 sketches; value 7 holds >N/m of the merged stream
    def mk(offset: Int): SpaceSavingBuf = {
      val b = new SpaceSavingBuf(64)
      (0 until 2000).foreach(i => b.add((offset + i % 100).toLong))
      (0 until 500).foreach(_ => b.add(7L))
      b
    }
    val a = mk(100); val b = mk(300)
    val merged = HhWire.read(HhWire.write(a))
    merged.mergeFrom(HhWire.read(HhWire.write(b)))
    val top = merged.topK(5)
    assert(top.head._1 == 7L, s"heavy hitter lost: ${top.toSeq}")
    assert(top.head._2 >= 1000L) // count at least the true 1000 (overestimates allowed)
  }

  test("counter merge is NOT idempotent: re-folding a delivered batch " +
      "double-counts — the cdc_topk_maintain view REQUIRES the replay fence") {
    // the IVM-taxonomy contrast to KmvSketchSpec's idempotence pin: a
    // k-min fold tolerates at-least-once delivery, a SpaceSaving fold
    // does not (counts are additive), so the maintained top-k view must
    // sit behind K2 sink-tail dedup
    import graft.functions.{HhWire, SpaceSavingBuf}
    val stored = new SpaceSavingBuf(64)
    (0 until 10).foreach(_ => stored.add(1L))
    val batch = new SpaceSavingBuf(64)
    (0 until 5).foreach(_ => batch.add(1L))
    stored.mergeFrom(HhWire.read(HhWire.write(batch)))
    assert(stored.topK(1).head == ((1L, 15L, 0L)))
    stored.mergeFrom(HhWire.read(HhWire.write(batch))) // redelivery
    assert(stored.topK(1).head == ((1L, 20L, 0L)),
      "counter merge must visibly double-count on replay (hence the fence)")
  }

  test("SQL surface: kmv_sketch / kmv_union / kmv_intersect_est registered") {
    GraftExtensions.install(spark)
    (1 to 300).map(i => (i, i % 2)).toDF("v", "par")
      .createOrReplaceTempView("kmv_so_t")
    val r = spark.sql(
      """SELECT
           kmv_estimate(kmv_union(sa, sb)) AS nu,
           kmv_intersect_est(sa, sb) AS ni
         FROM (SELECT
           kmv_sketch(CASE WHEN par = 0 THEN xxhash64(v) END, 1024) AS sa,
           kmv_sketch(CASE WHEN par = 1 THEN xxhash64(v) END, 1024) AS sb
         FROM kmv_so_t)""").collect()(0)
    assert(r.getLong(0) == 300L && r.getLong(1) == 0L)
  }
}
