package graft

import org.apache.spark.sql.functions._
import graft.functions.{KllBuf, KllQuantileAgg}

/** KLL quantile ladder ([[graft.functions.KllQuantileAgg]]): exactness
  * below level-0 capacity, bounded rank error in the compacting regime,
  * merge ≡ single-pass in the exact regime, the distributed path against
  * an exact SQL order statistic, and the SQL registration. */
class KllSketchSpec extends SparkTestBase {
  import spark.implicits._

  private def rankOf(sorted: Array[Double], v: Double): Int = {
    // number of elements <= v (rank of the returned quantile value)
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  test("exact below capacity: quantiles are the ceil(q*n) order statistics") {
    val b = new KllBuf(1024)
    val vals = (1 to 1000).map(i => (i * 37 % 1000).toDouble)
    vals.foreach(b.insert)
    val sorted = vals.sorted.toArray
    val qs = Array(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    val got = b.quantiles(qs)
    qs.zip(got).foreach { case (q, v) =>
      val target = math.max(1, math.ceil(q * 1000).toInt)
      assert(v == sorted(target - 1), s"q=$q got $v want ${sorted(target - 1)}")
    }
  }

  test("duplicates and unsorted inserts preserve exactness") {
    val b = new KllBuf(512)
    val vals = Seq(5.0, 1.0, 3.0, 3.0, 2.0, 5.0, 4.0)
    vals.foreach(b.insert)
    // n=7: p50 -> rank ceil(3.5)=4 -> sorted(3)=3.0; p100 -> 5.0
    assert(b.quantiles(Array(0.5))(0) == 3.0)
    assert(b.quantiles(Array(1.0))(0) == 5.0)
  }

  test("compacting regime: rank error under 2% of n for 100k values at k=1024") {
    val k = 1024
    val b = new KllBuf(k)
    val n = 100000
    // deterministic well-mixed permutation of 0..n-1
    val vals = (0 until n).map(i => ((i.toLong * 48271L) % n.toLong).toDouble)
    vals.foreach(b.insert)
    val sorted = vals.sorted.toArray
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val got = b.quantiles(Array(q))(0)
      val trueRank = math.max(1, math.ceil(q * n).toInt)
      val gotRank = rankOf(sorted, got)
      val err = math.abs(gotRank - trueRank).toDouble / n
      assert(err < 0.02, s"q=$q rank err $err (got $gotRank want ~$trueRank)")
    }
  }

  test("merge of split streams is exact while total stays below capacity") {
    val b1 = new KllBuf(2048)
    val b2 = new KllBuf(2048)
    val all = (1 to 1500).map(i => (i * 101 % 1500).toDouble)
    val (l, r) = all.splitAt(700)
    l.foreach(b1.insert)
    r.foreach(b2.insert)
    b1.mergeFrom(b2)
    val sorted = all.sorted.toArray
    for (q <- Seq(0.5, 0.9)) {
      val target = math.max(1, math.ceil(q * all.size).toInt)
      assert(b1.quantiles(Array(q))(0) == sorted(target - 1))
    }
  }

  test("merged compacting sketches stay within the rank bound") {
    val k = 1024
    val parts = (0 until 4).map { p =>
      val b = new KllBuf(k)
      (0 until 50000).foreach { i =>
        b.insert((((p * 50000 + i).toLong * 48271L) % 200000L).toDouble)
      }
      b
    }
    val merged = parts.head
    parts.tail.foreach(merged.mergeFrom)
    assert(merged.n == 200000L)
    val sorted = (0 until 200000).map(i =>
      ((i.toLong * 48271L) % 200000L).toDouble).sorted.toArray
    for (q <- Seq(0.5, 0.99)) {
      val got = merged.quantiles(Array(q))(0)
      val trueRank = math.max(1, math.ceil(q * 200000).toInt)
      val err = math.abs(rankOf(sorted, got) - trueRank).toDouble / 200000
      assert(err < 0.03, s"q=$q rank err $err")
    }
  }

  test("serialize round-trip preserves the ladder") {
    val b = new KllBuf(256)
    (0 until 5000).foreach(i => b.insert(((i * 7919) % 5000).toDouble))
    val back = KllBuf.deserialize(b.serialize())
    assert(back.n == b.n)
    assert(back.quantiles(Array(0.3, 0.7)).toSeq ==
      b.quantiles(Array(0.3, 0.7)).toSeq)
  }

  test("distributed aggregate matches the exact order statistic per group") {
    val df = (1 to 3000).map { i =>
      (if (i % 3 == 0) "a" else "b", ((i * 37) % 997).toDouble)
    }.toDF("g", "v").repartition(8)
    val got = df.groupBy("g")
      .agg(KllQuantileAgg.kllQuantiles(col("v"), 4096, Seq(0.5, 0.9)).as("qs"))
      .select(col("g"), col("qs")(0).as("p50"), col("qs")(1).as("p90"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val want = df.collect().groupBy(_.getString(0)).map { case (g, rows) =>
      val sorted = rows.map(_.getDouble(1)).sorted
      def at(q: Double) = sorted(math.max(1, math.ceil(q * sorted.length).toInt) - 1)
      g -> (at(0.5), at(0.9))
    }
    assert(got == want)
  }

  test("kll sketch-table rollup: merged stored ladders ≡ exact order statistics") {
    import graft.functions.KllSketchOps._
    val df = (1 to 3000).map(i => (i % 4, s"d${i % 7}", ((i * 37) % 997).toDouble))
      .toDF("tpe", "day", "v").repartition(8)
    val got = df.groupBy("tpe", "day")
      .agg(kllSketch(col("v"), 4096).as("sk"))
      .groupBy("tpe").agg(kllMerge(col("sk")).as("m"))
      .select(col("tpe"), kllQuantilesOf(col("m"), Seq(0.5))(0).as("p50"))
      .as[(Int, Double)].collect().toMap
    val want = df.collect().groupBy(_.getInt(0)).map { case (t, rows) =>
      val sorted = rows.map(_.getDouble(2)).sorted
      t -> sorted(math.max(1, math.ceil(0.5 * sorted.length).toInt) - 1)
    }
    assert(got == want)
  }

  test("kll_merge above capacity stays within the rank bound; SQL surface works") {
    GraftExtensions.install(spark)
    (0 until 100000).map(i => (i % 8, ((i.toLong * 48271L) % 100000L).toDouble))
      .toDF("cell", "v").createOrReplaceTempView("kll_rt")
    val est = spark.sql(
      """SELECT kll_quantiles_of(kll_merge(sk), 0.5) AS qs FROM (
           SELECT cell, kll_sketch(v, 1024) AS sk FROM kll_rt GROUP BY cell)""")
      .collect()(0).getSeq[Double](0).head
    val sorted = (0 until 100000).map(i => ((i.toLong * 48271L) % 100000L).toDouble).sorted
    val gotRank = sorted.count(_ <= est)
    assert(math.abs(gotRank - 50000).toDouble / 100000 < 0.03,
      s"merged rank err: $gotRank")
  }

  test("SQL surface: kll_quantiles is registered and variadic") {
    GraftExtensions.install(spark)
    (1 to 100).map(i => i.toDouble).toDF("v").createOrReplaceTempView("kll_t")
    val r = spark.sql(
      "SELECT kll_quantiles(v, 256, 0.5, 1.0) AS qs FROM kll_t").collect()(0)
    assert(r.getSeq[Double](0) == Seq(50.0, 100.0))
  }

  test("nulls are ignored, empty input yields NaN") {
    val r = Seq[(String, Option[Double])]("a" -> None, "a" -> Some(2.0))
      .toDF("g", "v").groupBy("g")
      .agg(KllQuantileAgg.kllQuantiles(col("v"), 64, Seq(0.5)).as("qs"))
      .select(col("qs")(0)).collect()(0).getDouble(0)
    assert(r == 2.0)
    val empty = Seq[(String, Option[Double])]("a" -> None).toDF("g", "v")
      .groupBy("g")
      .agg(KllQuantileAgg.kllQuantiles(col("v"), 64, Seq(0.5)).as("qs"))
      .select(col("qs")(0)).collect()(0).getDouble(0)
    assert(empty.isNaN)
  }

  test("wire validation: garbage, truncation, and foreign-magic bytes fail loudly") {
    import graft.functions.{KmvBuf, SpaceSavingBuf}
    // arbitrary non-sketch bytes: descriptive error, not BufferUnderflow
    val garbage = Array.fill[Byte](32)(0x5a)
    val eKll = intercept[IllegalArgumentException](KllBuf.deserialize(garbage))
    assert(eKll.getMessage.contains("KLL sketch wire"))
    val eKmv = intercept[IllegalArgumentException](KmvBuf.deserialize(garbage, 64))
    assert(eKmv.getMessage.contains("KMV sketch wire"))
    val eSs = intercept[IllegalArgumentException](SpaceSavingBuf.deserialize(garbage, 8))
    assert(eSs.getMessage.contains("SpaceSaving sketch wire"))
    // too short for even a header
    intercept[IllegalArgumentException](KllBuf.deserialize(Array[Byte](1, 2, 3)))
    // a valid KMV payload is NOT a valid KLL payload (cross-family magic)
    val kmv = new KmvBuf(16); kmv.insert(42L)
    val cross = intercept[IllegalArgumentException](KllBuf.deserialize(kmv.serialize()))
    assert(cross.getMessage.contains("bad magic"))
    // truncated tail of a real sketch: length validation, not garbage values
    val b = new KllBuf(128); (1 to 50).foreach(i => b.insert(i.toDouble))
    val bytes = b.serialize()
    intercept[IllegalArgumentException](
      KllBuf.deserialize(java.util.Arrays.copyOf(bytes, bytes.length - 8)))
    // and the round-trip still holds after the header change
    assert(KllBuf.deserialize(bytes).quantiles(Array(1.0))(0) == 50.0)
  }

  test("wire legacy sniff: headerless v0 payloads read only behind the opt-in") {
    import graft.functions.{KmvBuf, SpaceSavingBuf, SketchWire}
    def stripHeader(b: Array[Byte]): Array[Byte] =
      java.util.Arrays.copyOfRange(b, SketchWire.HeaderBytes, b.length)
    val kll = new KllBuf(128); (1 to 50).foreach(i => kll.insert(i.toDouble))
    val kmv = new KmvBuf(16); Seq(7L, -3L, 42L).foreach(kmv.insert)
    val ss = new SpaceSavingBuf(8)
    (1 to 30).foreach(i => ss.add(i.toLong % 5))
    // DEFAULT is strict: a headerless body fails loud with a migration hint
    // (an arbitrary non-sketch BINARY must never yield a silent estimate)
    val strict = intercept[IllegalArgumentException](
      KllBuf.deserialize(stripHeader(kll.serialize())))
    assert(strict.getMessage.contains(SketchWire.LegacyV0Conf))
    // with the explicit migration opt-in, a pre-round-7 body (exactly
    // today's body with no header) parses identically to the framed form
    spark.conf.set(SketchWire.LegacyV0Conf, "true")
    try {
      assert(KllBuf.deserialize(stripHeader(kll.serialize()))
        .quantiles(Array(0.5))(0) == KllBuf.deserialize(kll.serialize())
        .quantiles(Array(0.5))(0))
      assert(KmvBuf.deserialize(stripHeader(kmv.serialize()), 16).estimate() ==
        KmvBuf.deserialize(kmv.serialize(), 16).estimate())
      assert(SpaceSavingBuf.deserialize(stripHeader(ss.serialize()), 8).topK(3)
        .toSeq == SpaceSavingBuf.deserialize(ss.serialize(), 8).topK(3).toSeq)
      // cross-family misuse stays a hard error even under the opt-in
      val cross = intercept[IllegalArgumentException](
        KllBuf.deserialize(kmv.serialize()))
      assert(cross.getMessage.contains("bad magic"))
    } finally spark.conf.unset(SketchWire.LegacyV0Conf)
  }
}
