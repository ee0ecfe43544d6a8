package graft

import org.apache.spark.sql.functions._
import graft.operators.TemporalJoins

/** As-of and range join semantics on hand-built edges. */
class TemporalJoinsSpec extends SparkTestBase {
  import spark.implicits._

  test("as-of join: latest build at-or-before each probe; no-prior dropped") {
    val probe = Seq((1L, "u", 100L), (2L, "u", 250L), (3L, "u", 50L), (4L, "v", 500L))
      .toDF("pid", "k", "pts")
    val build = Seq((10L, "u", 100L, "a"), (11L, "u", 200L, "b"), (12L, "w", 1L, "z"))
      .toDF("bid", "k", "bts", "payload")
    val out = TemporalJoins.asOfJoin(
        probe, col("k"), col("pts"), build, col("k"), col("bts"),
        Seq("bid" -> col("bid"), "payload" -> col("payload")))
      .select("pid", "bid", "payload").as[(Long, Long, String)].collect().toSet
    // pid 1 at ts100 sees the build at exactly 100 (>= semantics);
    // pid 2 sees the later build; pid 3 precedes all builds -> dropped;
    // pid 4's key has no builds -> dropped
    assert(out == Set((1L, 10L, "a"), (2L, 11L, "b")))
  }

  test("forward as-of: earliest build at-or-after each probe; no-later dropped") {
    val probe = Seq((1L, "u", 100L), (2L, "u", 250L), (3L, "u", 999L), (4L, "v", 5L))
      .toDF("pid", "k", "pts")
    val build = Seq((10L, "u", 100L, "a"), (11L, "u", 300L, "b"), (12L, "w", 1L, "z"))
      .toDF("bid", "k", "bts", "payload")
    val out = TemporalJoins.asOfJoinForward(
        probe, col("k"), col("pts"), build, col("k"), col("bts"),
        Seq("bid" -> col("bid"), "payload" -> col("payload")))
      .select("pid", "bid", "payload").as[(Long, Long, String)].collect().toSet
    // pid 1 at ts100 sees the build at exactly 100 (<= semantics, tie
    // visible); pid 2 sees the NEXT build at 300, not the earlier one;
    // pid 3 has no later build -> dropped; pid 4's key has no builds
    assert(out == Set((1L, 10L, "a"), (2L, 11L, "b")))
  }

  test("as-of join: null payload fields never mix rows or drop matches") {
    // build rows with NULL payload columns: the match must still be found
    // (marker, not first-payload-null test) and both payload fields must come
    // from the SAME (latest) build row even when one of them is null there
    val probe = Seq((1L, "u", 300L)).toDF("pid", "k", "pts")
    val build = Seq(
      (10L, "u", 100L, Some("early"), Some(1L)),
      (11L, "u", 200L, None: Option[String], Some(2L))) // latest: name null
      .toDF("bid", "k", "bts", "name", "qty")
    val out = TemporalJoins.asOfJoin(
        probe, col("k"), col("pts"), build, col("k"), col("bts"),
        Seq("name" -> col("name"), "qty" -> col("qty")))
      .select("pid", "name", "qty").as[(Long, Option[String], Option[Long])]
      .collect().toSet
    // the latest build row (bid 11) wins wholesale: name=null, qty=2 —
    // NOT name="early" (cross-row mix) and NOT dropped (null first payload)
    assert(out == Set((1L, None, Some(2L))))
  }

  test("range join: bin edges are exact (inclusive start, exclusive end)") {
    val points = Seq((1L, 10L), (2L, 20L), (3L, 19L), (4L, 9L)).toDF("pid", "x")
    val ivs = Seq((100L, 10L, 20L)).toDF("iid", "s", "e")
    val out = TemporalJoins.rangeJoinPointInInterval(
        points, col("x"), ivs, col("s"), col("e"), binWidth = 7L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 100L), (3L, 100L))) // 20 excluded (end), 9 excluded (start)
  }

  test("range join matches the naive inequality join on random data") {
    val rnd = new scala.util.Random(3)
    val points = (1L to 300L).map(i => (i, rnd.nextInt(1000).toLong)).toDF("pid", "x")
    val ivs = (1L to 40L).map { i =>
      val s = rnd.nextInt(900).toLong; (i, s, s + 1 + rnd.nextInt(120).toLong)
    }.toDF("iid", "s", "e")
    val binned = TemporalJoins.rangeJoinPointInInterval(points, col("x"), ivs, col("s"), col("e"), 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = points.join(ivs, col("x") >= col("s") && col("x") < col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("overlap join: one row per pair across multi-bin overlaps; closed touch") {
    // a1 spans bins 0..9 and b1 spans 2..11 with width 10 — they co-occur
    // in 8 bins; without the keep-only-the-overlap-start-bin rule the pair
    // would emit 8 rows. b2 touches a1 at exactly one instant (closed
    // intervals: overlap length 0, still a pair); b3 is disjoint.
    val a = Seq((1L, 0L, 99L)).toDF("aid", "s1", "e1")
    val b = Seq((1L, 20L, 119L), (2L, 99L, 150L), (3L, 200L, 300L))
      .toDF("bid", "s2", "e2")
    val out = TemporalJoins.intervalOverlapJoin(a, "s1", "e1", b, "s2", "e2", 10L)
      .select("aid", "bid").as[(Long, Long)].collect().toList.sorted
    assert(out == List((1L, 1L), (1L, 2L))) // exactly once each, no (1,3)
  }

  test("overlap join matches the naive inequality join on random intervals") {
    val rnd = new scala.util.Random(7)
    val a = (1L to 60L).map { i =>
      val s = rnd.nextInt(900).toLong; (i, s, s + rnd.nextInt(150).toLong)
    }.toDF("aid", "s1", "e1")
    val b = (1L to 60L).map { i =>
      val s = rnd.nextInt(900).toLong; (i, s, s + rnd.nextInt(150).toLong)
    }.toDF("bid", "s2", "e2")
    val binned = TemporalJoins.intervalOverlapJoin(a, "s1", "e1", b, "s2", "e2", 40L)
      .select("aid", "bid").as[(Long, Long)].collect().toList
    val naive = a.join(b, col("s1") <= col("e2") && col("s2") <= col("e1"))
      .select("aid", "bid").as[(Long, Long)].collect().toList
    assert(binned.sorted == naive.sorted && naive.nonEmpty)
    assert(binned.distinct.size == binned.size) // exactly-once, not set-equal luck
  }
}
