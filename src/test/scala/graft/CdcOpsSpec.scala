package graft

import org.apache.spark.sql.functions._
import graft.operators.Cdc

/** Operator-semantics specs for the CDC stages on small hand-built frames. */
class CdcOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("tableFilter: whitelist AND blacklist (AugmenterContext.java:711-730)") {
    val df = Seq("keep_me", "drop_2018", "other").toDF("table")
    // include-only: unlisted tables do NOT pass
    val incOnly = Cdc.tableFilter(df, col("table"), include = Seq("keep_me"),
      excludePattern = None).as[String].collect().toSet
    assert(incOnly == Set("keep_me"))
    // include + exclude: excluded wins even for an included table
    val both = Cdc.tableFilter(df, col("table"), include = Seq("keep_me", "drop_2018"),
      excludePattern = Some(".*_\\d+$")).as[String].collect().toSet
    assert(both == Set("keep_me"))
    // exclude-only
    val out2 = Cdc.tableFilter(df, col("table"), Nil, Some(".*_\\d+$")).as[String].collect().toSet
    assert(out2 == Set("keep_me", "other"))
  }

  test("tableNameMerge strips time-shard suffix (TableNameMergePatternFilter)") {
    val df = Seq("Some_Table_201812", "Some_Table_201901", "Plain").toDF("table")
    val out = Cdc.tableNameMerge(df, "table", "_20\\d{4}$").as[String].collect().toSet
    assert(out == Set("Some_Table", "Plain"))
  }

  test("organizeTimestamps: -50µs first version, +1µs each, capped at 50 steps") {
    val base = java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z"))
    val rows = (1 to 55).map(i => ("k", base, i))
    val df = rows.toDF("key", "ts", "ev")
    val out = Cdc.organizeTimestamps(df, col("key"), col("ts"), col("ev"))
      .orderBy("ev").select("cell_ts").as[Long].collect()
    val commitMicros = 1704067200000000L
    assert(out(0) == commitMicros - 50)
    assert(out(1) == commitMicros - 49)
    assert(out(49) == commitMicros - 1)
    assert(out(50) == commitMicros)     // cap reached
    assert(out(54) == commitMicros)     // stays capped
  }

  test("changedValues emits only real changes with before/after images") {
    val df = Seq((1, "k", 10.0), (2, "k", 10.0), (3, "k", 12.0), (4, "k", 12.0))
      .toDF("ev", "key", "v")
    val out = Cdc.changedValues(df, col("key"), col("ev"), col("v"))
      .select("ev", "before_value", "after_value").as[(Int, Double, Double)].collect().toSet
    assert(out == Set((3, 10.0, 12.0)))
  }

  test("latestState window and latestStateAgg agree") {
    val df = Seq((1, "a", 100L, "x"), (2, "a", 200L, "y"), (3, "b", 50L, "z"))
      .toDF("ev", "key", "ts", "payload")
    val win = Cdc.latestState(df, col("key"), col("ts"), col("ev"))
      .select("key", "ev", "payload").as[(String, Int, String)].collect().toSet
    val agg = Cdc.latestStateAgg(df, col("key"), col("ts"), col("ev"), Seq("ev", "payload"))
      .select("key", "ev", "payload").as[(String, Int, String)].collect().toSet
    assert(win == Set(("a", 2, "y"), ("b", 3, "z")))
    assert(agg == win)
  }

  test("safeCheckpointPerKey finds gap-free prefix max (GtidSetAlgebra relational form)") {
    val df = Seq(("u", 1L), ("u", 2L), ("u", 3L), ("u", 7L), ("u", 8L), ("v", 5L), ("v", 6L))
      .toDF("key", "id")
    val out = Cdc.safeCheckpointPerKey(df, col("key"), col("id"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("u" -> 3L, "v" -> 6L))
  }

  test("repartitionBy applies the five reference strategies") {
    val df = (1 to 100).map(i => (i, s"t${i % 5}")).toDF("id", "tbl")
    assert(Cdc.repartitionBy(df, "TABLE_NAME", 4, Some(col("tbl"))).rdd.getNumPartitions == 4)
    assert(Cdc.repartitionBy(df, "RANDOM", 3, None).rdd.getNumPartitions == 3)
    assert(Cdc.repartitionBy(df, "NONE", 9, None).rdd.getNumPartitions == 1)
    // hash routing co-locates identical keys
    val parts = Cdc.repartitionBy(df, "TRID", 4, Some(col("tbl")))
      .withColumn("p", spark_partition_id())
      .groupBy("tbl").agg(countDistinct("p").as("n")).as[(String, Long)].collect()
    assert(parts.forall(_._2 == 1L))
  }

  test("replayDedup restores exactly-once after re-delivery") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val replayed = df.unionAll(df)
    assert(Cdc.replayDedup(replayed, Seq("id")).count() == 2)
  }

  test("funnel: strict ordering, ties excluded, out-of-order steps ignored") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val rows = Seq(
      // u1: full ordered funnel
      (1L, ts(1000), "view"), (1L, ts(2000), "click"), (1L, ts(3000), "purchase"),
      // u2: click BEFORE the first view — stalls at 1
      (2L, ts(1000), "click"), (2L, ts(2000), "view"),
      // u3: click at the SAME ts as the first view — strict > excludes it
      (3L, ts(1000), "view"), (3L, ts(1000), "click"),
      // u4: purchase before click — stalls at 2
      (4L, ts(1000), "view"), (4L, ts(1500), "purchase"), (4L, ts(2000), "click"),
      // u5: no funnel stages at all
      (5L, ts(1000), "error"),
      // u6: second view later must NOT reset; click counts after FIRST view
      (6L, ts(1000), "view"), (6L, ts(5000), "view"), (6L, ts(2000), "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Cdc.funnel(rows, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 3, 2L -> 1, 3L -> 1, 4L -> 2, 5L -> 0, 6L -> 2))
  }

  test("sessionize: idle gaps split sessions, numbering is per-key and " +
      "deterministic on ties, totals are integer cents") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val idle = 1000L
    val rows = Seq(
      // u1: [0, 500, 900] one session; [2500, 3000] second (gap 1600 > idle)
      (1L, ts(0), 10L, 1.25), (1L, ts(500), 11L, 2.50), (1L, ts(900), 12L, 0.10),
      (1L, ts(2500), 13L, 4.00), (1L, ts(3000), 14L, 0.05),
      // u2: single event — one singleton session
      (2L, ts(100), 20L, 9.99),
      // u3: tie on ts — eid orders deterministically, same session
      (3L, ts(50), 31L, 1.00), (3L, ts(50), 30L, 2.00))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Cdc.sessionize(rows, col("user_id"), col("ts"), col("event_id"),
        col("value"), idleMs = idle)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4, r._5, r._6)).toMap
    assert(got == Map(
      (1L, 1L) -> (3L, 0L, 900L, 385L),    // 1.25+2.50+0.10 = 385 cents
      (1L, 2L) -> (2L, 2500L, 500L, 405L),
      (2L, 1L) -> (1L, 100L, 0L, 999L),
      (3L, 1L) -> (2L, 50L, 0L, 300L)))
  }

  test("peakConcurrencyDaily: closed-interval ties count as concurrent, " +
      "midnight-spanning intervals clip per day, singletons count") {
    val Day = 86400000L
    val iv = Seq(
      (1000L, 5000L),        // A
      (5000L, 6000L),        // B starts exactly as A ends → concurrent
      (4000L, Day + 3600000L), // C spans midnight into day 1
      (2000L, 2000L))        // D singleton
      .toDF("s", "e")
    val got = Cdc.peakConcurrencyDaily(iv, col("s"), col("e"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // day 0: peak at t=5000 (A still open on the +1 peer, C open, B opens)
    // = 3; four segments active. day 1: only C's tail.
    assert(got == Map(0L -> (4L, 3L), 1L -> (1L, 1L)), s"got $got")
  }

  test("funnelSteps: mask-0 events never enter per-key state (output-neutral) " +
      "and the per-key cap keeps earliest events only") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val base = Seq(
      (1L, ts(1000), "view"), (1L, ts(2000), "click"), (1L, ts(3000), "purchase"),
      (2L, ts(1000), "view"),
      (3L, ts(1000), "noise")) // all-irrelevant key: owes a stage-0 row
    // a "bot" burst of 500 irrelevant events on key 1 must not change
    // anything: they null out before collect_list (state-bound guard)
    val noisy = base ++ (1 to 500).map(i => (1L, ts(10000L + i), "heartbeat"))
    val preds = Seq(col("event_type") === "view",
      col("event_type") === "click", col("event_type") === "purchase")
    def run(rows: Seq[(Long, Timestamp, String)],
        cap: Option[Int] = None): Map[Long, Int] =
      Cdc.funnelSteps(rows.toDF("user_id", "ts", "event_type"),
          col("user_id"), col("ts"), preds, maxEventsPerKey = cap)
        .as[(Long, Int)].collect().toMap
    val want = Map(1L -> 3, 2L -> 1, 3L -> 0)
    assert(run(base) == want)
    assert(run(noisy) == want, "mask-0 burst changed the funnel output")
    // cap: key 1's purchase is its 3rd step-relevant event — cap=2 keeps
    // the earliest two (view, click) and the conversion is not seen
    assert(run(base, cap = Some(2)) == Map(1L -> 2, 2L -> 1, 3L -> 0))
    assert(run(base, cap = Some(3)) == want)
  }

  test("windowed funnel: a step beyond the gap does not fire; within-gap does") {
    import java.sql.Timestamp
    def ts(ms: Long) = new Timestamp(ms)
    val rows = Seq(
      // u1: click 500ms after view — inside the 1000ms gap, purchase 2000ms
      // after click — OUTSIDE the gap: stalls at 2
      (1L, ts(1000), "view"), (1L, ts(1500), "click"), (1L, ts(3500), "purchase"),
      // u2: everything tight — full funnel
      (2L, ts(1000), "view"), (2L, ts(1500), "click"), (2L, ts(2000), "purchase"),
      // u3: click 5000ms after view — outside: stalls at 1 even though a
      // purchase follows
      (3L, ts(1000), "view"), (3L, ts(6000), "click"), (3L, ts(6500), "purchase"))
      .toDF("user_id", "ts", "event_type")
    val got = Cdc.funnel(rows, col("user_id"), col("ts"), col("event_type"),
        Seq("view", "click", "purchase"), maxGapMs = Some(1000L))
      .as[(Long, Int)].collect().toMap
    assert(got == Map(1L -> 2, 2L -> 3, 3L -> 1))
  }

  test("cohortRetention counts distinct users per (cohort, offset)") {
    import java.sql.Timestamp
    val wk = 7L * 86400000L
    def ts(w: Long) = new Timestamp(w * wk + 1000L)
    val rows = Seq(
      (1L, ts(100)), (1L, ts(101)), (1L, ts(103)), (1L, ts(101)), // dup week
      (2L, ts(100)), (2L, ts(103)),
      (3L, ts(101))).toDF("user_id", "ts")
    val got = Cdc.cohortRetention(rows, col("user_id"), col("ts"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((100L, 0L, 2L), (100L, 1L, 1L), (100L, 3L, 2L),
      (101L, 0L, 1L)))
  }

  test("consistencyCheck classifies MATCH / DIFF / MISSING / EXTRA") {
    val source = Seq((1L, "a", Some(10.0)), (2L, "b", Some(5.0)),
      (3L, "c", Some(1.0)), (5L, "e", None))
      .toDF("key", "tpe", "v")
    val sink = Seq((1L, "a", Some(10.0)), (2L, "b", Some(6.0)),
      (4L, "d", Some(9.0)), (5L, "e", None))
      .toDF("key", "tpe", "v")
    val out = Cdc.consistencyCheck(source, sink, "key", Seq("tpe", "v"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(
      1L -> "MATCH", // identical
      2L -> "DIFF", // value drifted
      3L -> "MISSING", // sink never got it
      4L -> "EXTRA", // sink kept a row the source dropped (missed delete)
      5L -> "MATCH")) // NULL == NULL under null-safe compare, not DIFF
  }

  test("chunkChecksum: identical tables all-MATCH; a drifted value flips " +
      "ONLY its chunk to DIFF; count mismatch flags without a hash check") {
    val source = (1L to 200L).map(i => (i, s"t$i", i * 100L))
      .toDF("key", "tpe", "vc")
    // chunks=1: the degenerate single chunk matches as one aggregate
    val one = Cdc.chunkChecksum(source, source, "key", Seq("tpe", "vc"), 1)
      .as[(Long, Long, Long, String)].collect()
    assert(one.toSeq == Seq((0L, 200L, 200L, "MATCH")))
    // identical at 16 chunks: every chunk MATCH, counts add to 200
    val same = Cdc.chunkChecksum(source, source, "key", Seq("tpe", "vc"), 16)
      .as[(Long, Long, Long, String)].collect()
    assert(same.forall(_._4 == "MATCH") && same.map(_._2).sum == 200L)
    // one drifted value: exactly the chunks containing the touched keys
    // flip to DIFF (same count, different xor signature)
    val drift = source.withColumn("vc",
      when(col("key") === 7L, lit(9999L)).otherwise(col("vc")))
    val diffs = Cdc.chunkChecksum(source, drift, "key", Seq("tpe", "vc"), 16)
      .as[(Long, Long, Long, String)].collect().filter(_._4 != "MATCH")
    assert(diffs.length == 1 && diffs(0)._4 == "DIFF" &&
      diffs(0)._2 == diffs(0)._3, s"one same-count DIFF chunk: ${diffs.toSeq}")
    // a dropped row: its chunk flags via the independent row count
    val dropped = source.filter(col("key") =!= 7L)
    val cnt = Cdc.chunkChecksum(source, dropped, "key", Seq("tpe", "vc"), 16)
      .as[(Long, Long, Long, String)].collect().filter(_._4 != "MATCH")
    assert(cnt.length == 1 && cnt(0)._2 == cnt(0)._3 + 1)
    // xor-cancellation resistance check the design relies on: two rows
    // swapping values across chunks cannot cancel inside one chunk
    val swapped = source.withColumn("vc",
      when(col("key") === 7L, lit(800L))
        .when(col("key") === 8L, lit(700L)).otherwise(col("vc")))
    val sw = Cdc.chunkChecksum(source, swapped, "key", Seq("tpe", "vc"), 16)
      .as[(Long, Long, Long, String)].collect().filter(_._4 != "MATCH")
    assert(sw.nonEmpty, "cross-key value swap must be detected")
  }

  test("maintainChunkChecksum: update/insert/delete fold incrementally to " +
      "the exact recompute; empty chunks drop; redelivery is NOT idempotent " +
      "(xor cancels — fence by batch id)") {
    val cols = Seq("tpe", "vc")
    val v0 = (1L to 100L).map(i => (i, s"t$i", i * 100L)).toDF("key", "tpe", "vc")
    // batch: key 7 updated, key 500 inserted, key 8 deleted
    val v1 = v0.withColumn("vc",
        when(col("key") === 7L, lit(777L)).otherwise(col("vc")))
      .filter(col("key") =!= 8L)
      .unionByName(Seq((500L, "t500", 50000L)).toDF("key", "tpe", "vc"))
    val added = v1.filter(col("key").isin(7L, 500L))
    val removed = v0.filter(col("key").isin(7L, 8L))
    val stored = Cdc.chunkFold(v0, "key", cols, 16)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val maintained = m(Cdc.maintainChunkChecksum(stored, added, removed,
      "key", cols, 16))
    val recompute = m(Cdc.chunkFold(v1, "key", cols, 16))
    assert(maintained == recompute, "maintained must be bit-identical to recompute")
    // a chunk emptied by deletes drops out, matching the recompute
    val onlyRow = Seq((42L, "x", 1L)).toDF("key", "tpe", "vc")
    val tiny = Cdc.chunkFold(onlyRow, "key", cols, 16)
    val emptied = Cdc.maintainChunkChecksum(tiny,
      onlyRow.filter(lit(false)), onlyRow, "key", cols, 16)
    assert(emptied.count() == 0L)
    // the documented at-least-once hazard: applying the SAME batch twice
    // xor-cancels the delta (sig reverts, counts drift) — redelivery must
    // be fenced (batch-id overwrite, the TimeMachineSink pattern), unlike
    // the max_by-maintained views which are naturally idempotent
    val twice = m(Cdc.maintainChunkChecksum(
      Cdc.maintainChunkChecksum(stored, added, removed, "key", cols, 16),
      added, removed, "key", cols, 16))
    assert(twice != recompute, "double-apply must NOT equal single-apply")
  }

  test("repairPlan emits UPSERT for missing/diff, DELETE for extra, drops matches") {
    val source = Seq((1L, "a", Some(10.0)), (2L, "b", Some(5.0)),
      (3L, "c", Some(1.0)))
      .toDF("key", "tpe", "v")
    val sink = Seq((1L, "a", Some(10.0)), (2L, "b", Some(6.0)),
      (4L, "d", Some(9.0)))
      .toDF("key", "tpe", "v")
    val out = Cdc.repairPlan(source, sink, "key", Seq("tpe", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.getString(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out == Set(
      ("UPSERT", 2L, Some("b"), Some(5.0)), // diff: source value wins
      ("UPSERT", 3L, Some("c"), Some(1.0)), // missing at sink
      ("DELETE", 4L, None, None))) // extra at sink: null payload
  }

  test("consistencyCheck null-vs-value is DIFF, not MATCH") {
    val source = Seq((1L, Some("x"))).toDF("key", "v")
    val sink = Seq((1L, Option.empty[String])).toDF("key", "v")
    val out = Cdc.consistencyCheck(source, sink, "key", Seq("v"))
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "DIFF"))
  }

  test("saltedJoin is bit-identical to the plain inner join") {
    val fact = (1 to 5000).map(i => (i.toLong, if (i % 10 < 9) 1 else i % 50))
      .toDF("fid", "fk") // 90% of rows on one hot key
    val dim = (0 until 50).map(k => (k, s"d$k")).toDF("dk", "name")
    val got = graft.operators.Skew
      .saltedJoin(fact, dim, col("fk"), col("dk"), saltBuckets = 8)
      .select("fid", "fk", "dk", "name")
      .as[(Long, Int, Int, String)].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fid", "fk", "dk", "name")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == want && got.size == 5000)
  }

  test("bloomPrunedJoin is bit-identical to the plain inner join") {
    val fact = (1 to 2000).map(i => (i.toLong, i % 500)).toDF("fid", "fk")
    val dim = (0 until 500).filter(_ % 7 == 0).map(k => (k, s"d$k")).toDF("dk", "name")
    val got = graft.operators.Sketches
      .bloomPrunedJoin(fact, dim, "fk", "dk", expectedKeys = 1000L)
      .select("fid", "fk", "dk", "name")
      .as[(Long, Int, Int, String)].collect().toSet
    val want = fact.join(dim, col("fk") === col("dk"))
      .select("fid", "fk", "dk", "name")
      .as[(Long, Int, Int, String)].collect().toSet
    assert(got == want && got.nonEmpty)
  }

  test("minmax maintenance taxonomy: append-fold is idempotent (replay " +
      "safe), but a retraction of the current max CANNOT be folded") {
    // (the taxonomy pin for cdc_minmax_maintain)
    val stored = Seq((1, 10L), (1, 7L)).toDF("g", "v")
      .groupBy("g").agg(max("v").as("mx"))
    val batch = Seq((1, 9L)).toDF("g", "v")
      .groupBy("g").agg(max("v").as("mx"))
    def fold(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame) =
      a.unionAll(b).groupBy("g").agg(max("mx").as("mx"))
    val once = fold(stored, batch).as[(Int, Long)].collect().toSet
    assert(once == Set((1, 10L)))
    // replaying the batch changes nothing — max is idempotent
    assert(fold(fold(stored, batch), batch)
      .as[(Int, Long)].collect().toSet == once)
    // but retracting the max (delete v=10) is not foldable: the stale
    // maintained value (10) differs from the recompute (9) — a delete of
    // the extremum must trigger the group's rescan
    val afterDelete = Seq((1, 7L), (1, 9L)).toDF("g", "v")
      .groupBy("g").agg(max("v").as("mx")).as[(Int, Long)].collect().toSet
    assert(afterDelete == Set((1, 9L)) && afterDelete != once)
  }

  test("seqGaps: bucketed gap report equals the single-window reference; " +
      "gaps spanning empty buckets survive the boundary stitch") {
    import graft.operators.Cdc
    // golden: {1,2,5,6,10,20} → (3,4,2), (7,9,3), (11,19,9)
    val g = Cdc.seqGaps(Seq(1L, 2L, 5L, 6L, 10L, 20L).toDF("k"), col("k"),
        buckets = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(g == Set((3L, 4L, 2L), (7L, 9L, 3L), (11L, 19L, 9L)), s"$g")
    // a gap covering many entirely-empty buckets: only the stitch sees it
    val wide = Cdc.seqGaps(Seq(1L, 100L).toDF("k"), col("k"), buckets = 8)
      .as[(Long, Long, Long)].collect().toSet
    assert(wide == Set((2L, 99L, 98L)), s"$wide")
    // equivalence to the global-window form on a pseudorandom key set
    val keys = (0L until 500L).map(i => (i * 2654435761L) % 10007L)
      .distinct.toDF("k")
    val got = Cdc.seqGaps(keys, col("k"), buckets = 16)
      .as[(Long, Long, Long)].collect().toSet
    val ref = {
      val w = org.apache.spark.sql.expressions.Window.orderBy("k")
      keys.distinct().withColumn("p", lag(col("k"), 1).over(w))
        .filter(col("p").isNotNull && col("k") - col("p") > 1)
        .select((col("p") + 1).as("s"), (col("k") - 1).as("e"),
          (col("k") - col("p") - 1).as("m"))
        .as[(Long, Long, Long)].collect().toSet
    }
    assert(got == ref && got.nonEmpty, s"got ${got.size} vs ref ${ref.size}")
  }

  test("bloomPrunedJoin drops null and non-member fact keys before the join") {
    val fact = Seq((1L, Option(3)), (2L, Option(999)), (3L, Option.empty[Int]))
      .toDF("fid", "fk")
    val dim = Seq((3, "d3")).toDF("dk", "name")
    val got = graft.operators.Sketches
      .bloomPrunedJoin(fact, dim, "fk", "dk", expectedKeys = 16L)
      .select("fid").as[Long].collect().toSeq
    assert(got == Seq(1L))
  }
}
