package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

/** Deterministic sampling + packing for corpus assembly. */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("deterministic sample: rate-proportional, stable across runs, scan-local") {
    val df = (1L to 10000L).toDF("id")
    val kept = Sampling.deterministicSample(df, col("id"), 0.25)
    val n = kept.count()
    assert(math.abs(n - 2500) < 150, s"kept $n of 10000 at rate 0.25")
    // pure function of the key: identical set on re-evaluation
    assert(Sampling.deterministicSample(df, col("id"), 0.25).count() == n)
    // monotone: a higher rate keeps a superset
    val wider = Sampling.deterministicSample(df, col("id"), 0.5)
    assert(kept.join(wider, "id", "left_anti").count() == 0)
    // no shuffle: the decision is a filter over the scan
    assert(!kept.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("leakage split invariant: near-dup cluster members always land in " +
      "the same split (no pair straddles the train/test boundary)") {
    // the pipe_leakage_split contract, pinned on a synthetic corpus with
    // known near-dup pairs: split is a pure function of the CLUSTER key,
    // so any two docs sharing a cluster share a split by construction
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta iota"),   // near-dup of 1
      (3L, "completely different text about other things entirely"),
      (4L, "completely different text about other things still"),  // near-dup of 3
      (5L, "a lone document with no duplicate partner at all")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 64, bands = 16, thresholdPpm = 500000L)
    val canon = Dedup.resolveCanonical(pairs).withColumnRenamed("id", "doc_id")
    val keyed = docs.select(col("doc_id")).join(canon, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("canonical_id"), col("doc_id")).as("canon"))
    val split = Sampling.hashSplit(keyed, col("canon"),
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val m = split.select("doc_id", "split").as[(Long, String)].collect().toMap
    val p = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(p.nonEmpty, "fixture must produce at least one near-dup pair")
    p.foreach { case (x, y) =>
      assert(m(x) == m(y), s"pair ($x,$y) straddles splits: ${m(x)} / ${m(y)}")
    }
  }

  test("hash split: exhaustive+exclusive, ratio-proportional, growth-stable, scan-local") {
    val df = (1L to 10000L).toDF("id")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val assigned = Sampling.hashSplit(df, col("id"), splits)
    // every row gets exactly one split; ratios near the weights
    val counts = assigned.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 10000L)
    assert(math.abs(counts("train") - 8000) < 200, counts.toString)
    assert(math.abs(counts("valid") - 1000) < 120, counts.toString)
    assert(math.abs(counts("test") - 1000) < 120, counts.toString)
    // the leakage guarantee: growing the corpus NEVER moves an old row's
    // split (assignment is a pure function of the key, not the dataset)
    val grown = Sampling.hashSplit((1L to 20000L).toDF("id"), col("id"), splits)
    val moved = assigned.as("a").join(grown.as("g"), "id")
      .filter(col("a.split") =!= col("g.split")).count()
    assert(moved == 0, s"$moved rows changed split when the corpus grew")
    // scan-local: one projection, zero exchanges
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hash split must not shuffle:\n$plan")
    // degenerate single split: everything lands there, no comparison built
    assert(Sampling.hashSplit(df, col("id"), Seq("all" -> 1.0))
      .filter(col("split") =!= "all").count() == 0)
  }

  test("stratified mix applies per-source rates; unlisted sources drop") {
    val df = (1L to 4000L).map(i => (i, s"src${i % 4}")).toDF("id", "source")
    val mixed = Sampling.stratifiedSample(df, col("id"), col("source"),
      Map("src0" -> 1.0, "src1" -> 0.5, "src2" -> 0.1))
    val bySrc = mixed.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 1000L)
    assert(math.abs(bySrc("src1") - 500) < 100)
    assert(math.abs(bySrc("src2") - 100) < 50)
    assert(!bySrc.contains("src3"))
  }

  test("quota sample: exact n per stratum, md5-deterministic, preRate-invariant") {
    val df = (1L to 3000L).map(i => (i, s"lang${i % 3}")).toDF("id", "lang")
    val q = Sampling.quotaSample(df, col("id"), col("lang"), n = 25)
    val byLang = q.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(byLang.values.toSet == Set(25L) && byLang.size == 3)
    // small strata: quota caps at the stratum size
    val tiny = Sampling.quotaSample(df.filter(col("id") <= 10), col("id"), col("lang"), n = 25)
    assert(tiny.count() == 10)
    // a generous pre-thinning keeps the md5 order, so the selected set is
    // identical — the 100 TB fast path is a pure optimization
    val thinned = Sampling.quotaSample(df, col("id"), col("lang"), n = 25, preRate = 0.5)
    val a = q.select("id").as[Long].collect().toSet
    val b = thinned.select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("bigram LM score: hand-checked smoothed transition ppm, NULL below two tokens") {
    import graft.operators.Text
    val docs = Seq((1L, "a b a b"), (2L, "x y"), (3L, "z")).toDF("doc_id", "text")
    val got = Text.lmBigramScore(docs, col("doc_id"), col("text"))
      .select("doc_id", "n_bigrams", "lm_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    // model: c2(a,b)=2 c2(b,a)=1 c2(x,y)=1; c1(a)=2 c1(b)=1 c1(x)=1; V=3
    // s(a,b)=floor(3e6/5)=600000, s(b,a)=floor(2e6/4)=500000, s(x,y)=500000
    // doc1 = floor((2*600000+500000)/3) = 566666; doc2 = 500000; doc3 = NULL
    assert(got == Set((1L, 3L, Some(566666L)), (2L, 1L, Some(500000L)), (3L, 0L, None)))
    // round-12: the broadcast-model shape (default) and the shuffle-join
    // fallback must be bit-identical — Σ s·k over distinct doc-bigrams
    // equals Σ s over occurrences
    spark.sharedState.cacheManager.clearCache()
    val fallback = Text.lmBigramScore(docs, col("doc_id"), col("text"),
        broadcastModel = false)
      .select("doc_id", "n_bigrams", "lm_ppm")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(fallback == got)
    spark.sharedState.cacheManager.clearCache()
  }

  test("stupid backoff: each tier hand-checked, unseen unigram scores 0") {
    import graft.operators.Text
    // model: "a b c a b d" → uni a:2 b:2 c:1 d:1, N=6; bi (a,b):2 (b,c):1
    // (c,a):1 (b,d):1; tri (a,b,c) (b,c,a) (c,a,b) (a,b,d)
    val model = Seq((0L, "a b c a b d")).toDF("doc_id", "text")
    val score = Seq(
      (1L, "a b c x"), // (a,b,c) tier1 500000; (b,c,x) tier3 c1(x)=0 → 0
      (2L, "d a b"),   // (d,a,b) tier2: floor(2*400000/2)=400000
      (3L, "x y"))     // no trigrams
      .toDF("doc_id", "text")
    val got = Text.lmBackoffScore(score, model, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == Set((1L, 2L, Some(250000L)), (2L, 1L, Some(400000L)),
      (3L, 0L, None)))
  }

  test("sequence packing: bins chunk the cumulative budget per shard, order-stable") {
    val df = Seq(
      ("en", 1L, 4000L), ("en", 2L, 4000L), ("en", 3L, 4000L), ("en", 4L, 9000L),
      ("fr", 10L, 9999L), ("fr", 11L, 2L)).toDF("lang", "doc_id", "n_tokens")
    val packed = Sampling.packSequences(df, col("lang"), col("doc_id"), col("n_tokens"), 10000L)
      .select("lang", "doc_id", "bin_id").as[(String, Long, Long)].collect().toSet
    // en: cum-starts 0,4000,8000,12000 → bins 0,0,0,1 ; fr: 0,9999 → 0,0
    assert(packed == Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 0L),
      ("en", 4L, 1L), ("fr", 10L, 0L), ("fr", 11L, 0L)))
  }

  test("packChunksGlobal: straddling spans exact, shard-size invariant, " +
      "empty docs dropped") {
    // chunk=10: stream offsets — d1:[0,4) d2:[4,16) d3:[16,16) d4:[16,33)
    // d2 straddles chunks 0/1; d4 straddles 1/2/3; d3 (0 tokens) emits none
    val df = Seq((1L, 4L), (2L, 12L), (3L, 0L), (4L, 17L))
      .toDF("doc_id", "n_tokens")
    def run(shardSize: Long) = Sampling.packChunksGlobal(
        df.repartition(3), col("doc_id"), col("n_tokens"), 10L, shardSize)
      .select("chunk_id", "doc_id", "tok_start", "tok_end")
      .as[(Long, Long, Long, Long)].collect().toSet
    val want = Set(
      (0L, 1L, 0L, 4L),
      (0L, 2L, 0L, 6L), (1L, 2L, 6L, 12L),
      (1L, 4L, 0L, 4L), (2L, 4L, 4L, 14L), (3L, 4L, 14L, 17L))
    assert(run(4096L) == want)
    // shard-size invariance pins the two-level prefix sum: per-shard local
    // offsets + shard-summary offsets must compose to the same global
    // offsets for ANY sharding, including one doc per shard
    assert(run(1L) == want)
    assert(run(2L) == want)
    intercept[IllegalArgumentException] {
      Sampling.packChunksGlobal(df, col("doc_id"), col("n_tokens"), 0L)
    }
  }

  test("mixture upsample: integer epochs exact, fractional in expectation, deterministic") {
    val df = (1L to 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "source")
    val up = Sampling.mixtureUpsample(df, col("id"), col("source"),
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 0.0))
    val bySrc = up.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("src0") == 2000L) // exactly 2 epochs: every doc twice
    assert(math.abs(bySrc("src1") - 500) < 100) // 0.5 epochs in expectation
    assert(!bySrc.contains("src2")) // weight 0 drops the stratum
    // epoch_idx enumerates copies 1..reps
    val idx = up.filter(col("source") === "src0").groupBy("epoch_idx").count()
      .as[(Int, Long)].collect().toMap
    assert(idx == Map(1 -> 1000L, 2 -> 1000L))
    // pure function of the key: identical multiset on re-evaluation
    assert(Sampling.mixtureUpsample(df, col("id"), col("source"),
      Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 0.0)).count() == up.count())
    // scan-local: no shuffle anywhere in the plan
    assert(!up.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("token budget quota: crossing doc kept, md5 order, per-source independence") {
    val df = Seq(
      (1L, "a", 40L), (2L, "a", 40L), (3L, "a", 40L), (4L, "a", 40L),
      (10L, "b", 5L), (11L, "b", 5L)
    ).toDF("id", "src", "tok")
    val kept = Sampling.tokenBudgetQuota(df, col("id"), col("src"), col("tok"), budget = 100L)
      .select("id", "src").as[(Long, String)].collect().toSet
    // source a: md5 order of ids 1-4; cumulative 40/80/120 -> the third doc
    // CROSSES 100 and is kept, the fourth (cum-tok = 120 >= 100) drops
    val aOrder = Seq(1L, 2L, 3L, 4L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes).map("%02x".format(_)).mkString, i))
    assert(kept.filter(_._2 == "a").map(_._1) == aOrder.take(3).toSet)
    // source b: total 10 < budget -> everything kept, independent of a
    assert(kept.filter(_._2 == "b").map(_._1) == Set(10L, 11L))
    // determinism: same output on a different layout
    val again = Sampling.tokenBudgetQuota(df.repartition(5), col("id"), col("src"), col("tok"), 100L)
      .select("id", "src").as[(Long, String)].collect().toSet
    assert(again == kept)
  }

  test("shard assign: distributed rank equals the global sort rank; shards balanced") {
    val df = (1L to 997L).map(i => (i, (i * 7919L) % 400 + 10)).toDF("id", "n_tokens")
    val got = Sampling.shardAssign(df, col("id"), col("n_tokens"), numShards = 8)
      .select("id", "shard_id").as[(Long, Int)].collect().toMap
    // oracle: single-partition global window
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("n_tokens").desc, col("id"))
    val want = df.withColumn("shard_id", ((row_number().over(w) - 1) % 8).cast("int"))
      .select("id", "shard_id").as[(Long, Int)].collect().toMap
    assert(got == want)
    // LPT round-robin: shard token totals within one max-document of each other
    val totals = Sampling.shardAssign(df, col("id"), col("n_tokens"), numShards = 8)
      .groupBy("shard_id").agg(sum("n_tokens").as("t")).select("t").as[Long].collect()
    assert(totals.max - totals.min <= 410)
    // the data-path rank is distributed: the range exchange on the sort key
    // is frozen inside the one toRdd instance (the plan downstream scans
    // that RDD), the rank is a partition-LOCAL sort + monotonic id — no
    // rank window, no re-run of the range exchange, never a global
    // single-partition sort of the data
    val assigned = Sampling.shardAssign(df, col("id"), col("n_tokens"), 8)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"rank should not use a window:\n$plan")
    assert(!plan.contains("rangepartitioning(__sa_tok"),
      s"range exchange should be frozen inside the pinned RDD, not re-run:\n$plan")
    assert(plan.contains("Scan ExistingRDD"), s"pinned RDD not scanned:\n$plan")
    assert(plan.contains("monotonically_increasing_id"), s"rank not the sorted monotonic id:\n$plan")
  }

  test("dsir: target-resembling docs outrank disjoint docs; ranks dense; plan bounded") {
    // target vocabulary {the,cat,sat,ran}; pool doc 10 IS target-like text,
    // docs 11/12 share nothing with it. The bucket log-ratios are positive
    // exactly on target-seen buckets, so 10 must outscore both.
    val df = Seq(
      (1L, "the cat sat", true),
      (2L, "the cat ran", true),
      (10L, "the cat sat", false),
      (11L, "zzz qqq vvv", false),
      (12L, "zzz qqq www", false)
    ).toDF("doc_id", "text", "tgt")
    val out = Sampling.dsirSelect(df, col("doc_id"), col("text"), col("tgt"),
        buckets = 4096, k = 10)
      .select("rank", "doc_id", "score_micro")
      .as[(Long, Long, Long)].collect()
    // only pool docs are ranked, all of them (k exceeds pool size)
    assert(out.map(_._2).toSet == Set(10L, 11L, 12L))
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // ordered by (score desc, id asc), and the target-like doc leads
    assert(out.head._2 == 10L)
    val scores = out.map(_._3)
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    assert(out.find(_._2 == 10L).get._3 > out.find(_._2 == 11L).get._3)
    // determinism: identical on re-run
    val again = Sampling.dsirSelect(df, col("doc_id"), col("text"), col("tgt"),
        buckets = 4096, k = 10)
      .select("rank", "doc_id", "score_micro").as[(Long, Long, Long)].collect()
    assert(out.toSeq == again.toSeq)
    // plan shape: broadcast-joined lr table, bounded heap selection — no
    // shuffle join, no window, no global sort of the scored pool
    val plan = Sampling.dsirSelect(df, col("doc_id"), col("text"), col("tgt"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), s"lr join must broadcast:\n$plan")
    assert(!plan.contains("Window"), s"selection must not rank via window:\n$plan")
    assert(plan.contains("top_k_by_score"),
      s"selection should use the bounded top-k aggregate:\n$plan")
  }

  test("dsir: the lone ln sits far from every floor boundary on the gate corpus") {
    // The score pipeline's only transcendental is ln over an exact rational;
    // engines may differ by ~1 ulp (~2e-10 absolute at micro-nat scale).
    // Floor(1e6·ln) is then engine-identical as long as no bucket's value
    // sits within that distance of an integer. Measure the actual margin on
    // the driver's gate corpus (sf0.01, the real oracle input): the closest
    // approach must clear the error bound by orders of magnitude.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val bc = Sampling.dsirGrams(docs, col("doc_id"), col("text"), col("lang") === "en")
      .groupBy("bkt").agg(
        sum(when(col("is_target"), 1L).otherwise(0L)).as("t"),
        sum(when(!col("is_target"), 1L).otherwise(0L)).as("r"))
      .select("t", "r").as[(Long, Long)].collect()
    val tt = bc.map(_._1).sum
    val rt = bc.map(_._2).sum
    val minDist = bc.map { case (t, r) =>
      val x = math.log(((t + 1) * (rt + 4096)).toDouble /
                       ((r + 1) * (tt + 4096)).toDouble) * 1000000.0d
      math.abs(x - math.rint(x))
    }.min
    assert(minDist > 1e-4, f"ln-floor margin too thin: $minDist%.3e")
  }

  test("weightedSample: heavier items overrepresented; ln-floor margin holds on the fixture") {
    // deterministic Efraimidis-Spirakis: ids with w=10 should dominate a
    // 100-of-1000 sample over w=1 ids (expected inclusion odds ~10:1)
    val df = (1L to 1000L).map(i => (i, if (i % 2 == 0) 10.0 else 1.0))
      .toDF("id", "w")
    val picked = Sampling.weightedSample(df, col("id"), col("w"), n = 100)
      .select("id").as[Long].collect()
    assert(picked.length == 100 && picked.distinct.length == 100)
    val heavy = picked.count(_ % 2 == 0)
    assert(heavy > 75, s"heavy-weight items underrepresented: $heavy/100")
    // floor-margin discipline on the REAL oracle fixture: no doc's score
    // sits close enough to an integer boundary for a last-ulp ln wobble
    // to flip the floor
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val xs = docs.select(
        (conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("double") + lit(1.0)) / lit(4503599627370497.0),
        col("n_chars").cast("double"))
      .as[(Double, Double)].collect()
    val minDist = xs.map { case (u, w) =>
      val x = math.log(u) / w * 1000000000.0
      math.abs(x - math.rint(x))
    }.min
    assert(minDist > 1e-4, f"ws ln-floor margin too thin: $minDist%.3e")
  }

  test("curriculumStages ≡ the ntile window, including heavy ties") {
    val df = (1 to 1037).map(i => (i.toLong, (i * 31 % 50).toDouble))
      .toDF("id", "diff").repartition(8)
    for (k <- Seq(4, 7)) {
      val got = Sampling.curriculumStages(df, col("id"), col("diff"), k)
        .select("id", "stage").as[(Long, Int)].collect().toMap
      val want = df
        .withColumn("stage", ntile(k).over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("diff"), md5(col("id").cast("string")), col("id"))))
        .select("id", "stage").as[(Long, Int)].collect().toMap
      assert(got == want, s"k=$k mismatch")
    }
  }

  test("curriculumStages degenerate n < k: stage = rank") {
    val df = Seq((1L, 5.0), (2L, 1.0), (3L, 3.0)).toDF("id", "diff")
    val got = Sampling.curriculumStages(df, col("id"), col("diff"), 10)
      .select("id", "stage").as[(Long, Int)].collect().toMap
    assert(got == Map(2L -> 1, 3L -> 2, 1L -> 3))
  }

  test("temperatureWeights: √-law weights, exact on perfect squares") {
    // sizes 1, 4, 9 → √ = 1, 2, 3; den = 6 exact; weights floor(1e9·√/6)
    val df = Seq(("a", 1L), ("b", 4L), ("c", 9L)).toDF("lang", "n_chars")
    val got = Sampling.temperatureWeights(df, col("lang"), col("n_chars"))
      .select("grp", "weight_ppb").as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 166666666L, "b" -> 333333333L, "c" -> 500000000L))
  }

  test("temperatureWeights upsamples the tail vs proportional mixing") {
    val df = Seq(("big", 1000000L), ("small", 100L)).toDF("l", "n")
    val got = Sampling.temperatureWeights(df, col("l"), col("n"))
      .select("grp", "n", "weight_ppb").as[(String, Long, Long)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (nb, wb) = got("big"); val (ns, ws) = got("small")
    // τ=0.5 compresses the ratio: weight ratio = √(size ratio)
    assert(wb.toDouble / ws > 90 && wb.toDouble / ws < 110,
      s"√(10000) = 100 expected, got ${wb.toDouble / ws}")
    assert(nb / ns == 10000)
  }
}
