package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, Text}

/** Dedup / similarity / text-analysis operator specs on planted fixtures. */
class DedupTextSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
  private val nearDup = base.replace("today", "tonight") // one-token edit
  private val shuffled = "dog lazy the over jumps fox brown quick the near bank river old the today"
  private val unrelated = "completely different words about spark query engines and distributed joins here"

  private def docs = Seq((0L, base), (1L, nearDup), (2L, shuffled), (3L, unrelated))
    .toDF("doc_id", "text")

  test("coocPairs: ±2-window pairs in canonical order; short docs " +
      "degenerate cleanly; repeated words count per occurrence") {
    def pairs(s: String): Seq[(String, String)] =
      Seq(s).toDF("t").select(explode(Text.coocPairs(col("t"))).as("p"))
        .select("p.w1", "p.w2").as[(String, String)].collect().toSeq
    // "a b c d": (a,b) (a,c) (b,c) (b,d) (c,d) — j=1 then j=2 per position
    assert(pairs("a b c d").sorted ==
      Seq(("a","b"), ("a","c"), ("b","c"), ("b","d"), ("c","d")).sorted)
    // canonical order: "b a" emits (a, b)
    assert(pairs("b a") == Seq(("a", "b")))
    // one word → no pairs; repeated word pairs with itself per occurrence
    assert(pairs("solo").isEmpty)
    assert(pairs("x x x").sorted == Seq(("x","x"), ("x","x"), ("x","x")).sorted)
  }

  test("exact clusters: shuffled text shares a word-set fingerprint with base") {
    val out = Dedup.exactClusters(
      docs.withColumn("wfp", Text.wordSetFingerprint(col("text"))), col("doc_id"), col("wfp"))
    val byCanon = out.select("canonical_id", "dup_count").as[(Long, Long)].collect().toMap
    assert(byCanon(0L) == 2L) // base + shuffled (same word set)
    assert(out.count() == 3)
  }

  test("trigram jaccard pairs find the near-dup, not the shuffle or unrelated") {
    val pairs = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 500000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("minhash LSH pipeline returns the same verified pairs as all-pairs") {
    val lsh = Dedup.minhashNearDupPairs(docs, col("doc_id"), col("text"),
      n = 3, numHashes = 128, bands = 32, thresholdPpm = 500000L)
      .select("a_id", "b_id", "jaccard_ppm").as[(Long, Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 500000L)
      .select("a_id", "b_id", "jaccard_ppm").as[(Long, Long, Long)].collect().toSet
    assert(lsh == exact)
    assert(lsh.nonEmpty)
  }

  test("chunkWindows: stride overlap, short tail, single-chunk doc, coverage invariant") {
    val words = (1 to 150).map(i => s"w$i").mkString(" ")
    val cdocs = Seq((0L, words), (1L, "just five little words here")).toDF("doc_id", "text")
    val ch = Text.chunkWindows(cdocs, col("doc_id"), col("text"), window = 64, stride = 48)
      .select(col("id"), col("chunk_idx"), col("chunk_text"), col("n_tokens"))
      .as[(Long, Int, String, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val d0 = ch.filter(_._1 == 0L)
    // starts at 0,48,96,144 — 4 chunks; sizes 64,64,54,6
    assert(d0.map(_._2) == Seq(0, 1, 2, 3))
    assert(d0.map(_._4) == Seq(64L, 64L, 54L, 6L))
    assert(d0(0)._3.startsWith("w1 ") && d0(1)._3.startsWith("w49 ")
      && d0(3)._3 == "w145 w146 w147 w148 w149 w150")
    // overlap: chunk 1 re-covers tokens 49..64 of chunk 0
    assert(d0(0)._3.endsWith(" w64") && d0(1)._3.contains("w64"))
    // every token appears in at least one chunk
    assert((1 to 150).forall(i => d0.exists(_._3.split(" ").contains(s"w$i"))))
    // short doc: one chunk, whole text
    assert(ch.filter(_._1 == 1L) == Seq((1L, 0, "just five little words here", 5L)))
  }

  test("incremental LSH equals batch-touching all-pairs; index-index pairs never emit") {
    // index: base + its near-dup (an index-internal pair that must NOT
    // emit); batch: another near-dup of base + an unrelated doc
    val nearDup2 = base.replace("quick", "swift")
    val cdocs = Seq((0L, base), (1L, nearDup), (10L, nearDup2), (11L, unrelated))
      .toDF("doc_id", "text")
    val inc = Dedup.minhashNearDupIncremental(
        cdocs.filter(col("doc_id") < 10), cdocs.filter(col("doc_id") >= 10),
        col("doc_id"), col("text"), 3, 64, 16, 700000L)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    // the batch near-dup of base emits; the index-internal pair (0,1) must
    // not, even though it clears the threshold
    assert(inc.contains((0L, 10L)) && !inc.contains((0L, 1L)))
    // invariant vs the batch form: exactly the batch-touching subset
    val full = Dedup.minhashNearDupPairs(cdocs, col("doc_id"), col("text"), 3, 64, 16, 700000L)
      .select(col("a_id"), col("b_id")).as[(Long, Long)].collect().toSet
    assert(full.contains((0L, 1L))) // the suppressed pair IS a real near-dup
    assert(inc == full.filter(p => p._1 >= 10 || p._2 >= 10))
  }

  test("containment: small doc embedded in a big one scores C=1 where Jaccard misses") {
    val big = base + " " + unrelated + " plus much more filler text stretching the gram set very far beyond"
    val cdocs = Seq((0L, base), (1L, big), (2L, unrelated)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(cdocs, col("doc_id"), col("text"), 3, 900000L)
      .select(col("a_id"), col("b_id"), col("containment_ppm"))
      .as[(Long, Long, Long)].collect().toSet
    // base's grams all appear inside big -> C = 1.0; unrelated's grams do
    // too (big embeds both) — but base vs unrelated share nothing
    assert(cont.map(p => (p._1, p._2)) == Set((0L, 1L), (1L, 2L)))
    assert(cont.forall(_._3 == 1000000L))
    // the same pairs are INVISIBLE to symmetric Jaccard at any useful bar
    val jac = Dedup.ngramJaccardPairs(cdocs, col("doc_id"), col("text"), 3, 500000L)
      .as[(Long, Long, Long)].collect()
    assert(jac.isEmpty)
  }

  test("containment maxDf knob drops ubiquitous-gram pairs only") {
    // two docs overlap ONLY via a boilerplate sentence shared by all four
    val boiler = "subscribe to our newsletter for the latest updates and offers every single day"
    val cdocs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta " + boiler),
      (1L, "one two three four five six seven " + boiler),
      (2L, boiler), (3L, boiler)).toDF("doc_id", "text")
    val full = Dedup.containmentPairs(cdocs, col("doc_id"), col("text"), 3, 900000L)
      .as[(Long, Long, Long)].collect().toSet
    // 2 and 3 ARE the boilerplate: fully contained in everything
    assert(full.map(p => (p._1, p._2)) ==
      Set((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    // dropping grams present in >3 docs removes the boilerplate signal;
    // only the identical pair (2,3) — intersecting on df<=3 grams too —
    // could survive, and with every shared gram pruned nothing does
    val pruned = Dedup.containmentPairs(cdocs, col("doc_id"), col("text"), 3,
        900000L, maxDf = 3L)
      .as[(Long, Long, Long)].collect().toSet
    assert(pruned.isEmpty)
  }

  test("simhash: near-dup within small hamming distance, unrelated far") {
    val sigs = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("sig"))
      .as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(3L)))
    assert(ham(sigs(0L), sigs(2L)) <= ham(sigs(0L), sigs(1L))) // shuffle: identical token bag
  }

  test("resolveCanonical maps every member of a dup group to the component minimum") {
    val pairs = Seq((0L, 1L), (1L, 4L)).toDF("a_id", "b_id")
    val out = Dedup.resolveCanonical(pairs).as[(Long, Long)].collect().toMap
    // chained cluster 0–1–4: 4 must resolve to 0 (the component min), not to
    // its direct neighbor 1 — the single-iteration shortcut got this wrong
    assert(out(1L) == 0L && out(4L) == 0L && out(0L) == 0L)
  }

  test("resolveCanonical converges deep chains and keeps components separate") {
    // two components: a 5-deep chain 10–11–12–13–14 (descending discovery
    // order so propagation actually needs multiple rounds) and a pair 2–3
    val pairs = Seq((13L, 14L), (12L, 13L), (11L, 12L), (10L, 11L), (2L, 3L))
      .toDF("a_id", "b_id")
    val out = Dedup.resolveCanonical(pairs).as[(Long, Long)].collect().toMap
    assert(Seq(10L, 11L, 12L, 13L, 14L).forall(out(_) == 10L))
    assert(out(2L) == 2L && out(3L) == 2L)
  }

  test("span contamination flags shared n-grams, counts positions, ignores eval-only text") {
    val train = Seq(
      (1L, "the exact eval question text plus more words here"), // quotes eval doc
      (3L, "totally original training content nothing shared at all")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the exact eval question text")).toDF("doc_id", "text")
    val out = Dedup.spanContamination(train, col("doc_id"), col("text"),
        eval, col("text"), n = 5)
      .select("doc_id", "n_spans", "n_contaminated", "contam_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 1: 5 positional 5-grams, exactly 1 ("the exact eval question text") shared
    assert(out(1L) == ((1L, 5L, 1L, 200000L)))
    assert(out(3L) == ((3L, 4L, 0L, 0L)))
  }

  test("span removal cuts covered positions only, reassembles survivors in order") {
    val train = Seq(
      (1L, "the exact eval question text plus more words here"), // quotes eval doc
      (3L, "totally original training content nothing shared at all")
    ).toDF("doc_id", "text")
    val eval = Seq((100L, "the exact eval question text")).toDF("doc_id", "text")
    val out = Dedup.removeContaminatedSpans(train, col("doc_id"), col("text"),
        eval, col("text"), n = 5)
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    // doc 1: the shared 5-gram starts at position 0 and covers tokens 0-4;
    // tokens 5-8 ("plus more words here") survive in order
    assert(out(1L) == ((1L, 9L, 5L, "plus more words here")))
    // untouched doc: zero removed, text round-trips (normalized form)
    assert(out(3L) == ((3L, 8L, 0L,
      "totally original training content nothing shared at all")))
    // overlapping dirty spans: eval shares 5-grams at starts 0 AND 2 -> the
    // union [0,4] ∪ [2,6] = tokens 0-6 is cut, not double-counted
    val t2 = Seq((5L, "a b c d e f g tail1 tail2")).toDF("doc_id", "text")
    val e2 = Seq((200L, "a b c d e"), (201L, "c d e f g")).toDF("doc_id", "text")
    val got = Dedup.removeContaminatedSpans(t2, col("doc_id"), col("text"),
        e2, col("text"), n = 5)
      .select("n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, String)].collect()(0)
    assert(got == ((9L, 7L, "tail1 tail2")))
  }

  test("keepBest picks the highest-scored cluster member, ties to the smaller id") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (7L, 7L), (8L, 7L))
      .toDF("id", "canonical_id")
    val scored = Seq((1L, 10L), (2L, 50L), (3L, 50L), (7L, 5L), (8L, 5L))
      .toDF("doc_id", "quality")
    val out = Dedup.keepBest(labels, scored, "doc_id", col("quality"))
      .select("id", "keeper_id").as[(Long, Long)].collect().toMap
    assert(out(1L) == 2L && out(2L) == 2L && out(3L) == 2L) // max score, tie -> min id
    assert(out(7L) == 7L && out(8L) == 7L)
  }

  test("large-star/small-star components equal min-propagation on chains and random graphs") {
    // deep chain (adversarial for propagation), plus a separate pair
    val chain = ((100L to 119L).sliding(2).map(s => (s(1), s(0))).toSeq :+ ((2L, 3L)))
      .toDF("a_id", "b_id")
    val viaStars = Dedup.resolveCanonicalStars(chain).as[(Long, Long)].collect().toMap
    val viaProp = Dedup.resolveCanonical(chain).as[(Long, Long)].collect().toMap
    assert(viaStars == viaProp)
    assert((100L to 119L).forall(viaStars(_) == 100L) && viaStars(3L) == 2L)
    // random graph: 300 nodes, 260 random edges — many odd-shaped components
    val rnd = new scala.util.Random(11)
    val randomPairs = (1 to 260)
      .map(_ => (rnd.nextInt(300).toLong, rnd.nextInt(300).toLong))
      .filter { case (a, b) => a != b }.toDF("a_id", "b_id")
    val s2 = Dedup.resolveCanonicalStars(randomPairs).as[(Long, Long)].collect().toMap
    val p2 = Dedup.resolveCanonical(randomPairs).as[(Long, Long)].collect().toMap
    assert(s2 == p2, s"stars/propagation disagree on ${s2.toSet.diff(p2.toSet).take(5)}")
  }

  test("contamination sweep runs on the LSH candidate path: no cross product in the plan") {
    val q = SparkEntry.queries("dedup_contamination")(spark, "/root/testdata/sf0.001")
    val phys = q.queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"), s"quadratic plan shipped:\n${phys.take(2000)}")
    assert(!phys.contains("BroadcastNestedLoopJoin"), s"quadratic plan shipped:\n${phys.take(2000)}")
    assert(q.count() > 0)
    spark.sharedState.cacheManager.clearCache()
  }

  test("brute-force top-k ranks by cosine with deterministic ties") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(-1.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(vecs, col("vec_id"), col("embedding"),
      vecs.filter(col("vec_id") === 0), col("vec_id"), col("embedding"), 2)
      .select("vec_id").as[Long].collect().toSeq
    assert(out == Seq(1L, 2L))
  }

  test("hyperplane LSH buckets identical vectors together") {
    val vecs = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-3.0f, 1.0f, -2.0f))).toDF("vec_id", "embedding")
    val b = vecs.select(col("vec_id"),
      Similarity.hyperplaneSignature(Similarity.asDouble(col("embedding")), 8).as("bucket"))
      .as[(Long, Long)].collect().toMap
    assert(b(0L) == b(1L))
  }

  test("embedding LSH near-dup equals the all-pairs result (scores included)") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingNearDupPairs(emb, col("vec_id"), col("embedding"), 0.4)
      .select("a_id", "b_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(emb, col("vec_id"), col("embedding"), 0.4)
      .select("a_id", "b_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty)
    // 32 narrow bands: every true pair recalled on this data; exact verify
    // recomputes cosine in the identical float-op order → full equality
    assert(lsh == exact, s"missing=${(exact -- lsh).take(5)} extra=${(lsh -- exact).take(5)}")
  }

  test("blocked exact embedding near-dup equals the all-pairs form") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Dedup.embeddingNearDupPairs(emb, col("vec_id"), col("embedding"), 0.4)
      .select("a_id", "b_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val blocked = Dedup.embeddingNearDupBlocked(emb, col("vec_id"), col("embedding"), 0.4)
      .select("a_id", "b_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && blocked == exact)
  }

  test("embedding LSH is selective at high thresholds: full recall, tiny candidate fraction") {
    // clustered synthetic vectors: 40 clusters of 5 near-identical members
    // (within-cluster cos ≈ 0.98) plus noise dims — the regime banded
    // hyperplane LSH is FOR. All true pairs at 0.9 must be recalled while
    // candidate volume stays far below all-pairs.
    val rnd = new scala.util.Random(7)
    val base = Array.fill(40)(Array.fill(32)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 200).map { i =>
      val c = base(i / 5)
      (i.toLong, c.zipWithIndex.map { case (x, j) => x + 0.02f * rnd.nextGaussian().toFloat }.toSeq)
    }.toDF("vec_id", "embedding")
    val exact = Dedup.embeddingNearDupPairs(vecs, col("vec_id"), col("embedding"), 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val lsh = Dedup.embeddingNearDupLsh(vecs, col("vec_id"), col("embedding"), 0.9,
      bands = 16, planesPerBand = 8)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty && lsh == exact)
    // selectivity: candidate pairs from the bands ≪ all pairs
    val docs = vecs.select(col("vec_id").as("id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val banded = docs.select(col("id"), explode(array((0 until 16).map(b =>
      struct(lit(b).as("band"),
        graft.operators.Similarity.hyperplaneSignature(col("v"), 8, b * 8).as("bucket"))): _*)).as("bb"))
      .select(col("id"), col("bb.band").as("band_id"), col("bb.bucket").as("band_hash"))
      .withColumnRenamed("id", "doc_id")
    val cands = Dedup.lshCandidates(banded).count()
    assert(cands < 200L * 199L / 2 / 5, s"LSH passed $cands of ${200 * 199 / 2} pairs")
  }

  test("kmeans IVF: Lloyd iterations keep cluster cohesion and improve the objective") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    val base = Array.fill(20)(Array.fill(16)(rnd.nextGaussian().toFloat))
    // id layout i % 20: the deterministic first-k seeds hit one member of
    // every true cluster (a k-means++-grade init without the machinery)
    val vecs = (0 until 100).map { i =>
      val c = base(i % 20)
      (i.toLong, c.map(x => x + 0.02f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    def objective(cts: org.apache.spark.sql.DataFrame): Double =
      Similarity.ivfAssign(vecs, col("vec_id"), col("embedding"), cts)
        .join(cts, "centroid_id")
        .agg(avg(Similarity.cosine(col("v"), col("cvec")))).as[Double].head()
    val seeds = Similarity.kmeansCentroids(vecs, col("vec_id"), col("embedding"), 20, 0)
    val trained = Similarity.kmeansCentroids(vecs, col("vec_id"), col("embedding"), 20, 3)
    assert(objective(trained) >= objective(seeds))
    // cohesion: near-identical cluster members always land on one centroid
    val groups = Similarity.ivfAssign(vecs, col("vec_id"), col("embedding"), trained)
      .select((col("vec_id") % 20).as("true_cluster"), col("centroid_id"))
      .distinct().groupBy("true_cluster").count().as[(Long, Long)].collect()
    assert(groups.forall(_._2 == 1L))
  }

  test("ivf exact threshold join equals brute force and prunes provably-empty clusters") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(13)
    val base = Array.fill(10)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 120).map { i =>
      val c = base(i % 10)
      (i.toLong, c.map(x => x + 0.02f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 15)
    val exact = Similarity.bruteForceTopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 120)
      .filter(col("cos_sim") >= 0.9)
      .select("query_id", "vec_id", "cos_sim").as[(Long, Long, Double)].collect().toSet
    val ivf = Similarity.ivfExactThreshold(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), threshold = 0.9, k = 10, iters = 3)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && ivf == exact)
    // sampled quantizer training (the 100 TB posture) moves only the
    // centroids — the exactness guarantee holds for ANY centroid set
    val sampled = Similarity.ivfExactThreshold(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), threshold = 0.9, k = 10, iters = 3,
        trainFraction = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    assert(sampled == exact)
    // the probe plan must rule out most (query, cluster) pairs: with 10
    // tight well-separated clusters, each query should probe ~its own
    val cts = Similarity.kmeansCentroids(vecs, col("vec_id"), col("embedding"), 10, 3)
    val (_, clusters) = Similarity.ivfClusterIndex(vecs, col("vec_id"), col("embedding"), cts)
    val probes = Similarity.ivfProbes(clusters, queries, col("vec_id"), col("embedding"), 0.9).count()
    assert(probes < 15L * 10 / 2, s"pruning too weak: $probes of ${15 * 10} probes survive")
  }

  test("stored IVF index: write/read round-trip, batch append folds in " +
      "without re-encoding the base, search equals full rebuild and brute force") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(17)
    val base = Array.fill(10)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 120).map { i =>
      val c = base(i % 10)
      (i.toLong, c.map(x => x + 0.02f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val corpus = vecs.filter(col("vec_id") % 6 =!= 0)
    val batch = vecs.filter(col("vec_id") % 6 === 0)
    val queries = vecs.filter(col("vec_id") < 15)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf-spec").toString
    val cts = Similarity.kmeansCentroids(corpus, col("vec_id"), col("embedding"), 10, 3)
    val (a1, c1) = Similarity.ivfClusterIndex(corpus, col("vec_id"), col("embedding"), cts)
    Similarity.writeIvfIndex(a1, c1, dir, 1L)
    val (sa1, sc1) = Similarity.readIvfIndex(spark, dir, 1L)
    // round-trip: stored v1 answers base-corpus queries like the live index
    val live = Similarity.ivfSearch(a1, c1, queries, col("vec_id"),
        col("embedding"), 0.9).as[(Long, Long, Double)].collect().toSet
    val stored = Similarity.ivfSearch(sa1, sc1, queries, col("vec_id"),
        col("embedding"), 0.9).as[(Long, Long, Double)].collect().toSet
    assert(stored == live && stored.nonEmpty)
    // append: batch folds into stored centroids; search over v2 equals the
    // brute-force threshold join over corpus ∪ batch (= all of vecs)
    val (a2, c2) = Similarity.ivfAppend(sa1, sc1, batch, col("vec_id"), col("embedding"))
    Similarity.writeIvfIndex(a2, c2, dir, 2L)
    val (sa2, sc2) = Similarity.readIvfIndex(spark, dir, 2L)
    val got = Similarity.ivfSearch(sa2, sc2, queries, col("vec_id"),
        col("embedding"), 0.9).as[(Long, Long, Double)].collect().toSet
    val truth = Similarity.bruteForceTopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 120)
      .filter(col("cos_sim") >= 0.9)
      .select("query_id", "vec_id", "cos_sim")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == truth, s"appended-index search must equal brute force")
    // batch members must be findable (radii actually grew): every batch id
    // near a query appears in the result set
    assert(got.exists { case (_, v, _) => v % 6 == 0 },
      "appended members must be reachable through the stored index")
    // the append touched only batch-sized state: assigned grew by exactly
    // the batch row count, cluster count unchanged
    assert(sa2.count() == sa1.count() + batch.count())
    assert(sc2.count() == sc1.count())
  }

  test("stored-index CDC maintenance: deletes are rebuild-equal and replays are no-ops") {
    import graft.operators.{Dedup, Similarity}
    // --- IVF side: delete fold + redelivery contracts ---
    val rnd = new scala.util.Random(31)
    val base = Array.fill(8)(Array.fill(16)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 96).map { i =>
      val c = base(i % 8)
      (i.toLong, c.map(x => x + 0.02f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val cts = Similarity.kmeansCentroids(vecs, col("vec_id"), col("embedding"), 8, 3)
    val (a1, c1) = Similarity.ivfClusterIndex(vecs, col("vec_id"), col("embedding"), cts)
    val deleted = vecs.filter(col("vec_id") % 5 === 0).select(col("vec_id"))
    val (a2, c2) = Similarity.ivfApplyDeletes(a1, c1, deleted, col("vec_id"))
    def hits(a: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
      Similarity.ivfSearch(a, c, queries, col("vec_id"), col("embedding"), 0.9)
        .as[(Long, Long, Double)].collect().toSet
    // rebuild-equality: post-delete search == index built from survivors
    // (same centroids — radii deliberately stay stale-but-covering)
    val (ra, rc) = Similarity.ivfClusterIndex(
      vecs.filter(col("vec_id") % 5 =!= 0), col("vec_id"), col("embedding"), cts)
    val afterDelete = hits(a2, c2)
    assert(afterDelete == hits(ra, rc) && afterDelete.nonEmpty)
    assert(!afterDelete.exists { case (_, v, _) => v % 5 == 0 })
    // delete redelivery: re-applying the same delete batch is a no-op
    val (a3, c3) = Similarity.ivfApplyDeletes(a2, c2, deleted, col("vec_id"))
    assert(hits(a3, c3) == afterDelete)
    // append redelivery (the guarded ivfAppend): re-appending an already-
    // indexed batch leaves the index unchanged — no duplicate hits, no
    // fence required
    val replay = vecs.filter(col("vec_id") % 5 =!= 0 && col("vec_id") < 30)
    val (a4, c4) = Similarity.ivfAppend(a2, c2, replay, col("vec_id"), col("embedding"))
    assert(a4.count() == a2.count(), "replayed batch must not re-enter the index")
    assert(hits(a4, c4) == afterDelete)

    // --- LSH side: delete fold + redelivery ---
    val docs = (0 until 40).map { i =>
      val words = if (i % 4 == 0) "alpha beta gamma delta epsilon zeta eta theta"
        else s"unique$i words$i for$i doc$i number$i in$i corpus$i tail$i"
      (i.toLong, words)
    }.toDF("doc_id", "text")
    val (b1, s1) = Dedup.lshIndexBuild(docs, col("doc_id"), col("text"), 3, 64, 16)
    val delDocs = docs.filter(col("doc_id") === 8).select(col("doc_id"))
    val (b2, s2) = Dedup.lshApplyDeletes(b1, s1, delDocs, col("doc_id"))
    // the deleted replica vanishes from both stored relations…
    assert(b2.filter(col("doc_id") === 8).count() == 0)
    assert(s2.filter(col("id") === 8).count() == 0)
    // …and a probe against the maintained index equals one against a
    // rebuild from the surviving corpus
    val batch = Seq((100L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val (pairs, _, _) = Dedup.lshProbeAppend(b2, s2, batch,
      col("doc_id"), col("text"), 3, 64, 16, 800000L)
    val (rb, rs) = Dedup.lshIndexBuild(docs.filter(col("doc_id") =!= 8),
      col("doc_id"), col("text"), 3, 64, 16)
    val (rpairs, _, _) = Dedup.lshProbeAppend(rb, rs, batch,
      col("doc_id"), col("text"), 3, 64, 16, 800000L)
    val got = pairs.select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == rpairs.select("a_id", "b_id").as[(Long, Long)].collect().toSet)
    assert(!got.exists { case (a, b) => a == 8 || b == 8 } && got.nonEmpty)
    // delete redelivery: no-op
    val (b3, s3) = Dedup.lshApplyDeletes(b2, s2, delDocs, col("doc_id"))
    assert(b3.count() == b2.count() && s3.count() == s2.count())
  }

  test("ivfadc: probed compressed scan + exact re-rank equals brute force on clustered data") {
    import graft.operators.{Pq, Similarity}
    val rnd = new scala.util.Random(23)
    val base = Array.fill(8)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 240).map { i =>
      val c = base(i % 8)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 5)
      .as[(Long, Long, Double)].collect().toSet
    // generous probes+shortlist on well-separated clusters: the composed
    // IVF->ADC->re-rank pipeline must reproduce brute force exactly
    val ivfadc = Pq.ivfAdcTopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        kClusters = 8, iters = 2, m = 8, kCodes = 16,
        nProbe = 4, shortlist = 60, finalK = 5)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && ivfadc == exact,
      s"missing=${(exact -- ivfadc).take(5)} extra=${(ivfadc -- exact).take(5)}")
  }

  test("pq: compressed ADC shortlist recalls the exact top-k on clustered data") {
    import graft.operators.{Pq, Similarity}
    val rnd = new scala.util.Random(17)
    val base = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val vecs = (0 until 200).map { i =>
      val c = base(i % 10)
      (i.toLong, c.map(x => x + 0.05f * rnd.nextGaussian().toFloat).toSeq)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"), k = 10)
      .as[(Long, Long, Double)].collect().toSet
    // shortlist = 20% of the corpus: the compressed-domain ranking must
    // surface every true neighbor, then the exact re-rank reproduces the
    // brute-force result bit-for-bit
    val pq = Pq.adcTopK(vecs, col("vec_id"), col("embedding"),
        queries, col("vec_id"), col("embedding"),
        m = 8, k = 16, shortlist = 40, finalK = 10)
      .as[(Long, Long, Double)].collect().toSet
    assert(exact.nonEmpty && pq == exact)
    // compression contract: m ints per vector, every code within the book
    val cb = Pq.seedCodebook(vecs, col("vec_id"), col("embedding"), m = 8, k = 16)
    val codes = Pq.encode(vecs, col("vec_id"), col("embedding"), cb, m = 8)
    assert(codes.count() == 200)
    val badRows = codes.filter(size(col("codes")) =!= 8 ||
      exists(col("codes"), c => c < 0 || c >= 16)).count()
    assert(badRows == 0)
    // corrupt codes must NULL out, never rank on a partial score
    val nulls = codes.select(Pq.adc(array(lit(99)), array(lit(0.5d)), 16).as("s"))
      .filter(col("s").isNull).count()
    assert(nulls == 200)
  }

  test("simhash-verified pairs equal the all-pairs n-gram jaccard result") {
    val pairs = Dedup.simhashVerifiedPairs(docs, col("doc_id"), col("text"), 3, 500000L)
      .select("a_id", "b_id", "jaccard_ppm").as[(Long, Long, Long)].collect().toSet
    val exact = Dedup.ngramJaccardPairs(docs, col("doc_id"), col("text"), 3, 500000L)
      .select("a_id", "b_id", "jaccard_ppm").as[(Long, Long, Long)].collect().toSet
    assert(pairs == exact && exact.nonEmpty)
  }

  test("sketches: HLL bounds, CMS overestimates-only, bloom gate never loses new docs") {
    import graft.operators.Sketches
    val df = (1 to 2000).map(i => (s"g${i % 4}", s"v${i % 157}")).toDF("g", "v")
    val hll = Sketches.approxDistinct(df, col("g"), col("v"), rsd = 0.02)
      .select("approx_distinct").as[Long].collect()
    assert(hll.forall(n => n > 140 && n < 175)) // true distinct per group ≈ 157-ish

    val est = Sketches.heavyHitterEstimates(df, "v", Seq("v1", "absent")).toMap
    assert(est("v1") >= 12 && est("absent") >= 0) // CMS never underestimates

    val corpus = (1 to 500).map(i => s"fp$i").toDF("fp")
    val bloom = Sketches.fingerprintBloom(corpus, col("fp"), expected = 500, fpp = 0.01)
    val incoming = ((1 to 100).map(i => s"fp$i") ++ (1 to 100).map(i => s"new$i")).toDF("fp")
    val kept = Sketches.filterKnown(incoming, "fp", bloom).as[String].collect().toSet
    assert(kept.forall(_.startsWith("new")))   // all survivors genuinely new
    assert(kept.size >= 95)                    // ≥ (1-fpp) of the new docs survive
    // null fingerprints pass the gate — they can't be proven known
    val withNull = incoming.unionByName(Seq(Option.empty[String]).toDF("fp"))
    assert(Sketches.filterKnown(withNull, "fp", bloom).filter(col("fp").isNull).count() == 1)

    // novelDocs: bloom-gated EXACT form equals the plain anti-join —
    // the sketch prunes join work but can never change the answer
    val novel = Sketches.novelDocs(incoming, corpus, "fp", bloom)
      .as[String].collect().sorted
    val plain = incoming.join(corpus, Seq("fp"), "left_anti").as[String].collect().sorted
    assert(novel.sameElements(plain))
    assert(novel.length == 100 && novel.forall(_.startsWith("new")))
  }

  test("dot product surfaces mismatched-length vectors as NULL, not a partial sum") {
    import graft.operators.Similarity
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)), (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)))
      .toDF("a", "b")
    val dots = df.select(Similarity.dot(col("a"), col("b"))).as[Option[Double]].collect()
    assert(dots(0).contains(14.0) && dots(1).isEmpty)
  }

  test("chunk dedup keeps the first occurrence corpus-wide and reassembles in order") {
    val df = Seq(
      (1L, "a b c d e f"),   // chunks (k=3): "a b c", "d e f"
      (2L, "a b c x y z"),   // "a b c" is a repeat of doc 1's first chunk
      (3L, "d e f"),         // fully duplicated by doc 1's second chunk
      (4L, "x y z q")        // chunks "x y z" (dup of doc 2's tail chunk) and "q"
    ).toDF("doc_id", "text")
    val out = Dedup.chunkDedup(df, col("doc_id"), col("text"), chunkTokens = 3)
      .select("doc_id", "n_chunks", "n_kept", "deduped_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2L, 2L, "a b c d e f"))) // first occurrences keep everything
    assert(out(2L) == ((2L, 2L, 1L, "x y z")))       // repeated chunk dropped, tail kept
    assert(out(3L) == ((3L, 1L, 0L, "")))            // fully duplicate doc empties out
    assert(out(4L) == ((4L, 2L, 1L, "q")))           // first chunk lost to doc 2, tail kept
  }

  test("duplicated-span stats count positional n-grams corpus-wide") {
    val df = Seq(
      (1L, "a b c d e"),  // 3-gram spans: "a b c", "b c d", "c d e"
      (2L, "a b c q r"),  // shares span "a b c" with doc 1
      (3L, "z z z z z")   // spans "z z z" x3 — duplicated WITHIN the doc
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanStats(df, col("doc_id"), col("text"), n = 3)
      .select("doc_id", "n_spans", "n_dup_spans", "dup_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 1L, 333333L)))
    assert(out(2L) == ((2L, 3L, 1L, 333333L)))
    assert(out(3L) == ((3L, 3L, 3L, 1000000L))) // intra-doc repeats are duplicates too
  }

  test("unicode normalization: NFC composes, NFD decomposes, NFKC folds compat forms") {
    import graft.operators.Text
    // explicit escapes throughout — composed vs decomposed source literals
    // are indistinguishable to a reader: e+U+0301 combining acute, U+FB01 fi
    val df = Seq((1L, "cafe\u0301 \ufb01ne")).toDF("doc_id", "text")
    def norm(form: String): String =
      df.select(Text.unicodeNormalize(col("text"), form)).as[String].collect()(0)
    assert(norm("NFC") == "caf\u00e9 \ufb01ne")  // combining pair fuses; ligature untouched
    assert(norm("NFD") == "cafe\u0301 \ufb01ne") // already decomposed
    assert(norm("NFKC") == "caf\u00e9 fine")      // compat: ligature expands to "fi"
    // idempotent, null-safe, and plan stays scan-local
    val once = df.select(Text.unicodeNormalize(col("text")).as("t"))
    assert(once.select(Text.unicodeNormalize(col("t"))).as[String].collect()(0) == norm("NFC"))
    val withNull = Seq((1L, Option.empty[String])).toDF("doc_id", "text")
    assert(withNull.select(Text.unicodeNormalize(col("text"))).as[Option[String]].collect()(0).isEmpty)
    assert(!once.queryExecution.executedPlan.toString.contains("Exchange"))
    intercept[IllegalArgumentException](norm("NFX"))
  }

  test("text metrics: token counts, ppm ratios, langid, fingerprints") {
    val df = Seq((1L, "The cat and the dog!  Extra   spaces here."))
      .toDF("doc_id", "text")
    val q = Text.qualityMetrics(df, col("text"))
      .select("n_tokens", "alpha_ppm", "stopword_ppm").as[(Long, Long, Long)].collect()(0)
    assert(q._1 == 8)
    assert(q._2 > 0 && q._2 < 1000000)
    val tok = df.select(Text.wsTokenCount(col("text")).as("c")).as[Int].collect()(0)
    assert(tok == 8)
    val lang = df.select(Text.langId(col("text"))).as[String].collect()(0)
    assert(lang == "en")
    val de = Seq((1L, "der hund und die katze ist ein tier")).toDF("doc_id", "text")
    assert(de.select(Text.langId(col("text"))).as[String].collect()(0) == "de")
    // fingerprint is whitespace/case-insensitive
    val fp1 = df.select(Text.fingerprint(col("text"))).as[String].collect()(0)
    val fp2 = Seq((1L, "the cat and the dog! extra spaces here."))
      .toDF("doc_id", "text").select(Text.fingerprint(col("text"))).as[String].collect()(0)
    assert(fp1 == fp2)
  }

  test("URL canonicalization: scheme/www/port/utm/fragment/trailing-slash rules") {
    val cases = Seq(
      // path case PRESERVED while host lowercases; default port drops
      "https://www.Example.com:443/Page/7?utm_source=x#frag" -> "example.com/Page/7",
      "http://example.com/page/7/" -> "example.com/page/7",
      "HTTPS://EXAMPLE.COM/page/7?id=3&utm_campaign=c" -> "example.com/page/7?id=3",
      // every param utm_: leading drops with its '?', interior drops outright
      "https://example.com/page/7?utm_a=1&utm_b=2" -> "example.com/page/7",
      // leading utm promotes the next param to lead
      "https://example.com/page/7?utm_a=1&id=3" -> "example.com/page/7?id=3",
      "http://www.example.com:80" -> "example.com",
      // non-default port and non-utm params survive, in order
      "https://sub.example.com:8080/a?y=2&x=1" -> "sub.example.com:8080/a?y=2&x=1")
    val out = cases.map(_._1).toDF("url")
      .select(Text.canonicalizeUrl(col("url")).as("c")).as[String].collect().toSeq
    assert(out == cases.map(_._2))
  }

  test("gopher gate: each rule flips on its own planted violation") {
    val fifty = Seq.fill(47)("word").mkString(" ")
    val df = Seq(
      (1L, s"the of and $fifty"),                         // 50 words, 3 stop types: pass
      (2L, "the of and word word word"),                  // 6 words: too short
      (3L, s"the of and $fifty ${Seq.fill(20)("#").mkString(" ")}"), // hash-heavy
      (4L, ("the of " + Seq.fill(48)("12345").mkString(" "))), // numeric words
      (5L, fifty + " word word word"))                    // zero stopwords
      .toDF("doc_id", "text")
    val out = Text.gopherQuality(df, col("text"))
      .select("doc_id", "n_words", "symbol_ppm", "alpha_word_ppm", "stop_types", "keep")
      .as[(Long, Long, Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._6, "clean 50-word doc with 3 stopword types must pass")
    assert(out(2L)._2 == 6 && !out(2L)._6)
    assert(out(3L)._3 > 100000L && !out(3L)._6)           // symbol ratio rule
    assert(out(4L)._4 < 800000L && !out(4L)._6)           // alpha-word rule
    assert(out(5L)._5 == 0L && !out(5L)._6)               // stopword floor
    // '...' ellipses count as symbols too, leftmost non-overlapping
    val ell = Seq((9L, s"the of and $fifty ... ... .."))
      .toDF("doc_id", "text")
    val sym = Text.gopherQuality(ell, col("text"))
      .select("symbol_ppm").as[Long].collect()(0)
    assert(sym == math.floor(2 * 1000000.0 / 53).toLong)
  }

  test("c4 clean: each line and page rule flips on its own planted violation") {
    val good = "This line has enough words and ends properly."
    val df = Seq(
      (1L, s"$good\n$good\n$good"),                          // 3 clean lines: keep
      (2L, s"$good\nno terminal punctuation here\n$good\n$good"), // line 2 cut
      (3L, s"$good\nToo short.\n$good\n$good"),              // 2-word line cut
      (4L, s"$good\nPlease enable JavaScript to continue.\n$good\n$good"), // js line cut
      (5L, s"$good\n$good\nCSS layout { display: none }"),   // brace: page drop
      (6L, s"$good\n$good\nLorem Ipsum dolor sit amet."),    // lorem: page drop
      (7L, s"$good\n$good"))                                 // only 2 lines survive
      .toDF("doc_id", "text")
    val out = Text.c4Clean(df, col("text"), minLinesPerDoc = 3)
      .select("doc_id", "cleaned_text", "n_lines", "keep")
      .as[(Long, String, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 == 3 && out(1L)._4)
    assert(out(1L)._2 == s"$good\n$good\n$good") // body rewritten, order kept
    assert(out(2L)._3 == 3 && out(2L)._4 && !out(2L)._2.contains("terminal"))
    assert(out(3L)._3 == 3 && !out(3L)._2.contains("Too short"))
    assert(out(4L)._3 == 3 && !out(4L)._2.contains("JavaScript"))
    // page rules judge the RAW page even though the offending line is cut
    assert(out(5L)._3 == 2 && !out(5L)._4)
    assert(out(6L)._3 == 3 && !out(6L)._4) // lorem line passes line rules
    assert(out(7L)._3 == 2 && !out(7L)._4) // min-lines floor
    // scan-local: the whole cleaner must plan without a single Exchange
    val plan = Text.c4Clean(df, col("text")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"c4Clean planned a shuffle:\n$plan")
  }

  test("gopher repetition: hand-computed metrics on planted structures") {
    // doc 1: "aa bb\naa bb\ncc dd" — the line "aa bb" is duplicated.
    //   lines: 3 total (chars 5+5+5=15), dup occurrences 2 (chars 10)
    //   → dup_line = 666666 ppm, dup_line_char = 666666 ppm; one paragraph
    //   (contains \n but no \n\n) → dup_para = 0.
    //   tokens: aa bb aa bb cc dd (12 cp). top 2-gram: "aa bb" ×2, mass
    //   2·4=8 → 666666 ppm; "bb aa" ×1 loses. top 3-gram: count 1 each,
    //   tie breaks to smallest bytes "aa bb aa" mass 6 → 500000 ppm.
    val df = Seq(
      (1L, "aa bb\naa bb\ncc dd"),
      (2L, "pp qq\n\npp qq\n\nrr ss"), // duplicated PARAGRAPH (and line)
      (3L, "u v w x y z u v w x y z") // dup 5/6-grams from a repeated run
    ).toDF("doc_id", "text")
    val names = Seq("dup_line_ppm", "dup_line_char_ppm", "dup_para_ppm",
      "dup_para_char_ppm", "top_2gram_ppm", "top_3gram_ppm", "top_4gram_ppm",
      "dup_5gram_ppm", "dup_6gram_ppm", "dup_7gram_ppm", "dup_8gram_ppm",
      "dup_9gram_ppm", "dup_10gram_ppm")
    val out = Text.gopherRepetition(df, col("text"))
      .select("doc_id", names: _*).collect()
      .map(r => r.getLong(0) -> names.zipWithIndex.map { case (n, i) => n -> r.getLong(i + 1) }.toMap)
      .toMap
    assert(out(1L)("dup_line_ppm") == 666666L)
    assert(out(1L)("dup_line_char_ppm") == 666666L)
    assert(out(1L)("dup_para_ppm") == 0L)
    assert(out(1L)("top_2gram_ppm") == 666666L)
    assert(out(1L)("top_3gram_ppm") == 500000L)
    // doc 2: paragraphs pp qq | pp qq | rr ss → dup 2/3 paras, chars 10/15
    assert(out(2L)("dup_para_ppm") == 666666L)
    assert(out(2L)("dup_para_char_ppm") == 666666L)
    assert(out(2L)("dup_line_ppm") == 666666L) // \n\n split leaves dup lines too
    // doc 3: 12 single-char tokens, the 6-token run repeats once.
    //   5-grams: 8 total; "u v w x y" and "v w x y z" each appear twice →
    //   dup mass 4·5=20 over 12 token chars → 1666666 ppm (mass counts
    //   every occurrence; the ppm is a mass ratio, not a probability).
    //   6-grams: "u v w x y z" ×2 → mass 12 → 1000000 ppm. 7-grams: all
    //   distinct → 0.
    assert(out(3L)("dup_5gram_ppm") == 1666666L)
    assert(out(3L)("dup_6gram_ppm") == 1000000L)
    assert(out(3L)("dup_7gram_ppm") == 0L)
    // gate: a clean doc keeps, the planted-repetition docs drop
    val keeps = Text.gopherRepetition(df, col("text"))
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
    assert(!keeps(1L) && !keeps(2L) && !keeps(3L))
    val clean = Seq((9L, (1 to 60).map(i => s"w$i").mkString(" ") + ".")).toDF("doc_id", "text")
    assert(Text.gopherRepetition(clean, col("text"))
      .select("keep").as[Boolean].collect()(0))
    // scan-local, single kernel evaluation
    val plan = Text.gopherRepetition(df, col("text")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gopherRepetition planned a shuffle:\n$plan")
    assert("repetition_stats".r.findAllIn(plan).size <= 1,
      s"repetition_stats kernel inlined into multiple columns:\n$plan")
  }

  test("semantic dedup drops within-cluster near-dups, keeps cross-cluster pairs") {
    // two axis clusters; 14/15 are a TRUE near-dup pair split across the
    // cluster boundary — SemDeDup's documented recall trade keeps both
    val corpus = Seq(
      (10L, Seq(0.90f, 0.10f)), (11L, Seq(0.91f, 0.09f)), // near-dups, cluster 0
      (12L, Seq(0.10f, 0.95f)),                           // lone member, cluster 1
      (14L, Seq(0.70f, 0.71f)), (15L, Seq(0.71f, 0.70f))  // near-dups across clusters
    ).toDF("vec_id", "embedding")
    val centroids = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "cvec")
    val out = Dedup.semanticDedup(corpus, col("vec_id"), col("embedding"), centroids, 0.95)
      .select("vec_id", "centroid_id", "kept")
      .as[(Long, Long, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(10L) == (0L, true) && out(11L) == (0L, false)) // 11 loses to smaller id 10
    assert(out(12L) == (1L, true))
    assert(out(14L) == (1L, true) && out(15L) == (0L, true)) // split pair: both kept
    // sanity: the pair really is above threshold when compared exactly
    val sim = Dedup.embeddingNearDupPairs(
      corpus.filter(col("vec_id") >= 14L), col("vec_id"), col("embedding"), 0.95).count()
    assert(sim == 1L)
  }

  test("native gopher stats ≡ the regex/HOF composition on adversarial inputs") {
    // the kernel replaces split(trim)/regexp_replace/lambda-filter exactly —
    // including the split(-1) empty-token artifacts, trim-strips-only-0x20,
    // ASCII-only \s and [A-Za-z], codepoint (not byte) counting, and
    // leftmost non-overlapping '...' consumption
    val adversarial = Seq(
      "", " ", "   ", "\t", " \t ", "a", " a ", "\ta\t",
      "the them theater be to of and that have with",
      "The THE the",                        // token equality is case-sensitive
      "h\u00e9llo w\u00f6rld \u4f60\u597d", // multibyte; CJK has no ASCII alpha
      "\ud83d\ude00 emoji only",            // astral plane (4-byte UTF-8)
      "a.b ... .... ..... ......",          // ellipsis boundary cases
      "## #tag # ...",
      "12345 67890 the",
      "word\u00a0word",                     // NBSP is NOT Java \s — one token
      "tab\tsep\nlines\rand\u000bmore\fws",
      "trailing space ", " leading", "dots... end...")
    val rnd = new scala.util.Random(7)
    val alphabet = "ab .\t#\n\u00e9\u4e16."
    val fuzz = (0 until 200).map(_ => (0 until rnd.nextInt(30)).map(_ =>
      alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (adversarial ++ fuzz).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val cols = Seq("doc_id", "n_words", "mean_word_len_ppm", "symbol_ppm",
      "alpha_word_ppm", "stop_types")
    val native = Text.gopherQuality(df, col("text"), minStopTypes = 1)
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    val composed = Text.gopherQualityComposed(df, col("text"))
      .select(cols.head, cols.tail: _*).orderBy("doc_id").collect().toSeq
    assert(native == composed)
    // the kernel must evaluate ONCE per row, not once per derived column
    val plan = Text.gopherQuality(df, col("text")).queryExecution.executedPlan.toString
    assert("gopher_stats".r.findAllIn(plan).size <= 1,
      s"gopher_stats kernel inlined into multiple columns:\n$plan")
  }

  test("semantic dedup: block-salted pair join is output-invariant for any B") {
    // 200 deterministic pseudo-random vectors, 4 centroids; the block salt
    // changes ONLY how pairs distribute over tasks, never which pairs are
    // compared — B=1 (single key per cluster) must equal B=7 (salted) and
    // the auto default exactly, including every kept flag
    val corpus = spark.range(0, 200).select(col("id").as("vec_id"),
      array((0 until 4).map(j =>
        (pmod(xxhash64(col("id") * 31 + lit(j)), lit(1000)).cast("double") / 500.0 - 1.0)
          .cast("float")): _*).as("embedding"))
    val centroids = spark.range(0, 4).select(col("id").as("centroid_id"),
      array((0 until 4).map(j =>
        when(col("id") === j, lit(1.0)).otherwise(lit(0.0))): _*).as("cvec"))
    def run(b: Int) = Dedup.semanticDedup(
        corpus, col("vec_id"), col("embedding"), centroids, 0.9, blocks = b)
      .orderBy("vec_id").as[(Long, Long, Boolean)].collect().toSeq
    val base = run(1)
    assert(base.exists(!_._3) && base.exists(_._3), "fixture must have dups and survivors")
    assert(run(7) == base)
    assert(run(0) == base) // 0 normalizes to the default
  }

  test("bounded top-k aggregate ≡ row_number window on randomized inputs") {
    // TopKByScoreAgg's heap eviction, serde, and merge paths must preserve
    // the exact (score desc, id asc) total order the windows it replaced
    // used — checked against the window form on seeded random data with
    // deliberate score TIES (small integer grid) and many partitions so
    // partial buffers actually merge
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { i =>
      (rnd.nextInt(40).toLong, (rnd.nextInt(12) / 3.0), i.toLong)
    }
    val df = rows.toDF("grp", "score", "id").repartition(13)
    for (k <- Seq(1, 3, 17)) {
      val agg = df.groupBy("grp")
        .agg(Similarity.topKByScore(col("score"), col("id"), k).as("__tk"))
        .select(col("grp"), explode(col("__tk")).as("__e"))
        .select(col("grp"), col("__e.id").as("id"), col("__e.score").as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("grp")).orderBy(col("score").desc, col("id"))
      val win = df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k)
        .select("grp", "id", "score")
      assert(agg.count() == win.count(), s"k=$k row counts differ")
      assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
        s"k=$k top-k sets differ from the window form")
    }
    // groups smaller than k return all members; empty input returns no rows
    val tiny = Seq((1L, 0.5, 10L), (1L, 0.5, 11L)).toDF("grp", "score", "id")
    val got = tiny.groupBy("grp")
      .agg(Similarity.topKByScore(col("score"), col("id"), 100).as("t"))
      .select(size(col("t"))).as[Int].collect()
    assert(got.toSeq == Seq(2))
  }

  test("native token count ≡ the trim/regexp/split/size composition") {
    // WsTokenCountExpr must reproduce the split-based value on every edge:
    // empty string (→1, the split artifact), all-whitespace (→1), leading/
    // trailing runs, every Java-\s char including vertical tab, multi-byte
    // UTF-8 (whose continuation bytes must never read as whitespace)
    val fixtures = Seq("", " ", " \t\n\f\r ", "one", " one ", "a b",
      "a\tb\nc", "a  b\t\t c", "日本語 テスト", "ünï code", "a b",
      "xy", "  many   runs  of   space  ")
    val rnd = new scala.util.Random(11)
    val alphabet = "ab \t\n\f\r日ü"
    val random = (1 to 300).map(_ =>
      Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    val df = (fixtures ++ random).zipWithIndex.map(_.swap).toDF("id", "s")
    val bad = df.select(col("id"), Text.tokenCount(col("s")).as("a"),
        size(split(trim(regexp_replace(col("s"), "\\s+", " ")), " ")).cast("long").as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.isEmpty, "native token count diverges from the composition")
    // NULL passes through
    val n = Seq((1, null: String)).toDF("id", "s")
      .select(Text.tokenCount(col("s"))).collect()(0)
    assert(n.isNullAt(0))
  }

  test("native span-hash kernel ≡ the transform/slice/array_join composition") {
    // PosSpanHashExpr replaces the interpreted per-span build the DuckDB
    // oracles mirror — it must be bit-identical on every edge the old form
    // produced: docs shorter than n (ONE truncated span), empty docs, null
    // tokens (vanish with their separator, array_join semantics), multi-byte
    // UTF-8, and adjacent empty strings (separator still emitted)
    import org.apache.spark.sql.GraftBridge
    val rnd = new scala.util.Random(7)
    val words = Vector("fox", "ünïcode", "日本語", "", "a", "longer-token", "x1")
    val rows = (1 to 200).map { i =>
      val len = rnd.nextInt(12) // includes 0-length docs
      val toks = Seq.fill(len) {
        if (rnd.nextInt(10) == 0) null else words(rnd.nextInt(words.size))
      }
      (i.toLong, toks)
    }
    val df = rows.toDF("id", "toks").repartition(5)
    for (n <- Seq(1, 3, 7)) {
      val native = GraftBridge.toCol(
        graft.functions.PosSpanHashExpr(GraftBridge.toExpr(col("toks")), n))
      val idx = sequence(lit(0), greatest(size(col("toks")) - n, lit(0)))
      val composed = transform(idx, i =>
        xxhash64(array_join(slice(col("toks"), i + 1, lit(n)), " ")))
      val bad = df.select(col("id"), native.as("a"), composed.as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(bad.isEmpty, s"n=$n: native span hashes diverge from the composition")
    }
  }

  test("bm25: hand-computed score on a tiny corpus; floor margin clears the ln error bound") {
    // 1) exactness on a corpus small enough to compute by hand: three docs,
    // query term "hash" appears 2× in doc0 (dl 4), 1× in doc2 (dl 2)
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bm25").toString
    Seq(
      (0L, "hash join hash scan", "en", "w", 19L),
      (1L, "sort merge", "en", "w", 10L),
      (2L, "hash agg", "en", "w", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_bm25")(spark, dir)
      .orderBy(col("doc_id")).as[(Long, Long, Long)].collect()
    def bm25(tf: Long, df: Long, dl: Long, nDocs: Long, avgdl: Double): Long = {
      val x = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
      math.floor(1000000.0 * x).toLong
    }
    val avgdl = (4 + 2 + 2) / 3.0
    assert(rows.toSeq == Seq(
      (0L, bm25(2, 2, 4, 3, avgdl), 1L),
      (2L, bm25(1, 2, 2, 3, avgdl), 1L)))
    // doc0 (tf 2) must outrank doc2 (tf 1) even with its longer dl here
    assert(bm25(2, 2, 4, 3, avgdl) > bm25(1, 2, 2, 3, avgdl))

    // 2) ln is the score's only transcendental; engines may differ ~1 ulp.
    // floor(1e6·score) is engine-identical as long as no (tf, df, dl)
    // combination on the REAL gate corpus sits within that distance of an
    // integer boundary — measure the actual margin (dsir precedent).
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val toks = docs.select(col("doc_id"),
      split(graft.operators.Text.normalized(col("text")), " ").as("toks"))
    val statsRow = toks.agg(count(lit(1)), avg(size(col("toks")))).head
    val (nDocs, avg2) = (statsRow.getLong(0), statsRow.getDouble(1))
    val tfTable = toks
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin("stream", "hash", "vector"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"), max("dl").as("dl"))
    val dfTable = tfTable.groupBy("term").agg(count(lit(1)).as("df"))
    val triples = tfTable.join(dfTable, "term")
      .select(col("tf"), col("df"), col("dl")).distinct()
      .as[(Long, Long, Long)].collect()
    val minDist = triples.map { case (tf, df, dl) =>
      val x = math.log((nDocs - df + 0.5) / (df + 0.5) + 1.0) * (tf * 2.2) /
        (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avg2)) * 1000000.0
      math.abs(x - math.rint(x))
    }.min
    assert(minDist > 1e-4, f"bm25 floor margin too thin: $minDist%.3e")
  }

  test("jaccardJoin: exact values, threshold boundary, and the adversarial " +
      "common-tokens-shared case all match the all-pairs form") {
    // d0/d1: 9 shared of 11 union → 818181 ppm; d2 ≡ d0 → 1000000;
    // d4/d5 share ONLY the corpus-common tokens (the rare ones differ) —
    // the case a naive shared-rare-token blocking would miss; prefix
    // soundness must still surface it
    val rows = Seq(
      0L -> "a b c d e f g h i j",
      1L -> "a b c d e f g h i k",
      2L -> "a b c d e f g h i j",
      3L -> "x y z",
      4L -> "a b c d e r1",
      5L -> "a b c d e r2")
    val df = rows.toDF("doc_id", "text").repartition(3)
    def run(ppm: Long) = Dedup.jaccardJoin(df, col("doc_id"),
        split(col("text"), " "), ppm)
      .select("a_id", "b_id", "jaccard_ppm").as[(Long, Long, Long)].collect().toSet
    // brute-force expected from word sets
    def brute(ppm: Long) = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      a = sa.split(" ").toSet; b = sb.split(" ").toSet
      i = (a intersect b).size.toLong; u = (a union b).size.toLong
      j = i * 1000000L / u if j >= ppm
    } yield (ia, ib, j)).toSet
    for (ppm <- Seq(500000L, 700000L, 818181L, 818182L, 999999L)) {
      assert(run(ppm) == brute(ppm), s"mismatch at ppm=$ppm")
    }
    // at the boundary the J=9/11 pairs are INCLUDED...
    assert(run(818181L).map(p => (p._1, p._2)).contains((0L, 1L)))
    // ...one ppm above, only the exact-dup pair survives from that family
    assert(run(818182L).map(p => (p._1, p._2)) == Set((0L, 2L)))
    // the common-tokens-shared pair (J = 5/7 = 714285 ppm) is found
    assert(run(700000L).map(p => (p._1, p._2)).contains((4L, 5L)))
    intercept[IllegalArgumentException] {
      Dedup.jaccardJoin(df, col("doc_id"), split(col("text"), " "), 1000000L)
    }
    // shingle sets through the same kernel: the near-dup pair (one-token
    // edit) survives at θ=0.5, the unrelated doc never pairs
    val sh = Dedup.jaccardJoin(df.limit(4), col("doc_id"),
        Dedup.shingles(col("text"), 3), 200000L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(sh.contains((0L, 2L)) && !sh.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("editDistance1Pairs ≡ all-pairs levenshtein filter, transpositions excluded") {
    val rows = Seq(
      1L -> "kitten", 2L -> "mitten", // substitution: dist 1
      3L -> "kitte", // deletion of 1: dist 1
      4L -> "kittens", // insertion on 1: dist 1
      5L -> "kitten", // identical to 1: dist 0
      6L -> "ab", 7L -> "ba", // transposition: dist 2, must NOT pair
      8L -> "xyzzy") // unrelated
    val df = rows.toDF("id", "name").repartition(4)
    val got = graft.operators.Dedup
      .editDistance1Pairs(df, col("id"), col("name"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (for {
      (ia, sa) <- rows; (ib, sb) <- rows if ia < ib
      if levenshteinDist(sa, sb) <= 1
    } yield (ia, ib)).toSet
    assert(got == want)
    assert(want.contains((1L, 2L)) && want.contains((1L, 5L)) &&
      !want.contains((6L, 7L)))
  }

  test("knnGraph keeps only MUTUAL top-k edges (hub one-way edges drop)") {
    // k=1 fixture engineered so every directed-edge fate appears:
    //   hub(0)→b(2) and b→hub reciprocate → the ONLY mutual edge;
    //   a(1)→b is one-way (b prefers the hub); c(3)→a is one-way (a
    //   prefers b). A symmetrization that unions instead of intersecting
    //   would emit 3 edges here — the spec pins exactly one.
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), // hub
      (1L, Array(0.9f, 0.1f)), // a: top-1 = b (cos .9984 beats hub .9939)
      (2L, Array(0.95f, 0.05f)), // b: top-1 = hub (.9986 beats a .9984)
      (3L, Array(0.0f, 1.0f))) // c: top-1 = a (.1104) — unreciprocated
      .toDF("vec_id", "embedding")
    val got = Similarity.knnGraph(vecs, col("vec_id"), col("embedding"), 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 2L)))
    // k large enough to make every pair mutual → full undirected graph
    val all = Similarity.knnGraph(vecs, col("vec_id"), col("embedding"), 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(all == (for { i <- 0L to 3L; j <- i + 1 to 3L } yield (i, j)).toSet)
  }

  test("knnGraphIvf links within cells only; cross-cell near pair invisible") {
    // two clean clusters around the axes; v4=(0.8,0.6) falls in cell 0,
    // v5=(0.6,0.8) in cell 1, yet they are each other's GLOBAL nearest
    // neighbor (cos .96) — the exact graph links them, the IVF-restricted
    // graph cannot (the standard IVF trade, pinned here), while the
    // within-cell mutual pairs come out identically in both forms
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (4L, Array(0.8f, 0.6f)),
      (1L, Array(0.0f, 1.0f)), (3L, Array(0.1f, 0.9f)),
      (5L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val cents = Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0)))
      .toDF("centroid_id", "cvec")
    val exact = Similarity.knnGraph(vecs, col("vec_id"), col("embedding"), 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact == Set((0L, 2L), (1L, 3L), (4L, 5L)))
    val ivf = Similarity.knnGraphIvf(vecs, col("vec_id"), col("embedding"),
        cents, 1)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(ivf == Set((0L, 2L), (1L, 3L)))
    // MULTIPROBE recovers the boundary edge the single-cell form lost:
    // with p = 2 each vector also queries its second-nearest cell, so
    // (4, 5) re-materializes while within-cell edges are unchanged
    val mp = Similarity.knnGraphIvfMultiprobe(vecs, col("vec_id"),
        col("embedding"), cents, 1, probes = 2)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(mp == exact)
  }

  test("knnGraphIvfMultiprobe recall >= 95% at c=sqrt(n), p=3 in the CLUSTERED regime") {
    // the scale-claim gate for the production configuration: IVF's recall
    // contract is conditional on cluster structure (that IS the trade), so
    // the >= 95% pin runs on a corpus that HAS it — 20 tight clusters of 20
    // (within-cluster cos ~0.98, cross-cluster at the noise floor), where
    // every exact mutual-top-5 edge is within-cluster. The sqrt(n)-derived
    // strided codebook (n = 400 -> c = 20, stride = 20, one seed per
    // cluster with cluster-major ids) + probes = 3 must retain >= 95% of
    // exact edges. The gate corpus's own regime (noise-floor top-k) is
    // pinned separately below.
    val rnd = new scala.util.Random(42)
    val dim = 16
    val centers = Array.fill(20)(Array.fill(dim)(rnd.nextGaussian()))
    val rows = for {
      cl <- 0 until 20
      m <- 0 until 20
    } yield {
      val noise = Array.fill(dim)(rnd.nextGaussian() * 0.05)
      val v = centers(cl).zip(noise).map { case (a, b) => (a + b).toFloat }
      ((cl * 20 + m).toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val n = 400L
    val c = math.floor(math.sqrt(n.toDouble)).toLong // 20
    val stride = n / c // 20: vec_id % 20 == 0 -> the first member of each cluster
    val cents = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("centroid_id"),
        Similarity.asDouble(col("embedding")).as("cvec"))
    val exact = Similarity.knnGraph(emb, col("vec_id"), col("embedding"), 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val mp = Similarity.knnGraphIvfMultiprobe(emb, col("vec_id"),
        col("embedding"), cents, 5, probes = 3)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    val recall = mp.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.95, s"recall $recall (${mp.intersect(exact).size}/${exact.size})")
  }

  test("knnGraphIvfMultiprobe at the noise floor: pool-bound recall, p=c exact") {
    // the honest other half of the recall contract, on the REAL gate
    // corpus: its exact mutual-top-5 edges sit at cos 0.26-0.44 with label
    // agreement at chance (10.7%, 10 labels) — isotropic noise at top-k
    // rank, where NO space partition co-locates neighbors (the standing
    // "no quantizer is rank-selective at the cosine noise floor" finding,
    // same as hyperplane LSH at t=0.4 and PQ/ADC). Pinned: (1) the
    // selective configuration (c = sqrt(n), p = 3) stays BELOW 50% recall
    // — anyone re-tuning the gate row toward a recall claim on this corpus
    // trips this; (2) probing is monotone (p = 8 beats p = 3); (3) probing
    // ALL cells reproduces the exact graph EDGE-FOR-EDGE — structural
    // exactness of the decomposition, independent of data distribution.
    val dir = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val c = math.max(1L, math.floor(math.sqrt(n.toDouble)).toLong)
    val stride = math.max(1L, n / c) // 22 -> 23 strided centroids at n=500
    val cents = emb.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("centroid_id"),
        Similarity.asDouble(col("embedding")).as("cvec"))
    val nCents = cents.count().toInt
    val exact = Similarity.knnGraph(emb, col("vec_id"), col("embedding"), 5)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    def mpEdges(p: Int) = Similarity.knnGraphIvfMultiprobe(emb, col("vec_id"),
        col("embedding"), cents, 5, probes = p)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    def recall(s: Set[(Long, Long)]) = s.intersect(exact).size.toDouble / exact.size
    val r3 = recall(mpEdges(3))
    val r8 = recall(mpEdges(8))
    assert(r3 < 0.5, s"noise-floor recall unexpectedly high: $r3 — corpus regime changed?")
    assert(r8 > r3, s"probing not monotone: p=8 $r8 <= p=3 $r3")
    assert(mpEdges(nCents) == exact, "probing all cells must reproduce the exact graph")
  }

  private def levenshteinDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
