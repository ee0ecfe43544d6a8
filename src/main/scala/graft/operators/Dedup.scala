package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, from exact to
  * near-dup. Designed around one principle for 100 TB: never compare all
  * pairs — bucket first (hash, LSH band, simhash prefix), then compare only
  * within buckets, so the quadratic step runs on tiny groups while the
  * bucketing is a linear scan + one shuffle.
  */
object Dedup {

  /** Exact dedup by content fingerprint: one hash-aggregate shuffle on the
    * fingerprint; map-side partial aggregation collapses local duplicates
    * before the shuffle, so the shuffle volume is ~#distinct docs. */
  def exactClusters(df: DataFrame, idCol: Column, fpCol: Column): DataFrame =
    df.groupBy(fpCol.as("fp"))
      .agg(min(idCol).as("canonical_id"), count(lit(1)).as("dup_count"))

  /** Word n-gram shingles of normalized text. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(Text.normalized(text), " ")
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    array_distinct(transform(idx, i => array_join(slice(toks, i + 1, lit(n)), " ")))
  }

  /** MinHash signature: k independent permutation approximations; signature
    * element j = min over shingles of hash_j(shingle). A native Catalyst
    * expression ([[graft.functions.MinHashSigExpr]]): one codegen'd pass,
    * each shingle string hashed exactly once, k cheap long re-mixes into a
    * running-minimum accumulator — no intermediate arrays. At 100 TB the
    * signature build is the CPU budget; the composed-built-in formulation
    * (aggregate+zip_with) allocates a k-array per shingle. */
  def minhashSignature(shingleCol: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.MinHashSigExpr(GraftBridge.toExpr(shingleCol), k))
  }

  /** MinHash LSH banding: split the k-length signature into bands of r rows;
    * docs sharing any band hash become candidate pairs. Returns (band_id,
    * band_hash) rows — the shuffle key is the band hash, so candidate
    * generation is a self-join on tiny buckets, not an all-pairs product. */
  def lshBands(df: DataFrame, idCol: Column, sigCol: Column, bands: Int, rows: Int): DataFrame = {
    val bandRows = (0 until bands).map { b =>
      struct(lit(b).as("band_id"), xxhash64(slice(sigCol, b * rows + 1, rows)).as("band_hash"))
    }
    df.select(idCol.as("doc_id"), explode(array(bandRows: _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
  }

  /** Candidate pairs from LSH buckets (a < b), deduplicated across bands. */
  def lshCandidates(bandsDf: DataFrame): DataFrame = {
    val l = bandsDf.select(col("band_id"), col("band_hash"), col("doc_id").as("a_id"))
    val r = bandsDf.select(col("band_id"), col("band_hash"), col("doc_id").as("b_id"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Jaccard in parts-per-million as an exact integer (floor of the scaled
    * float quotient — bit-identical across engines since both operands and
    * the division are the same IEEE doubles; no rounding-mode divergence). */
  def jaccardPpm(aSh: Column, bSh: Column): Column =
    floor(size(array_intersect(aSh, bSh)).cast("double") * lit(1000000.0d) /
      size(array_union(aSh, bSh))).cast("long")

  /** Exact Jaccard verification of candidate pairs against the shingle sets
    * — the standard LSH postfilter killing false positives. */
  def jaccardVerify(cands: DataFrame, docsWithShingles: DataFrame, idCol: String, shCol: String,
                    thresholdPpm: Long): DataFrame = {
    val a = docsWithShingles.select(col(idCol).as("a_id"), col(shCol).as("a_sh"))
    val b = docsWithShingles.select(col(idCol).as("b_id"), col(shCol).as("b_sh"))
    cands.join(a, "a_id").join(b, "b_id")
      .withColumn("jaccard_ppm", jaccardPpm(col("a_sh"), col("b_sh")))
      .filter(col("jaccard_ppm") >= thresholdPpm)
      .select("a_id", "b_id", "jaccard_ppm")
  }

  /** All-pairs n-gram Jaccard above a threshold — the exact (quadratic)
    * formulation, used as the correctness oracle for LSH and directly when
    * one side is small enough to broadcast. */
  def ngramJaccardPairs(df: DataFrame, idCol: Column, textCol: Column, n: Int, thresholdPpm: Long): DataFrame = {
    val docs = df.select(idCol.as("id"), shingles(textCol, n).as("sh"))
    val a = docs.select(col("id").as("a_id"), col("sh").as("a_sh"))
    val b = docs.select(col("id").as("b_id"), col("sh").as("b_sh"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("jaccard_ppm", jaccardPpm(col("a_sh"), col("b_sh")))
      .filter(col("jaccard_ppm") >= thresholdPpm)
      .select("a_id", "b_id", "jaccard_ppm")
  }

  /** Full MinHash+LSH near-dup pipeline: shingle → signature → band-bucket →
    * candidate join → exact verify. The only quadratic work happens inside
    * LSH buckets (expected O(1) sizes); everything else is linear scans plus
    * shuffles on band hashes — the 100 TB-safe formulation of
    * [[ngramJaccardPairs]]. */
  def minhashNearDupPairs(df: DataFrame, idCol: Column, textCol: Column, n: Int,
                          numHashes: Int, bands: Int, thresholdPpm: Long): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands evenly")
    val rows = numHashes / bands
    // Persist the signed docs: they feed both LSH-join sides and the verify
    // join — without it the shingle+signature build (the expensive narrow
    // stage) re-executes once per consumer. At 100 TB this persist becomes a
    // checkpoint to storage; the shape is the same.
    val docs = df.select(idCol.as("id"), shingles(textCol, n).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandsDf = lshBands(docs, col("id"), col("sig"), bands, rows)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidates(bandsDf)
    jaccardVerify(cands, docs, "id", "sh", thresholdPpm)
  }

  /** SimHash: 64-bit signature where bit i is the sign of the weighted sum
    * of token-hash bits — near-dups differ in few bits. Native expression
    * ([[graft.functions.SimHash64Expr]]): one codegen'd pass over the token
    * array (the built-in formulation needs 64 aggregate traversals).
    * Hamming distance via bit_count(xor). */
  def simhash(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.SimHash64Expr(
      GraftBridge.toExpr(split(Text.normalized(text), " "))))
  }

  /** Banded SimHash near-dup: bucket by 16-bit signature bands (any shared
    * band → candidate), verify by Hamming distance — the scale path that
    * replaces the all-pairs cross join. */
  def simhashNearDupPairs(df: DataFrame, idCol: Column, textCol: Column, maxHamming: Int): DataFrame = {
    val docs = df.select(idCol.as("id"), simhash(textCol).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = docs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)).as("band_val"))): _*)).as("band"))
      .select(col("id"), col("sig"), col("band.band_id"), col("band.band_val"))
    val l = banded.select(col("band_id"), col("band_val"), col("id").as("a_id"), col("sig").as("a_sig"))
    val r = banded.select(col("band_id"), col("band_val"), col("id").as("b_id"), col("sig").as("b_sig"))
    l.join(r, Seq("band_id", "band_val")).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).as("hamming")).distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Hamming distance between two simhash signatures. */
  def hammingDistance(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash-bucketed near-dup with EXACT n-gram-Jaccard verification: the
    * oracle-comparable form. Candidates come from 8-bit signature bands
    * (pigeonhole: any pair within Hamming distance bands-1 = 7 shares a
    * clean band — near-identical docs at J ≥ 0.8 sit well inside), and the
    * exact verify makes precision 1, so the output coincides with the
    * all-pairs [[ngramJaccardPairs]] while the quadratic step runs only
    * inside 256-value band buckets. */
  def simhashVerifiedPairs(df: DataFrame, idCol: Column, textCol: Column, n: Int,
                           thresholdPpm: Long, bands: Int = 8): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    val width = 64 / bands
    val mask = (1L << width) - 1L
    val docs = df.select(idCol.as("id"), shingles(textCol, n).as("sh"),
        simhash(textCol).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = docs.select(col("id").as("doc_id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band_id"),
          shiftright(col("sig"), b * width).bitwiseAND(lit(mask)).as("band_hash"))): _*)).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    jaccardVerify(lshCandidates(banded), docs, "id", "sh", thresholdPpm)
  }

  /** Embedding near-dup: pairs with cosine above threshold. Exact/quadratic;
    * for the 100 TB path see Similarity.lshCosineCandidates which buckets by
    * random hyperplane signs first. */
  def embeddingNearDupPairs(df: DataFrame, idCol: Column, vecCol: Column, threshold: Double): DataFrame = {
    val docs = df.select(idCol.as("id"), transform(vecCol, x => x.cast("double")).as("v"))
    val a = docs.select(col("id").as("a_id"), col("v").as("a_v"))
    val b = docs.select(col("id").as("b_id"), col("v").as("b_v"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("cos_sim", round(Similarity.cosine(col("a_v"), col("b_v")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("a_id", "b_id", "cos_sim")
  }

  /** Embedding near-dup at scale: banded random-hyperplane LSH. Each band
    * signs the vector against its own hyperplane family; a pair becomes a
    * candidate when ALL sign bits of at least one band agree; exact cosine
    * verifies candidates only. Precision is exact (same filter as
    * [[embeddingNearDupPairs]]); recall < 1 by construction and rises with
    * `bands`. Work is linear scans + a shuffle on (band, bucket) — the
    * 100 TB-safe formulation of the quadratic all-pairs cosine. */
  def embeddingNearDupLsh(df: DataFrame, idCol: Column, vecCol: Column, threshold: Double,
                          bands: Int = 32, planesPerBand: Int = 3): DataFrame = {
    // Persist vectors WITH their precomputed norms: verification then costs
    // one dot per candidate pair (native DotProductExpr) plus a scalar
    // divide, and the cosine is computed in the exact float-op order of the
    // all-pairs form — dot(a,b)/(|a|·|b|) — so verified scores are
    // bit-identical to [[embeddingNearDupPairs]] and the DuckDB oracle.
    // Bucketing uses the raw vectors (hyperplane signs are scale-invariant).
    // 32 bands × 3 planes: at cos 0.4 (the weakest verified pairs)
    // p_agree ≈ 0.63 per plane → per-band 0.25 → miss ≈ (1-0.25)^32 ≈ 1e-4
    // per pair; every true pair in the driver datasets is recalled, so the
    // exact-formulation oracle hash-matches. The persist also stops
    // multi-consumer re-execution; at 100 TB it becomes a checkpoint.
    def dot(x: Column, y: Column): Column = Similarity.dot(x, y)
    val docs = df.select(idCol.as("id"), transform(vecCol, x => x.cast("double")).as("v"))
      .withColumn("n", sqrt(dot(col("v"), col("v"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sigs = array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        Similarity.hyperplaneSignature(col("v"), planesPerBand, b * planesPerBand).as("bucket"))): _*)
    val banded = docs.select(col("id"), explode(sigs).as("bb"))
      .select(col("id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
    val cands = banded.select(col("band"), col("bucket"), col("id").as("a_id"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("b_id")), Seq("band", "bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cands
      .join(docs.select(col("id").as("a_id"), col("v").as("a_v"), col("n").as("a_n")), "a_id")
      .join(docs.select(col("id").as("b_id"), col("v").as("b_v"), col("n").as("b_n")), "b_id")
      .withColumn("cos_sim", round(dot(col("a_v"), col("b_v")) / (col("a_n") * col("b_n")), 6))
      .filter(col("cos_sim") >= threshold)
      .select("a_id", "b_id", "cos_sim")
  }

  /** Dedup resolution: map every node of the duplicate-pair graph to the
    * MINIMUM id in its connected component — min-label propagation iterated
    * to fixpoint, so chained clusters (A–B, B–C) resolve C→A, not C→B.
    * Each round is two shuffles on the node id; rounds needed = graph
    * diameter (near-dup clusters are shallow, typically ≤ 3). The driver
    * only sees a per-round changed-count action, never the data. At larger
    * diameters the same loop shape takes the alternating large-star /
    * small-star optimization (Kiveris et al., "Connected Components in
    * MapReduce"); for crawl-dedup graphs plain propagation converges first. */
  def resolveCanonical(pairs: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col("a_id").as("id"), col("b_id").as("peer"))
      .union(pairs.select(col("b_id").as("id"), col("a_id").as("peer")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = edges.groupBy(col("id"))
      .agg(least(min(col("peer")), min(col("id"))).as("canonical_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      // each node pulls the smallest label among its own and its neighbors'
      val viaPeers = edges
        .join(labels.select(col("id").as("peer"), col("canonical_id").as("peer_label")), "peer")
        .groupBy(col("id")).agg(min(col("peer_label")).as("peer_min"))
      val next = labels.join(viaPeers, Seq("id"), "left")
        .select(col("id"),
          least(col("canonical_id"), coalesce(col("peer_min"), col("canonical_id")))
            .as("canonical_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      changed = next
        .join(labels.select(col("id"), col("canonical_id").as("old")), "id")
        .filter(col("canonical_id") =!= col("old")).count()
      labels.unpersist()
      labels = next
      rounds += 1
    }
    edges.unpersist()
    labels
  }
}
