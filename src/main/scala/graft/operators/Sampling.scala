package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and sequence-packing operators for training-data
  * pipelines: dataset mixing (per-source rates), stratified subsampling, and
  * token-budget packing. All decisions are pure functions of the row key via
  * md5 — no RNG state, no seed coordination, identical results on any
  * cluster layout, task retry, or engine (md5 is md5 everywhere, which also
  * makes every operator here oracle-checkable against DuckDB verbatim).
  *
  * 100 TB posture: sampling is a scan-local filter (no shuffle, pushable
  * below joins); packing is one window per shard ordered by id — the shard
  * column bounds the sort, so packing parallelizes by shard exactly like
  * the training job that consumes the bins.
  */
object Sampling {

  /** Uniform-rate keep decision: md5(key) 32-bit hex prefix compared
    * against rate·2^32 rendered in hex — a pure string comparison both
    * Spark and any SQL oracle evaluate identically. */
  def keepHash(keyCol: Column, rate: Double): Column = {
    require(rate >= 0.0 && rate <= 1.0, "rate must be in [0,1]")
    // exact endpoints short-circuit: the hex threshold caps at 'ffffffff',
    // which a strict '<' would otherwise turn into a 1-in-2^32 silent drop
    // at rate 1.0 (~23 lost rows per 100B-doc corpus)
    if (rate >= 1.0) lit(true)
    else if (rate <= 0.0) lit(false)
    else {
      val threshold = f"${math.round(rate * 4294967296.0).min(4294967295L)}%08x"
      substring(md5(keyCol.cast("string")), 1, 8) < lit(threshold)
    }
  }

  /** Deterministic uniform sample of `rate` of the rows. */
  def deterministicSample(df: DataFrame, keyCol: Column, rate: Double): DataFrame =
    df.filter(keepHash(keyCol, rate))

  /** Deterministic hash split — the train/valid/test assignment every
    * training pipeline needs, with the property random splitting lacks:
    * a document's split is a pure function of its key, so it is stable
    * across runs, engines, cluster layouts, task retries, AND corpus
    * growth (new documents never move old ones between splits — the
    * leakage guarantee). `splits` are (name, weight) pairs in declaration
    * order; weights normalize; a row lands in the first split whose
    * cumulative hex bound exceeds its 32-bit md5 prefix — the same pure
    * string comparison as [[keepHash]], ONE scan-local projection, no
    * shuffle, oracle-checkable verbatim. */
  def hashSplit(df: DataFrame, keyCol: Column, splits: Seq[(String, Double)],
                outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    require(splits.forall(_._2 > 0.0), "split weights must be positive")
    require(splits.map(_._1).distinct.size == splits.size, "split names must be unique")
    val total = splits.map(_._2).sum
    val h = substring(md5(keyCol.cast("string")), 1, 8)
    var cum = 0.0
    val bounded = splits.init.map { case (nm, w) =>
      cum += w
      (nm, f"${math.round(cum / total * 4294967296.0).min(4294967295L)}%08x")
    }
    val assign = bounded.foldRight(lit(splits.last._1)) {
      case ((nm, bound), tail) => when(h < lit(bound), lit(nm)).otherwise(tail)
    }
    df.withColumn(outCol, assign)
  }

  /** Dataset mixing: per-stratum sampling rates (unlisted strata drop).
    * The standard source-weighting step of corpus assembly. */
  def stratifiedSample(df: DataFrame, keyCol: Column, strataCol: Column,
                       rates: Map[String, Double]): DataFrame = {
    val keep = rates.foldLeft(lit(false)) { case (acc, (stratum, rate)) =>
      acc || (strataCol === stratum && keepHash(keyCol, rate))
    }
    df.filter(keep)
  }

  /** Balanced (quota) subsample: exactly min(n, |stratum|) rows per stratum,
    * chosen by md5-rank — the "equal representation per language/source"
    * step of corpus assembly, deterministic on any cluster layout.
    *
    * Scale shape: the same two-phase trick as [[tokenBudgetQuota]] — a
    * single per-stratum window sorts the WHOLE stratum on one task, and
    * quota-sampling a giant stratum is the common case. Rows bucket by the
    * first two hex chars of md5(key) (bucket prefix order = md5 rank
    * order, so buckets are contiguous rank ranges); per-(stratum,bucket)
    * counts become exclusive starting offsets (a ≤256-rows-per-stratum
    * table, broadcast back), and the row-level rank window partitions by
    * (stratum, bucket) — any single task sorts ~1/256 of a stratum. Global
    * rank = bucket start + within-bucket rank, provably equal to the
    * single-window rank for every row. When n ≪ stratum size at 100 TB,
    * additionally pre-thin with [[keepHash]] at a generous rate bound
    * (e.g. 10·n/|stratum|): the md5 order is identical before and after
    * thinning, so the selected set is unchanged unless the bound itself
    * cuts below rank n. */
  def quotaSample(df: DataFrame, keyCol: Column, strataCol: Column, n: Int,
                  preRate: Double = 1.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rankHash = md5(keyCol.cast("string"))
    val thinned = df.filter(keepHash(keyCol, preRate))
      .withColumn("__qs_bkt", substring(rankHash, 1, 2))
    val wBkt = Window.partitionBy(col("__qs_src")).orderBy(col("__qs_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = thinned
      .groupBy(strataCol.as("__qs_src"), col("__qs_bkt").as("__qs_bkt"))
      .agg(count(lit(1)).as("__qs_cnt"))
      .withColumn("__qs_start", coalesce(sum(col("__qs_cnt")).over(wBkt), lit(0L)))
      // buckets whose rank range starts at or past the quota can't
      // contribute — prune them from the broadcast AND (via the inner
      // join) drop their rows before the row-level window sorts them
      .filter(col("__qs_start") < n)
      .select(col("__qs_src"), col("__qs_bkt").as("__qs_bkt2"), col("__qs_start"))
    val wIn = Window.partitionBy(strataCol, col("__qs_bkt"))
      .orderBy(rankHash, keyCol)
    thinned
      .join(broadcast(offsets),
        strataCol === col("__qs_src") && col("__qs_bkt") === col("__qs_bkt2"))
      .withColumn("__rk", col("__qs_start") + row_number().over(wIn))
      .filter(col("__rk") <= n)
      .drop("__rk", "__qs_bkt", "__qs_src", "__qs_bkt2", "__qs_start")
  }

  /** Mixture upsampling: per-stratum EPOCH weights ≥ 0 (how many times each
    * source is seen in one training pass — the data-mixture knob of
    * LLaMA-style corpus recipes, where curated sources run > 1 epoch and
    * bulk crawl < 1). Every row is emitted floor(w) times plus one more
    * when its md5 fraction falls below frac(w), tagged with `epoch_idx`
    * 1..reps; strata without a weight drop. Deterministic per row key —
    * identical output on any cluster layout or retry, and expected stratum
    * volume = w·|stratum| exactly.
    *
    * Scale shape: a scan-local explode — zero shuffles; output volume is
    * the sum of weights, which is the volume the training job reads. */
  def mixtureUpsample(df: DataFrame, keyCol: Column, strataCol: Column,
                      epochs: Map[String, Double]): DataFrame = {
    require(epochs.values.forall(_ >= 0.0), "epoch weights must be >= 0")
    val reps = epochs.foldLeft(lit(0)) { case (acc, (stratum, w)) =>
      val whole = math.floor(w).toInt
      val frac = w - whole
      when(strataCol === stratum,
        lit(whole) + when(keepHash(keyCol, frac), 1).otherwise(0)).otherwise(acc)
    }
    df.withColumn("__reps", reps)
      .filter(col("__reps") > 0)
      .withColumn("epoch_idx", explode(sequence(lit(1), col("__reps"))))
      .drop("__reps")
  }

  /** Per-source TOKEN budget cap — the "GitHub is capped at N tokens"
    * knob of corpus recipes, where the cut is by volume, not document
    * count: within each source, documents are taken in md5-of-id order
    * (deterministic, crawl-order-free) until the source's cumulative
    * token total exceeds `budget`; the document that crosses the line is
    * kept (budgets are truncation points for the loader, same convention
    * as [[packSequences]]), everything after it drops.
    *
    * Scale shape: the intended use (capping a handful of HUGE sources)
    * makes a per-source window sort the worst possible skew — one task
    * sorts all of GitHub. So the cumulative sum is two-phase: rows bucket
    * by the first two hex chars of md5(id) (256 buckets, and the bucket
    * prefix order IS the md5 rank order, so buckets are contiguous rank
    * ranges); per-(source,bucket) token subtotals — a tiny agg — turn into
    * per-bucket starting offsets via a window over that 256-rows-per-source
    * table, broadcast back; the row-level window then partitions by
    * (source, bucket), bounding any single task's sort to ~1/256 of a
    * source regardless of how skewed the source mix is. Output is provably
    * identical to the single-window form: bucket_start + within-bucket
    * cumsum = global cumsum for every row. */
  def tokenBudgetQuota(df: DataFrame, idCol: Column, sourceCol: Column,
                       tokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.expressions.Window
    val rankHash = md5(idCol.cast("string"))
    val withB = df.withColumn("__tb_bkt", substring(rankHash, 1, 2))
    // phase 1: per-(source,bucket) subtotals -> exclusive running offset
    // over the bucket order (<=256 rows per source; the window here sorts a
    // driver-tiny table, then broadcasts back)
    val wBkt = Window.partitionBy(col("__tb_src")).orderBy(col("__tb_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withB
      .groupBy(sourceCol.as("__tb_src"), col("__tb_bkt").as("__tb_bkt"))
      .agg(sum(tokensCol).as("__tb_sum"))
      .withColumn("__tb_start", coalesce(sum(col("__tb_sum")).over(wBkt), lit(0L)))
      .select(col("__tb_src"), col("__tb_bkt").as("__tb_bkt2"), col("__tb_start"))
    // phase 2: within-bucket cumsum; global cum = bucket start + local cum
    val wIn = Window.partitionBy(sourceCol, col("__tb_bkt"))
      .orderBy(rankHash, idCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    withB
      .join(broadcast(offsets),
        sourceCol === col("__tb_src") && col("__tb_bkt") === col("__tb_bkt2"))
      .withColumn("__cum", col("__tb_start") + sum(tokensCol).over(wIn))
      .filter(col("__cum") - tokensCol < budget) // doc crossing the line kept
      .drop("__cum", "__tb_bkt", "__tb_src", "__tb_bkt2", "__tb_start", "__tb_sum")
  }

  /** Balanced shard assignment: rank all rows by descending size (token
    * count, unique-ized by id) and deal them round-robin across `numShards`
    * — the longest-processing-time heuristic that keeps shard token totals
    * within one max-document of each other, for writing training shards of
    * near-equal work.
    *
    * The global rank is computed WITHOUT a single-partition sort (the naive
    * `row_number() over (order by …)` collapses 100 TB onto one task):
    * range-partition on the sort key, rank locally per partition, and add
    * per-partition row-count offsets (a ≤-#partitions-entry array on the
    * driver). Ranks equal the global-sort ranks for ANY partition
    * boundaries because the key order is total (size desc, id unique
    * tiebreak), so the output is deterministic even though RangePartitioner
    * samples.
    *
    * Output = `df`'s columns + `shard_id` + `shard_tokens` (the evaluated
    * sort key, handed back so a caller whose token count is DERIVED — e.g.
    * split+size over text — can project it without re-reading the text
    * column on the join side; Catalyst then prunes the scan to the id). */
  def shardAssign(df: DataFrame, idCol: Column, tokensCol: Column, numShards: Int): DataFrame = {
    require(numShards > 0, "numShards must be positive")
    import org.apache.spark.sql.GraftBridge
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions.max(1)
    // Ranking runs on a NARROW (id, tokens) projection range-partitioned on
    // the sort key. Both the per-partition offsets and the per-partition
    // ranks must see the SAME boundaries — RangePartitioner samples with a
    // per-RDD seed, so two independent executions of this exchange could
    // legally pick different boundaries and misalign offsets against ranks.
    // Pinning by INSTANCE identity (one toRdd; every consumer below reads
    // this exact RDD, whose shuffle files Spark reuses across jobs) makes
    // that impossible without storing anything: no checkpoint/persist of
    // the projection (the r4-measured 2.5x regression was the eager
    // checkpoint; the lazy form still paid per-row copies into block
    // storage and a cache entry), nothing for a ContextCleaner to reclaim.
    val narrow = df.select(idCol.as("__sa_id"), tokensCol.as("__sa_tok"))
      .repartitionByRange(parts, col("__sa_tok").desc, col("__sa_id").asc)
    val schema = narrow.schema
    val rdd = narrow.queryExecution.toRdd
    // per-partition row counts -> exclusive prefix offsets: one pass over
    // the shuffle output (map stage reused, nothing sorted), O(#partitions)
    // on the driver — same bounded-collect class as the IVF centroid tables
    val nParts = rdd.getNumPartitions
    val counts = new Array[Long](nParts)
    rdd.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator((pid, n))
      }.collect().foreach { case (pid, n) => counts(pid) = n }
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) { offsets(p) = acc; acc += counts(p); p += 1 }
    // global rank = partition offset + position within the partition-local
    // sort. monotonically_increasing_id() over the sorted stream IS that
    // position (pid << 33 | local index), evaluated as rows leave the sort —
    // no rank window, no exchange: the offset table rides the plan as a
    // driver-tiny array literal indexed by pid. The full-width rows never
    // enter the range shuffle; (id, tokens, shard_id) joins back by id.
    val localIdx = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val pidCol = shiftright(col("__mid"), 33).cast("int")
    val mapping = GraftBridge.internalDf(df.sparkSession, rdd, schema)
      .sortWithinPartitions(col("__sa_tok").desc, col("__sa_id").asc)
      .withColumn("__mid", monotonically_increasing_id())
      .select(col("__sa_id"), col("__sa_tok").as("shard_tokens"),
        ((element_at(lit(offsets), pidCol + 1) + localIdx) % numShards)
          .cast("int").as("shard_id"))
    df.join(mapping, idCol === col("__sa_id")).drop("__sa_id")
  }

  /** Per-group winsorization: clamp a value column at its group's
    * [qLo, qHi] order statistics — the standard outlier-taming transform
    * before loss-weighting / normalization. Thresholds come from the KLL
    * ladder ([[graft.functions.KllQuantileAgg]]): EXACT below capacity
    * (the oracle regime), the documented ~1/c rank error above — which is
    * the honest 100 TB posture (exact per-group percentiles at corpus
    * scale would shuffle every row through a per-group sort; winsorization
    * tolerates sketched bounds by construction). The threshold table is
    * GROUP-cardinality-sized and broadcasts; the data stream never
    * reshuffles. */
  def winsorize(df: DataFrame, grpCol: Column, valCol: Column,
      qLo: Double, qHi: Double, k: Int = 4096): DataFrame = {
    require(qLo < qHi, "qLo must be < qHi")
    val bounds = df.groupBy(grpCol.as("__g"))
      .agg(graft.functions.KllQuantileAgg.kllQuantiles(
        valCol.cast("double"), k, Seq(qLo, qHi)).as("__qs"))
      .select(col("__g"), col("__qs")(0).as("__lo"), col("__qs")(1).as("__hi"))
    df.join(broadcast(bounds), grpCol === col("__g"))
      .withColumn("value_w",
        least(greatest(valCol.cast("double"), col("__lo")), col("__hi")))
      .drop("__g", "__lo", "__hi")
  }

  /** Temperature-scaled mixture weights (the mC4/mT5 multilingual
    * sampling rule, Xue et al. NAACL '21): language l gets sampling weight
    * ∝ p_l^τ — τ < 1 upsamples the tail relative to proportional mixing.
    * Fixed at τ = 0.5, where p^τ = √p and IEEE sqrt is CORRECTLY ROUNDED
    * by spec — the one exponent where the power law is bit-exact across
    * engines (libm `pow` is not, which is why τ is not a free parameter
    * here). The denominator folds the per-group √sizes in GROUP-SORTED
    * order via an explicit sequential reduce (sort_array + aggregate; the
    * oracle mirrors with list(… ORDER BY …) + list_reduce), so the sum's
    * rounding sequence — not just its operands — is pinned, and the final
    * weight floors at parts-per-billion. Group table is
    * language-cardinality-sized: one hash aggregation over the corpus,
    * then scalar arithmetic. */
  def temperatureWeights(df: DataFrame, grpCol: Column,
      sizeCol: Column): DataFrame = {
    val sizes = df.groupBy(grpCol.as("grp"))
      .agg(sum(sizeCol.cast("long")).as("n"))
      .withColumn("sq", sqrt(col("n").cast("double")))
    val den = sizes
      .agg(sort_array(collect_list(struct(col("grp"), col("sq")))).as("a"))
      .select(aggregate(col("a"), lit(0.0d),
        (acc, x) => acc + x.getField("sq")).as("den"))
    sizes.crossJoin(broadcast(den))
      .select(col("grp"), col("n"),
        floor(lit(1000000000.0d) * col("sq") / col("den"))
          .cast("long").as("weight_ppb"))
  }

  /** Weighted sampling WITHOUT replacement (Efraimidis & Spirakis,
    * "Weighted random sampling with a reservoir", IPL '06): item i gets
    * key u_i^(1/w_i) with u_i uniform; the top-n keys ARE a weighted
    * sample without replacement. Deterministic u_i from the md5 of the id
    * (13 hex digits → an exact ≤2^52 integer, so the double is
    * bit-identical across engines), ranked by the equivalent monotone
    * score ln(u)/w — floored at ×10⁹ so an engine-libm last-ulp wobble in
    * `ln` cannot reorder (distinctness of the floored scores is asserted
    * per fixture in SamplingSpec, the same floor-margin discipline as the
    * DSIR and BM25 kernels). Selection is a global top-n — Spark plans
    * TakeOrderedAndProject: per-partition heaps of n, no full sort, no
    * single-partition window. The quality-weighted corpus subsample in
    * one pass. */
  def weightedSample(df: DataFrame, idCol: Column, weightCol: Column,
      n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    // exact integer value of the first 13 md5 hex digits, as a double
    val u = (conv(substring(md5(idCol.cast("string")), 1, 13), 16, 10)
      .cast("double") + lit(1.0)) / lit(4503599627370497.0) // (v+1)/(2^52+1) ∈ (0,1]
    val score = floor(log(u) / weightCol.cast("double") * lit(1000000000.0))
      .cast("long")
    // non-positive weights are excluded, not scored: w = 0 would give
    // ln(u)/0 = -Inf, which Spark's long cast silently floors to
    // Long.MinValue while other engines error — an E-S weight of 0 means
    // "never sample" anyway, so dropping the row is the defined semantics
    df.filter(weightCol.cast("double") > 0.0)
      .select(idCol.as("id"), weightCol.cast("double").as("w"),
        score.as("ws_score"))
      .orderBy(col("ws_score").desc, col("id"))
      .limit(n)
  }

  /** Curriculum staging (Bengio et al., "Curriculum Learning", ICML '09):
    * stage = exact NTILE(k) of the corpus ordered easiest→hardest by
    * `diffCol`, ties broken by a deterministic md5 shuffle (equal-
    * difficulty docs spread uniformly across a stage boundary instead of
    * clumping by id) then id. Training then consumes stages in order,
    * reading each stage in (md5, id) order — the standard
    * sort-then-shuffle-within-stage curriculum layout.
    *
    * Exactness without a global window: the same pinned-RDD rank as
    * [[shardAssign]] — a narrow (id, diff, h) projection is range-
    * partitioned on the sort key ONCE (instance-pinned so offsets and
    * ranks see identical boundaries), per-partition counts give exclusive
    * prefix offsets (O(#partitions) driver array), and the global rank is
    * offset + partition-local position. The NTILE split (first n%k stages
    * take one extra row) is then pure arithmetic on the rank — no
    * single-partition WindowExec anywhere, which is what makes the
    * operator hold at 100 TB where `ntile() OVER (ORDER BY ...)` cannot.
    */
  def curriculumStages(df: DataFrame, idCol: Column, diffCol: Column,
      k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.GraftBridge
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions.max(1)
    val narrow = df.select(idCol.as("__cu_id"), diffCol.as("__cu_d"),
        md5(idCol.cast("string")).as("__cu_h"))
      .repartitionByRange(parts, col("__cu_d").asc, col("__cu_h").asc,
        col("__cu_id").asc)
    val schema = narrow.schema
    val rdd = narrow.queryExecution.toRdd
    val nParts = rdd.getNumPartitions
    val counts = new Array[Long](nParts)
    rdd.mapPartitionsWithIndex { (pid, it) =>
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; Iterator((pid, n))
      }.collect().foreach { case (pid, n) => counts(pid) = n }
    val offsets = new Array[Long](nParts)
    var acc = 0L
    var p = 0
    while (p < nParts) { offsets(p) = acc; acc += counts(p); p += 1 }
    val n = acc
    val base = n / k
    val rem = n % k
    val localIdx = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val pidCol = shiftright(col("__mid"), 33).cast("int")
    val rank = (element_at(lit(offsets), pidCol + 1) + localIdx + 1L).as("__rank")
    val mapping = GraftBridge.internalDf(df.sparkSession, rdd, schema)
      .sortWithinPartitions(col("__cu_d").asc, col("__cu_h").asc, col("__cu_id").asc)
      .withColumn("__mid", monotonically_increasing_id())
      .select(col("__cu_id"), rank)
    // NTILE(k) over n rows: the first rem tiles hold base+1 rows. base=0
    // (n < k) degenerates to stage = rank, which the first branch covers
    // since (base+1)*rem = n.
    val stage =
      when(col("__rank") <= lit((base + 1L) * rem),
        expr(s"CAST((__rank - 1) DIV ${base + 1L} AS INT) + 1"))
        .otherwise(
          expr(s"CAST($rem + (__rank - 1 - ${(base + 1L) * rem}) DIV " +
            s"${math.max(base, 1L)} AS INT) + 1"))
    df.join(mapping, idCol === col("__cu_id"))
      .withColumn("stage", stage)
      .drop("__cu_id", "__rank")
  }

  /** Token-budget sequence packing: within each shard (ordered by id), the
    * running token total assigns each document to bin
    * floor((cumsum − n_tokens) / budget) — the cumulative-chunking form of
    * first-fit packing (documents may straddle a budget boundary; the
    * training loader treats bin edges as truncation points). One window
    * per shard; shards pack independently and in parallel. */
  def packSequences(df: DataFrame, shardCol: Column, idCol: Column,
                    tokensCol: Column, budget: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("__cum", sum(tokensCol).over(w))
      .withColumn("bin_id", floor((col("__cum") - tokensCol) / budget))
      .drop("__cum")
  }

  /** GPT-style concat-and-chunk packing: the corpus token stream in doc-id
    * order is cut into fixed `chunkTokens` context windows, and a document
    * contributes the span [tok_start, tok_end) of its own tokens to every
    * chunk it straddles — chunk boundaries cut THROUGH documents, which is
    * the pretraining loader's actual layout ([[packSequences]] is the
    * other discipline: per-shard bins, no straddling). Output one row per
    * (chunk_id, doc_id) incidence, integer-only surface.
    *
    * The global running offset is a textbook two-level distributed prefix
    * sum — NO corpus-wide window anywhere: shard by id range (≤`shardSize`
    * docs per shard), per-shard totals via one map-side-combined
    * aggregate, an EXCLUSIVE prefix over the shard summary (a window over
    * ~n/shardSize rows — 1e9 docs at the default shard size is a 250k-row
    * single-task window over kilobyte rows, the same summary-level pattern
    * as the skyline/peak-concurrency operators), broadcast of the shard
    * offsets back, and a per-shard window for the local exclusive sum.
    * Chunk incidence is a scan-local `sequence` explode: a doc spanning k
    * chunks emits k rows, so output volume is Σ tokens/chunkTokens + n —
    * linear, never quadratic. */
  def packChunksGlobal(df: DataFrame, idCol: Column, nTokCol: Column,
                       chunkTokens: Long, shardSize: Long = 4096L): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive, got $chunkTokens")
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(idCol.cast("long").as("doc_id"),
        nTokCol.cast("long").as("n_tok"))
      .withColumn("__shard", expr(s"doc_id div ${shardSize}L"))
    val shardTot = base.groupBy("__shard").agg(sum("n_tok").as("__stot"))
    val wS = Window.orderBy("__shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    val shardOff = shardTot
      .withColumn("__soff", coalesce(sum("__stot").over(wS), lit(0L)))
      .select("__shard", "__soff")
    val wL = Window.partitionBy("__shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val off = base.join(broadcast(shardOff), "__shard")
      .withColumn("__loff", coalesce(sum("n_tok").over(wL), lit(0L)))
      .withColumn("__o", col("__soff") + col("__loff"))
    off.filter(col("n_tok") > 0)
      .withColumn("chunk_id", explode(sequence(
        expr(s"__o div ${chunkTokens}L"),
        expr(s"(__o + n_tok - 1) div ${chunkTokens}L"))))
      .select(col("chunk_id"), col("doc_id"),
        greatest(lit(0L), col("chunk_id") * chunkTokens - col("__o")).as("tok_start"),
        least(col("n_tok"), (col("chunk_id") + lit(1L)) * chunkTokens - col("__o")).as("tok_end"))
  }

  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023): score every raw-pool document by how much its hashed-n-gram
    * distribution looks like a small target domain, then keep the top-k.
    *
    * Features are word unigrams + bigrams over [[Text.normalized]] text,
    * hashed into `buckets` buckets by the first 3 hex chars of md5 (4096
    * buckets at the paper's order of magnitude; md5-prefix bucketing is the
    * same engine-portable trick the rest of this file uses). Per bucket b
    * with add-one smoothing, the importance log-ratio is
    *
    *   lr[b] = ln( p_target[b] / p_raw[b] )
    *         = ln( (t_b+1)·(R+B) / ((r_b+1)·(T+B)) )
    *
    * held as floor(1e6·lr) micro-nats — the products are exact 64-bit
    * integers (< 2^53, so their double images are exact), the division is
    * one IEEE op, and the only transcendental is a single `ln` whose ±1-ulp
    * engine variance (~2e-10 absolute at this magnitude) cannot move a
    * floor unless the true value sits that close to an integer — the spec
    * measures the actual distance. A document's score is then the plain
    * integer sum of its occurrences' bucket values — order-independent, so
    * any aggregation layout is hash-identical. The paper samples with
    * Gumbel noise; this deterministic variant takes top-k (score desc,
    * id asc), which is the zero-temperature limit.
    *
    * 100 TB posture: bucket statistics are one groupBy over ≤`buckets`
    * keys (map-side combined — the shuffle carries buckets·partitions
    * rows, not grams); the bucket→lr table is ~`buckets` rows and rides a
    * broadcast join; scoring collapses to one row per document before its
    * shuffle (partial sum per scan task); selection is the bounded
    * [[graft.functions.TopKByScoreAgg]] heap, never a global sort. Nothing
    * corpus-sized is ever sorted, collected, or joined non-broadcast. */
  def dsirSelect(df: DataFrame, idCol: Column, textCol: Column,
                 isTarget: Column, buckets: Int = 4096, k: Int = 100): DataFrame = {
    require(buckets > 0 && buckets <= 4096, "buckets must fit a 3-hex-char prefix")
    // grams is consumed twice (bucket stats, then scoring). Deliberately NOT
    // persisted: the exploded gram stream is corpus-sized — caching it at
    // 100 TB costs far more than the second scan it saves, and both
    // consumers reduce it map-side before any shuffle.
    val grams = dsirGrams(df, idCol, textCol, isTarget)
    val bc = grams.groupBy("bkt").agg(
      sum(when(col("is_target"), 1L).otherwise(0L)).as("t"),
      sum(when(!col("is_target"), 1L).otherwise(0L)).as("r"))
    val totals = bc.agg(sum("t").as("tt"), sum("r").as("rt"))
    val lr = bc.crossJoin(broadcast(totals))
      .withColumn("lr_micro",
        floor(log(((col("t") + 1L) * (col("rt") + buckets)).cast("double") /
                  ((col("r") + 1L) * (col("tt") + buckets)).cast("double"))
          * 1000000.0d).cast("long"))
      .select("bkt", "lr_micro")
    val scored = grams.filter(!col("is_target"))
      .join(broadcast(lr), "bkt")
      .groupBy("doc_id").agg(sum(col("lr_micro")).as("score_micro"))
    scored.agg(Similarity.topKByScore(
        col("score_micro").cast("double"), col("doc_id"), k).as("__tk"))
      .select(posexplode(col("__tk")).as(Seq("__pos", "__e")))
      .select((col("__pos") + 1).cast("long").as("rank"),
        col("__e.id").as("doc_id"), col("__e.score").cast("long").as("score_micro"))
  }

  /** The hashed-n-gram feature stream behind [[dsirSelect]]: one row per
    * word unigram/bigram occurrence, tagged with its md5-prefix bucket.
    * Package-visible so the spec can audit the bucket statistics (the
    * floor-robustness guard on the single `ln`). */
  private[graft] def dsirGrams(df: DataFrame, idCol: Column, textCol: Column,
                               isTarget: Column): DataFrame = {
    val base = df.select(idCol.as("doc_id"), isTarget.as("is_target"),
      split(Text.normalized(textCol), " ").as("toks"))
    val uni = base.select(col("doc_id"), col("is_target"),
        explode(col("toks")).as("g"))
      .filter(col("g") =!= "")
    val bi = base.select(col("doc_id"), col("is_target"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("is_target"),
        concat(col("b.w1"), lit(" "), col("b.w2")).as("g"))
    uni.unionAll(bi).withColumn("bkt", substring(md5(col("g")), 1, 3))
  }
}
