package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language ID, document fingerprinting. All are
  * narrow per-row projections built from codegen'd built-ins — no UDFs, no
  * shuffles — so they run at parquet-scan speed on 100 TB of documents.
  */
object Text {

  /** Normalize: lowercase + collapse whitespace runs. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "\\s+", " "))

  /** Scan-local ±2-window co-occurrence pairs (the GloVe input stage,
    * Pennington et al. '14): for each position i, the unordered pairs
    * (wᵢ, wᵢ₊₁) and (wᵢ, wᵢ₊₂) in canonical (least, greatest) order, as
    * one `array<struct<w1, w2>>` per document — a pure HOF projection
    * over the words array, so the downstream count shuffles pair rows,
    * never positions, and no positional self-join exists anywhere. */
  def coocPairs(textCol: Column): Column = {
    val ws = split(normalized(textCol), " ")
    flatten(transform(ws, (w, i) => {
      def pair(off: Int): Column = {
        val nb = element_at(ws, i + lit(off + 1))
        when(i + lit(off) < size(ws),
          struct(least(w, nb).as("w1"), greatest(w, nb).as("w2")))
      }
      filter(array(pair(1), pair(2)), x => x.isNotNull)
    }))
  }

  /** Whitespace token count — ONE allocation-free native pass
    * ([[graft.functions.WsTokenCountExpr]]), value-identical to
    * `size(split(trim(regexp_replace(text, "\\s+", " ")), " "))` (and to the
    * same composition over [[normalized]] text: lowercasing never creates or
    * destroys whitespace). The composition it replaces allocates the full
    * token array per row just to take its length. */
  def tokenCount(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.WsTokenCountExpr(GraftBridge.toExpr(text)))
  }

  /** Content fingerprint: md5 of the normalized text — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Bag-of-words fingerprint: md5 over the sorted distinct token set.
    * Catches shuffled/reordered duplicates that byte-exact hashing misses. */
  def wordSetFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(normalized(text), " "))), " ").cast("binary"))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

  /** Shannon entropy of the code-point distribution (native kernel,
    * [[graft.functions.CharEntropyExpr]]) — the gibberish/boilerplate
    * signal: near 0 for repeated-character spam, anomalously high for
    * binary-in-text. Round to 6 decimals before cross-engine compare. */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.CharEntropyExpr(GraftBridge.toExpr(text)))
  }

  /** BPE-ish token count: alpha runs, digit runs, and single punctuation each
    * count as one token — a deterministic proxy for subword tokenizers. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Within-document repetition: ppm of duplicated word n-grams (total −
    * distinct over total) — the Gopher-style repetitiousness quality gate.
    * Pure per-row column expressions, no shuffle. */
  /** Over a PRE-MATERIALIZED token-array column. The tokenization must live
    * in its own projection: higher-order functions are interpreted, so a
    * `split(...)` subtree referenced inside the per-gram lambda would
    * re-tokenize the document once per gram — quadratic in document length.
    * Grams are compared by a 64-bit hash of each token slice (no joined
    * strings; collision odds ~g²/2⁶⁵, and the oracle check would surface
    * one). */
  def repetitionPpmOfTokens(toks: Column, n: Int): Column = {
    val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
    val grams = transform(idx, i => xxhash64(slice(toks, i + 1, lit(n))))
    ppm(size(grams) - size(array_distinct(grams)), size(grams))
  }

  def repetitionPpm(text: Column, n: Int): Column =
    repetitionPpmOfTokens(split(normalized(text), " "), n)

  /** Unicode normalization (NFC default): canonicalize composed/decomposed
    * codepoint sequences before any fingerprinting or shingling — crawl
    * text mixes the two and every exact-dedup key disagrees across them
    * otherwise. Native codegen'd expression (no Scala-UDF boundary);
    * scan-local, no shuffle. */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column = {
    import org.apache.spark.sql.GraftBridge
    GraftBridge.toCol(graft.functions.UnicodeNormalizeExpr(GraftBridge.toExpr(text), form))
  }

  /** PII-pattern counts per document (email-shaped strings, long digit
    * runs) — the redaction-stage signal of a cleaning pipeline. Patterns are
    * RE2-compatible so every engine scores identically. */
  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))),
    size(regexp_extract_all(text, lit("[0-9]{6,}"), lit(0))))

  private val EnStopwords = Seq("the", "a", "an", "of", "and", "in", "to", "is")

  /** The Gopher rule-set stopword list (Rae et al. 2021, appendix A1.1):
    * a document must contain at least 2 of these WORD TYPES to pass. */
  private val GopherStopwords =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher document-quality gate (Rae et al. 2021, "Scaling Language
    * Models", appendix A1.1 — the MassiveText filter): the document-level
    * rules that need no line structure, each surfaced as its own metric so
    * a pipeline can audit WHICH rule fired — the filter-debugging loop of a
    * corpus build. Appends:
    *   - `n_words`             whitespace word count ∈ [50, 100 000]
    *   - `mean_word_len_ppm`   non-whitespace chars ·1e6 / words ∈ [3e6, 10e6]
    *   - `symbol_ppm`          ('#' chars + '...' runs) ·1e6 / words ≤ 1e5
    *   - `alpha_word_ppm`      words containing ≥1 alpha char ·1e6 / words ≥ 8e5
    *   - `stop_types`          distinct Gopher stopwords present ≥ 2
    *   - `keep`                the conjunction of the five rules
    * All ratios are exact ppm integers ([[ppm]]) so the gate is
    * engine-stable. Pure per-row projection — no UDF, no shuffle; runs at
    * parquet-scan speed on 100 TB. Defaults are the paper's thresholds;
    * real pipelines tune the bounds per corpus (the knobs exist for that). */
  def gopherQuality(df: DataFrame, textCol: Column,
                    minWords: Long = 50L, maxWords: Long = 100000L,
                    minStopTypes: Long = 2L): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    // all five raw metrics come from ONE native byte pass
    // ([[graft.functions.GopherStatsExpr]] — value-identical to the
    // two-lambda-filter + three-regexp composition the oracle computes,
    // which allocated a token array per row just to take counts off it).
    // The array lands in its own projection: element_at references below
    // must NOT inline the kernel five times (CollapseProject keeps
    // multi-referenced non-cheap expressions materialized).
    val stats = GraftBridge.toCol(
      graft.functions.GopherStatsExpr(GraftBridge.toExpr(textCol)))
    df.withColumn("__gstats", stats)
      .withColumn("n_words", element_at(col("__gstats"), 1))
      .withColumn("mean_word_len_ppm", ppm(element_at(col("__gstats"), 2), col("n_words")))
      .withColumn("symbol_ppm", ppm(element_at(col("__gstats"), 5), col("n_words")))
      .withColumn("alpha_word_ppm", ppm(element_at(col("__gstats"), 3), col("n_words")))
      .withColumn("stop_types", element_at(col("__gstats"), 4))
      .withColumn("keep",
        col("n_words").between(minWords, maxWords) &&
          col("mean_word_len_ppm").between(3000000L, 10000000L) &&
          col("symbol_ppm") <= 100000L &&
          col("alpha_word_ppm") >= 800000L &&
          col("stop_types") >= minStopTypes)
      .drop("__gstats")
  }

  /** The regex/HOF composition [[gopherQuality]]'s native kernel replaces —
    * kept as the executable specification: the equivalence spec drives both
    * over adversarial inputs and the DuckDB oracle computes exactly this. */
  private[graft] def gopherQualityComposed(df: DataFrame, textCol: Column): DataFrame = {
    val toks = split(trim(textCol), "\\s+")
    val nWords = size(toks).cast("long")
    val meanLenPpm = ppm(length(regexp_replace(textCol, "\\s", "")), nWords)
    val hashes = length(textCol) - length(regexp_replace(textCol, "#", ""))
    // '...' runs count leftmost non-overlapping (regex ≡ literal replace);
    // the length delta is exactly 3·matches so the division is exact
    val ellipses = ((length(textCol) -
      length(regexp_replace(textCol, "\\.\\.\\.", ""))) / 3).cast("long")
    val symbolPpm = ppm(hashes + ellipses, nWords)
    val alphaPpm = ppm(size(filter(toks, t => t.rlike("[A-Za-z]"))), nWords)
    val stopTypes = size(filter(
      array(GopherStopwords.map(lit): _*), w => array_contains(toks, w))).cast("long")
    df.withColumn("n_words", nWords)
      .withColumn("mean_word_len_ppm", meanLenPpm)
      .withColumn("symbol_ppm", symbolPpm)
      .withColumn("alpha_word_ppm", alphaPpm)
      .withColumn("stop_types", stopTypes)
  }

  /** Canonical URL for crawl-level dedup — the URL-normalization key of
    * CCNet/RefinedWeb-style pipelines (Penedo et al. 2023 §3.1 dedupe by
    * URL after normalization). Rules, applied as one RE2-compatible regexp
    * chain (identical semantics in Spark and any RE2 engine; no UDF):
    * strip the fragment, strip the http/https scheme, lowercase the host,
    * drop a leading "www.", drop explicit default ports :80/:443, drop
    * utm_* tracking params (other query params survive in order), and drop
    * one trailing slash. Scan-local projection — the dedup itself is then
    * an exact groupBy on the canonical key. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val noScheme = regexp_replace(noFrag, "(?i)^https?://", "")
    val host = regexp_replace(
      regexp_replace(lower(regexp_extract(noScheme, "^([^/?]*)", 1)),
        "^www\\.", ""),
      ":(80|443)$", "")
    val rest0 = regexp_replace(noScheme, "^[^/?]*", "")
    // utm params: interior "&utm_x=v" drop outright; a leading "?utm_x=v&"
    // promotes the next param to lead; a lone "?utm_x=v" drops with its "?"
    val utm1 = regexp_replace(rest0, "(?i)&utm_[a-z0-9_]+=[^&]*", "")
    val utm2 = regexp_replace(utm1, "(?i)\\?utm_[a-z0-9_]+=[^&]*&", "?")
    val utm3 = regexp_replace(utm2, "(?i)\\?utm_[a-z0-9_]+=[^&]*$", "")
    concat(host, regexp_replace(utm3, "/$", ""))
  }

  /** Gopher REPETITION gate (Rae et al. 2021, appendix A1.1 Table A1 —
    * the "repetitious documents" rules; [[gopherQuality]] is the other
    * half of the published MassiveText filter). Thirteen metrics from ONE
    * scan-local native pass ([[graft.functions.RepetitionStatsExpr]]):
    * duplicate line / paragraph fractions (by occurrence and by character
    * mass), the character mass of the single most frequent word
    * {2,3,4}-gram, and the character mass of all duplicated word
    * {5..10}-grams — each as an exact ppm integer, with `keep` applying
    * the paper's Table A1 thresholds (a document is removed when ANY
    * fraction exceeds its bound). Zero shuffles: each document's metrics
    * are computed entirely inside its scan task — the correct cost shape
    * for a 100 TB filter sweep. */
  def gopherRepetition(df: DataFrame, textCol: Column): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    val names = Seq("dup_line_ppm", "dup_line_char_ppm", "dup_para_ppm",
      "dup_para_char_ppm", "top_2gram_ppm", "top_3gram_ppm", "top_4gram_ppm",
      "dup_5gram_ppm", "dup_6gram_ppm", "dup_7gram_ppm", "dup_8gram_ppm",
      "dup_9gram_ppm", "dup_10gram_ppm")
    // Table A1 bounds, as ppm (keep when every metric is <= its bound)
    val bounds = Seq(300000L, 200000L, 300000L, 200000L, 200000L, 180000L,
      160000L, 150000L, 140000L, 130000L, 120000L, 110000L, 100000L)
    val stats = GraftBridge.toCol(
      graft.functions.RepetitionStatsExpr(GraftBridge.toExpr(textCol)))
    val withStats = names.zipWithIndex.foldLeft(df.withColumn("__rstats", stats)) {
      case (acc, (nm, i)) => acc.withColumn(nm, element_at(col("__rstats"), i + 1))
    }
    withStats
      .withColumn("keep",
        names.zip(bounds).map { case (nm, b) => col(nm) <= b }.reduce(_ && _))
      .drop("__rstats")
  }

  /** C4-style line-level document cleaner (Raffel et al. 2020, "Exploring
    * the Limits of Transfer Learning…", §2.2 — the published filter stack
    * behind the C4 corpus). Line rules (a line = a `\n`-delimited segment):
    * keep only lines that end in a terminal punctuation mark (`. ! ? "`
    * after trailing-space strip), have at least `minWordsPerLine`
    * whitespace words, and do not contain the word "javascript" (any
    * case). Page rules: drop the whole document when fewer than
    * `minLinesPerDoc` lines survive, or when the raw page contains
    * "lorem ipsum" (any case) or a curly brace `{` — all three verbatim
    * from the paper. (The paper's remaining rules live elsewhere in this
    * suite: bad-word filtering is a `stratifiedSample`-style predicate,
    * and its three-sentence-span dedup is [[Dedup.paragraphDedup]] /
    * the span operators.)
    *
    * Emits `cleaned_text` (surviving lines re-joined in order), `n_lines`
    * (surviving count), and `keep` (the page verdict) — the document body
    * is rewritten, not just scored, exactly like the original pipeline.
    *
    * Scale shape: a pure scan-local projection — the line split, per-line
    * predicates, and re-join all run inside one codegen'd stage with zero
    * shuffles; at 100 TB this is scan-bandwidth-bound, the correct cost
    * for a cleaning pass. Reference analog: the reference engine's
    * row-filter chain (replicator `Filter`/`process` stages) applied to
    * text lines instead of binlog rows. */
  def c4Clean(df: DataFrame, textCol: Column,
              minWordsPerLine: Int = 3, minLinesPerDoc: Int = 5): DataFrame = {
    val kept = filter(split(textCol, "\n"), l =>
      rtrim(l).rlike("[.!?\"]$") &&
        size(split(trim(l), "\\s+")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    df.withColumn("__c4_kept", kept)
      .withColumn("cleaned_text", array_join(col("__c4_kept"), "\n"))
      .withColumn("n_lines", size(col("__c4_kept")).cast("long"))
      .withColumn("keep",
        col("n_lines") >= minLinesPerDoc &&
          !lower(textCol).contains("lorem ipsum") &&
          !textCol.contains("{"))
      .drop("__c4_kept")
  }

  /** Exact ratio in parts-per-million: floor((a*1e6)/b) over identical IEEE
    * doubles — deterministic across engines, unlike decimal rounding modes. */
  def ppm(a: Column, b: Column): Column =
    floor(a.cast("double") * lit(1000000.0d) / b.cast("double")).cast("long")

  /** Quality metrics: alpha ratio, whitespace-token stats, stopword ratio —
    * all as exact ppm integers so equality is stable downstream. */
  def qualityMetrics(df: DataFrame, textCol: Column): DataFrame = {
    val toks = split(trim(textCol), "\\s+")
    val alpha = length(regexp_replace(textCol, "[^A-Za-z]", ""))
    val stopHits = size(filter(toks, t => t.isin(EnStopwords: _*)))
    df.withColumn("n_chars_m", length(textCol).cast("long"))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("alpha_ppm", ppm(alpha, length(textCol)))
      .withColumn("stopword_ppm", ppm(stopHits, size(toks)))
  }

  /** Language ID by stopword/character heuristic — deterministic n-gram-free
    * scoring: count marker-word hits per language, pick the max (ties broken
    * by language code). Real pipelines plug in fastText here; the operator
    * shape (per-row scoring, no shuffle) is what matters at scale. */
  def langId(text: Column): Column = {
    val toks = split(normalized(text), " ")
    def hits(words: Seq[String]): Column = size(filter(toks, t => t.isin(words: _*)))
    val en = hits(Seq("the", "a", "of", "and", "in", "is"))
    val de = hits(Seq("der", "die", "das", "und", "ist", "ein"))
    val es = hits(Seq("el", "la", "de", "y", "es", "un"))
    val fr = hits(Seq("le", "la", "de", "et", "est", "un"))
    // greatest with deterministic preference order on ties: en > de > es > fr
    when(en >= de && en >= es && en >= fr && en > 0, lit("en"))
      .when(de >= es && de >= fr && de > 0, lit("de"))
      .when(es >= fr && es > 0, lit("es"))
      .when(fr > 0, lit("fr"))
      .otherwise(lit("und"))
  }

  /** Rolling-hash document fingerprint (polynomial hash of normalized text,
    * 64-bit) — cheap locality-insensitive id for shard-local joins. Uses
    * Spark's xxhash64 (codegen'd) rather than a Scala UDF. */
  def rollingFingerprint(text: Column): Column = xxhash64(normalized(text))

  /** Overlapping token-window chunking — the retrieval-prep (RAG) passage
    * splitter: windows of `window` tokens starting every `stride` tokens
    * (stride < window ⇒ overlap, so a fact straddling a boundary lands
    * whole in at least one chunk). One scan-local projection + the chunk
    * explode — no shuffle; chunk starts are the multiples of `stride`
    * strictly inside the document, the final window may be short. Output:
    * (id, chunk_idx, chunk_text, n_tokens). */
  def chunkWindows(df: DataFrame, idCol: Column, textCol: Column,
                   window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      "need 0 < stride <= window")
    val toks = split(normalized(textCol), " ")
    df.select(idCol.as("id"), toks.as("__toks"), size(toks).as("__n"))
      .select(col("id"), col("__toks"), col("__n"),
        explode(sequence(lit(0),
          greatest(floor((col("__n") - 1) / stride).cast("int"), lit(0)) * stride,
          lit(stride))).as("__start"))
      .select(col("id"), (col("__start") / stride).cast("int").as("chunk_idx"),
        array_join(slice(col("__toks"), col("__start") + 1, lit(window)), " ").as("chunk_text"),
        least(lit(window), col("__n") - col("__start")).cast("long").as("n_tokens"))
  }

  /** Corpus-fit bigram language-model score — the LM-perplexity quality gate
    * of a cleaning pipeline (CCNet-style), self-trained on the corpus it
    * scores. Per document: mean over its bigrams of the add-one-smoothed
    * transition likelihood ppm, floor((c(w1,w2)+1)·1e6 / (c(w1·)+V)) —
    * gibberish and boilerplate-free prose diverge cleanly. Integer-exact end
    * to end (counts → one IEEE division → floor), so any engine scores
    * identically.
    *
    * Scale shape: the model is two corpus-wide count aggregations
    * (map-side-combined; the shuffle carries DISTINCT bigrams, not token
    * occurrences). Output: doc_id, n_bigrams, lm_ppm (NULL for docs with
    * fewer than two tokens).
    *
    * MODEL policy (`broadcastModel`, default ON): the model — distinct
    * corpus bigram counts — is bigram-TYPE-sized (Heaps-sublinear), not
    * corpus-sized, so it is the one relation this operator persists
    * (stopping each consumer from re-running the corpus-scale tokenize +
    * count chain) and, by default, BROADCASTS into the scoring join: the
    * per-occurrence scored stream then never shuffles at all — model
    * lookup is map-side and the only exchange left is the per-doc
    * aggregation (partial-agg'd; a doc's bigrams are scan-contiguous).
    * The corpus-scale streams themselves are never cached (the dsirSelect
    * rescan posture). Set `broadcastModel = false` for corpora whose
    * bigram-type table outgrows the broadcast cap: the scoring join then
    * compresses to per-doc distinct bigrams first so high-frequency
    * bigrams ride the shuffle once per doc, not once per occurrence. */
  def lmBigramScore(df: DataFrame, idCol: Column, textCol: Column,
      broadcastModel: Boolean = true): DataFrame = {
    val toks = df.select(idCol.as("doc_id"), split(normalized(textCol), " ").as("toks"))
    // adjacent pairs via zip of the two shifted slices: empty for <2 tokens
    val bi = toks.select(col("doc_id"),
        explode(arrays_zip(
          slice(col("toks"), lit(1), size(col("toks")) - 1).as("w1"),
          slice(col("toks"), lit(2), size(col("toks")) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    // the MODEL: distinct corpus bigram counts (map-side-combined shuffle
    // carries bigram types, not occurrences), persisted — it feeds the
    // unigram rollup AND the scoring join
    val c2 = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // unigram counts AND the vocabulary in ONE pass over the bigram model
    // (rollup: the (w1) rows carry c1, the grand-total row carries
    // countDistinct(w2) = V). This small table is the one cache the
    // operator keeps unconditionally — it is VOCABULARY-sized, not
    // corpus-sized, so it pins O(model) executor storage, and persisting it
    // stops its two consumers from re-deriving the corpus-scale c2 chain.
    val uni = c2.rollup("w1")
      .agg(sum(col("c2")).as("c1"), countDistinct(col("w2")).as("v"),
        grouping_id().as("gid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val c1 = uni.filter(col("gid") === 0).select(col("w1"), col("c1"))
    val vocab = uni.filter(col("gid") === 1).select(col("v"))
    // c1/vocab BROADCAST (unigram-vocabulary-sized): the scored stream
    // never reshuffles by the Zipf-skewed bare w1 key
    val smoothed = (c: DataFrame) =>
      c.withColumn("s", floor((col("c2") + 1).cast("double") * lit(1000000.0d)
        / (col("c1") + col("v")).cast("double")).cast("long"))
    // per-doc mean over bigram OCCURRENCES: Σ s·k over distinct doc-bigrams
    // equals Σ s over occurrences (exact integer sums, order-free), so the
    // two join shapes below produce bit-identical (n_bigrams, lm_ppm)
    val perDoc =
      if (broadcastModel)
        smoothed(bi.join(broadcast(c2), Seq("w1", "w2"))
            .join(broadcast(c1), Seq("w1")).crossJoin(broadcast(vocab)))
          .groupBy("doc_id").agg(
            count(lit(1)).as("n_bigrams"),
            floor(sum(col("s")).cast("double") / count(lit(1)).cast("double"))
              .cast("long").as("lm_ppm"))
      else {
        // per-doc bigram multiplicity before the shuffle join (scale note
        // in the scaladoc)
        val docBi = bi.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("k"))
        smoothed(docBi.join(c2, Seq("w1", "w2"))
            .join(broadcast(c1), Seq("w1")).crossJoin(broadcast(vocab)))
          .groupBy("doc_id").agg(
            sum(col("k")).as("n_bigrams"),
            floor(sum(col("s") * col("k")).cast("double") / sum(col("k")).cast("double"))
              .cast("long").as("lm_ppm"))
      }
    df.select(idCol.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"), col("lm_ppm"))
  }

  /** Flesch reading-ease readability signal (Flesch 1948, the curation
    * filter's "too hard / too telegraphic" axis), in engine-exact integer
    * form: sentence count (non-empty `[.!?]+` segments), word count
    * (whitespace tokens of normalized text), syllable proxy (vowel-group
    * runs `[aeiouy]+` — the standard cheap approximation), and the score
    * ×1000 floored (206.835 − 1.015·W/S − 84.6·Syl/W). One scan-local
    * projection, no shuffle. */
  def readability(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.select(idCol.as("doc_id"),
        size(split(normalized(textCol), " ")).cast("long").as("n_words"),
        size(filter(split(textCol, "[.!?]+"),
          s => length(trim(s)) > 0)).cast("long").as("n_sentences"),
        size(regexp_extract_all(lower(textCol), lit("[aeiouy]+"), lit(0)))
          .cast("long").as("n_syl"))
      .withColumn("flesch_milli",
        when(col("n_sentences") > 0 && col("n_words") > 0,
          floor(lit(206835.0)
            - (lit(1015.0) * col("n_words")) / col("n_sentences")
            - (lit(84600.0) * col("n_syl")) / col("n_words")).cast("long")))

  /** Full BPE tokenize: train `numMerges` merge rules from the corpus's
    * word-frequency VOCAB (vocabulary-sized driver collect — the bounded
    * class the IVF/PQ codebooks use; the corpus never leaves executors),
    * then encode every doc scan-locally with the merges as a plan literal.
    * See [[graft.functions.BpeAlgos]]. Not SQL-expressible (iterative
    * greedy merges) → rows-only gate + golden-vector specs (BpeSpec).
    *
    * The collect is BOUNDED: `minFreq` floors the word frequency inside
    * the aggregation (scan-local filter after the hash-agg — hapax
    * legomena dominate a web corpus's distinct-word count yet cannot win
    * a merge argmax against any repeated pair at corpus scale) and
    * `maxVocab` hard-caps the rows the driver ever holds, selected
    * deterministically as the (`c` desc, `w` asc) top-V — Spark's
    * TakeOrdered: per-partition top-V, driver merges partition heads, so
    * driver memory is O(maxVocab) regardless of distinct-word count.
    * Training is vocab-ORDER-insensitive (train() sorts internally), so a
    * non-binding cap changes nothing; a binding cap trains on the
    * highest-frequency V words — the standard BPE corpus-sampling
    * posture. */
  def bpeTokenize(df: DataFrame, idCol: Column, textCol: Column,
      numMerges: Int, minFreq: Long = 1L, maxVocab: Int = 1000000): DataFrame = {
    require(minFreq >= 1L, s"minFreq must be >= 1, got $minFreq")
    require(maxVocab >= 1, s"maxVocab must be >= 1, got $maxVocab")
    val vocab = df
      .select(explode(split(normalized(textCol), " ")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minFreq)
      .orderBy(col("c").desc, col("w").asc)
      .limit(maxVocab)
      .collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val merges = graft.functions.BpeAlgos.train(vocab, numMerges)
    bpeEncodeFixed(df, idCol, textCol, merges)
  }

  /** BPE encode under a caller-supplied (already-trained) merge table —
    * the deployment read path: the table trains once (here or offline),
    * ships as a plan literal, and every encode is a scan-local native
    * expression; nothing corpus-sized moves. The table must be
    * TRAINING-ORDERED (each pair's components are single characters or
    * tokens created at a strictly earlier rank); under that invariant the
    * greedy lowest-rank encode is provably identical to applying the
    * merges sequentially in rank order (a merge can only create pairs
    * containing its own output token, which later ranks alone may
    * reference), which is what makes the fixed-table form exactly
    * SQL-expressible as a chain of `replace()` calls — the oracle for
    * `text_bpe_encode`. */
  def bpeEncodeFixed(df: DataFrame, idCol: Column, textCol: Column,
      merges: Seq[(String, String)]): DataFrame =
    df.select(idCol.as("doc_id"),
        graft.functions.BpeEncodeExpr.bpeEncode(normalized(textCol), merges).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("n_bpe_tokens"),
        size(array_distinct(col("toks"))).as("n_unique_tokens"))

  /** Trigram stupid-backoff LM scoring (Brants et al., "Large Language
    * Models in Machine Translation", EMNLP '07): per trigram,
    *   tier 1  c3(w1w2w3)/c2(w1w2)            if the trigram is in-model
    *   tier 2  0.4 · c2(w2w3)/c1(w2)          else if the bigram is
    *   tier 3  0.4² · c1(w3)/N                otherwise (0 if w3 unseen)
    * against a model corpus that is DISTINCT from the scored stream — the
    * held-out posture (CCNet-style reference-model scoring) that actually
    * exercises the backoff tiers; a same-corpus model degenerates to
    * tier 1 everywhere. Scores are floor(ratio · 10⁶)-integer per-million
    * values (0.4 → 400 000, 0.4² → 160 000), exact across engines.
    *
    * Scale posture, mirroring [[lmBigramScore]]'s policy: NOTHING
    * corpus-sized persists. The n-gram model tables are model-vocabulary-
    * bounded; the two unigram legs and N broadcast (the scored stream
    * never shuffles on a bare Zipf-skewed token key); the trigram/bigram
    * legs shuffle on well-distributed composite keys. */
  def lmBackoffScore(scoreDf: DataFrame, modelDf: DataFrame, idCol: Column,
      textCol: Column): DataFrame = {
    def toks(d: DataFrame) =
      d.select(idCol.as("doc_id"), split(normalized(textCol), " ").as("t"))
    def triOf(d: DataFrame) = {
      val len = greatest(size(col("t")) - 2, lit(0))
      d.select(col("doc_id"), explode(arrays_zip(
          slice(col("t"), lit(1), len).as("w1"),
          slice(col("t"), lit(2), len).as("w2"),
          slice(col("t"), lit(3), len).as("w3"))).as("g"))
        .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"),
          col("g.w3").as("w3"))
    }
    val docTri = triOf(toks(scoreDf))
      .groupBy("doc_id", "w1", "w2", "w3").agg(count(lit(1)).as("k"))
    val mt = toks(modelDf)
    val mUni = mt.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
    val mBi = mt.select(explode(arrays_zip(
        slice(col("t"), lit(1), size(col("t")) - 1).as("a"),
        slice(col("t"), lit(2), size(col("t")) - 1).as("b"))).as("g"))
      .select(col("g.a").as("w1"), col("g.b").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val mTri = triOf(mt.withColumn("doc_id", lit(0L)))
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c3"))
    val nTot = mUni.agg(sum(col("c1")).as("n"))
    val ctx = mBi.select(col("w1"), col("w2"), col("c2").as("ctx_c2"))
    val bok = mBi.select(col("w1").as("w2"), col("w2").as("w3"),
      col("c2").as("bok_c2"))
    val u2 = mUni.select(col("w").as("w2"), col("c1").as("u2_c1"))
    val u3 = mUni.select(col("w").as("w3"), col("c1").as("u3_c1"))
    val scored = docTri
      .join(mTri, Seq("w1", "w2", "w3"), "left")
      .join(ctx, Seq("w1", "w2"), "left")
      .join(bok, Seq("w2", "w3"), "left")
      .join(broadcast(u2), Seq("w2"), "left")
      .join(broadcast(u3), Seq("w3"), "left")
      .crossJoin(broadcast(nTot))
      .withColumn("s",
        when(col("c3").isNotNull,
          floor(col("c3").cast("double") * lit(1000000.0d)
            / col("ctx_c2").cast("double")))
          .when(col("bok_c2").isNotNull,
            floor(col("bok_c2").cast("double") * lit(400000.0d)
              / col("u2_c1").cast("double")))
          .otherwise(floor(coalesce(col("u3_c1"), lit(0L)).cast("double")
            * lit(160000.0d) / col("n").cast("double"))))
    val perDoc = scored.groupBy("doc_id").agg(
      sum(col("k")).as("n_trigrams"),
      floor(sum(col("s") * col("k")).cast("double")
        / sum(col("k")).cast("double")).cast("long").as("bk_ppm"))
    scoreDf.select(idCol.as("doc_id")).join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"), col("bk_ppm"))
  }
}
