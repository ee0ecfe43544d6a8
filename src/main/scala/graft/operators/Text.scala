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

  /** Content fingerprint: md5 of the normalized text — the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Bag-of-words fingerprint: md5 over the sorted distinct token set.
    * Catches shuffled/reordered duplicates that byte-exact hashing misses. */
  def wordSetFingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(split(normalized(text), " "))), " ").cast("binary"))

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column = size(split(trim(text), "\\s+"))

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

  /** PII-pattern counts per document (email-shaped strings, long digit
    * runs) — the redaction-stage signal of a cleaning pipeline. Patterns are
    * RE2-compatible so every engine scores identically. */
  def piiCounts(text: Column): (Column, Column) = (
    size(regexp_extract_all(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(0))),
    size(regexp_extract_all(text, lit("[0-9]{6,}"), lit(0))))

  private val EnStopwords = Seq("the", "a", "an", "of", "and", "in", "to", "is")

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
}
