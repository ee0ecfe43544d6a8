package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native expression — the canonicalization
  * stage of a text-cleaning pipeline (crawl text arrives in a mix of
  * composed and decomposed forms; fingerprints, shingles, and exact-dedup
  * keys all disagree across the two unless normalized first). Spark has no
  * built-in for this; a Scala UDF would pay the closure/encoder boundary
  * per row, so this wraps `java.text.Normalizer` (JDK ICU subset) in a
  * codegen'd unary expression — the same shape as the engine's other
  * native scalar functions.
  *
  * `form` is one of NFC | NFD | NFKC | NFKD (validated at plan time, not
  * per row); the resolved `java.text.Normalizer.Form` is cached in the
  * expression instance that codegen references.
  */
case class UnicodeNormalizeExpr(child: Expression, form: String) extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unsupported normalization form: $form")

  @transient private lazy val jForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def prettyName: String = s"unicode_normalize_$form"

  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(java.text.Normalizer.normalize(s.toString, jForm))

  override protected def nullSafeEval(input: Any): Any =
    normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("normExpr", this, classOf[UnicodeNormalizeExpr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.normalize($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalizeExpr =
    copy(child = newChild)
}

/** Whitespace token count in one allocation-free byte pass — value-identical
  * to `size(split(trim(regexp_replace(s, "\\s+", " ")), " "))`, the standard
  * SQL-portable token counter (and the form the DuckDB oracles compute):
  * the count of maximal runs of non-whitespace, EXCEPT that an empty or
  * all-whitespace string counts 1 (split of the empty string yields [""] in
  * both engines — the artifact is part of the contract). Whitespace is Java
  * regex `\s` = the six ASCII chars [ \t\n\x0B\f\r], all single-byte in
  * UTF-8 with the high bit clear, so a byte scan never splits a multi-byte
  * code point. The regexp+split composition this replaces allocates the full
  * token array per row just to take its length — on a 100 TB text column the
  * difference is the scan's GC budget. */
case class WsTokenCountExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "ws_token_count"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    WsTokenCountExpr.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WsTokenCountExpr.count($c)")

  override protected def withNewChildInternal(newChild: Expression): WsTokenCountExpr =
    copy(child = newChild)
}

object WsTokenCountExpr {
  def count(s: UTF8String): Long = {
    val n = s.numBytes()
    var runs = 0L
    var inRun = false
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      val ws = b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'
      if (!ws && !inRun) { runs += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    if (runs == 0L) 1L else runs // split("") == [""] in every engine
  }
}

/** All five Gopher-gate metrics (Rae et al. 2021 A1.1) in ONE
  * allocation-free byte pass — value-identical to the five-expression
  * regex/HOF composition the DuckDB oracles compute (which pays two
  * interpreted lambda filters, three regexp passes, and a token-array
  * allocation per row — on a 100 TB quality sweep that composition IS the
  * scan cost). Returns `array<long>` of:
  *
  *   1. n_words      — `size(split(trim(text), "\s+"))`: count of non-ws
  *                     runs after stripping 0x20 (and ONLY 0x20 — Spark
  *                     trim) from both ends, PLUS one leading/trailing
  *                     empty token when the trimmed region starts/ends in
  *                     non-space whitespace, and 1 for the empty region
  *                     (split("") == [""]) — the exact split(-1) contract.
  *   2. nsp_chars    — codepoints not in Java-regex `\s` (the six ASCII
  *                     chars [ \t\n\x0B\f\r]; a codepoint = a non-
  *                     continuation byte, so multi-byte chars count once —
  *                     `length(regexp_replace(text, "\s", ""))`).
  *   3. alpha_words  — runs containing ≥1 ASCII letter
  *                     (`filter(toks, rlike("[A-Za-z]"))`).
  *   4. stop_types   — DISTINCT Gopher stopwords present as exact tokens
  *                     (the/be/to/of/and/that/have/with), via bitmask.
  *   5. symbols      — '#' codepoints + leftmost non-overlapping '...'
  *                     matches (the regex-replace length-delta contract).
  *
  * Whitespace and letters are ASCII-only by the composition's own
  * definition, so the byte scan never splits a multi-byte code point. */
case class GopherStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gopher_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    GopherStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherStatsExpr.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {
  private val StopWords: Array[Array[Byte]] =
    Array("the", "be", "to", "of", "and", "that", "have", "with")
      .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  private def matchStop(s: UTF8String, off: Int, len: Int): Int = {
    var m = 0
    var w = 0
    while (w < StopWords.length) {
      val sw = StopWords(w)
      if (sw.length == len) {
        var j = 0
        while (j < len && s.getByte(off + j) == sw(j)) j += 1
        if (j == len) m |= 1 << w
      }
      w += 1
    }
    m
  }

  def stats(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = s.numBytes()
    // full-string counters: non-ws codepoints, '#' chars, '...' runs.
    // An ellipsis consumes its three dots atomically (leftmost non-
    // overlapping, the regex contract) — they still count as 3 nsp chars.
    var nsp = 0L
    var hashes = 0L
    var ellipses = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b == '.' && i + 2 < n && s.getByte(i + 1) == '.' && s.getByte(i + 2) == '.') {
        ellipses += 1; nsp += 3; i += 3
      } else {
        if ((b & 0xC0) != 0x80 && !isWs(b)) nsp += 1
        if (b == '#') hashes += 1
        i += 1
      }
    }
    // token region: strip 0x20 (and only 0x20) from both ends — Spark trim
    var lo = 0
    while (lo < n && s.getByte(lo) == ' ') lo += 1
    var hi = n
    while (hi > lo && s.getByte(hi - 1) == ' ') hi -= 1
    var nWords = 0L
    var alphaWords = 0L
    var stopMask = 0
    if (hi == lo) nWords = 1L // split("") == [""]
    else {
      // split(…, -1) keeps a leading/trailing empty token when the region
      // starts/ends in (non-space) whitespace
      if (isWs(s.getByte(lo))) nWords += 1
      if (isWs(s.getByte(hi - 1))) nWords += 1
      var j = lo
      var runStart = -1
      var runAlpha = false
      while (j <= hi) {
        val inWord = j < hi && !isWs(s.getByte(j))
        if (inWord) {
          val b = s.getByte(j)
          if (runStart < 0) { runStart = j; runAlpha = false }
          if ((b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')) runAlpha = true
        } else if (runStart >= 0) {
          nWords += 1
          if (runAlpha) alphaWords += 1
          stopMask |= matchStop(s, runStart, j - runStart)
          runStart = -1
        }
        j += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(nWords, nsp, alphaWords,
        java.lang.Integer.bitCount(stopMask).toLong, hashes + ellipses))
  }
}

/** All thirteen Gopher REPETITION metrics (Rae et al. 2021, appendix A1.1
  * Table A1 — the "repetitious documents" half of the MassiveText gate;
  * the quality half is [[GopherStatsExpr]]) in one scan-local pass per
  * document. Returns `array<long>` of exact ppm integers:
  *
  *   1-2   dup_line_ppm, dup_line_char_ppm — over `\n`-split non-empty
  *         segments: occurrences belonging to a segment that appears ≥ 2
  *         times, as a fraction of all occurrences (resp. of their
  *         codepoint mass).
  *   3-4   dup_para_ppm, dup_para_char_ppm — same over `\n\n`-split
  *         non-empty segments (plain substring split, left-to-right
  *         non-overlapping, exactly `string_split`).
  *   5-7   top_{2,3,4}gram_ppm — codepoint mass of the most frequent
  *         word n-gram (count × token chars of the gram, spaces excluded)
  *         over total token chars; ties break to the UTF-8-byte-smallest
  *         gram (= DuckDB/Spark binary string order).
  *   8-13  dup_{5..10}gram_ppm — codepoint mass of ALL occurrences of
  *         word n-grams appearing ≥ 2 times, over total token chars —
  *         the overlap-ignoring convention of the public implementations
  *         (each occurrence counts its full gram mass).
  *
  * Words are `\s+`-split non-empty tokens; n-gram occurrences slide with
  * overlap. Every ratio is floor(x·1e6) over IEEE doubles (0 when the
  * denominator is 0) — bit-identical to a SQL oracle computing the same
  * formula. One hash map per (row, n) over the token array; no shuffle,
  * no explode — the per-document metric never leaves its scan task. */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.stats(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsExpr.stats($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {

  @inline private def ppm(num: Double, den: Double): Long =
    if (den == 0.0d) 0L else math.floor(num * 1000000.0d / den).toLong

  @inline private def cp(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** dup-occurrence and dup-codepoint ppm over non-empty segments. */
  private def dupSegments(segs: Array[String]): (Long, Long) = {
    val m = new java.util.HashMap[String, Int]()
    var total = 0L
    var totalC = 0L
    var i = 0
    while (i < segs.length) {
      val u = segs(i)
      if (u.nonEmpty) { m.merge(u, 1, Integer.sum); total += 1; totalC += cp(u) }
      i += 1
    }
    var dup = 0L
    var dupC = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue.intValue()
      if (c >= 2) { dup += c; dupC += c.toLong * cp(e.getKey) }
    }
    (ppm(dup.toDouble, total.toDouble), ppm(dupC.toDouble, totalC.toDouble))
  }

  /** UTF-8 byte order — the binary collation DuckDB and Spark sort
    * VARCHARs by; Java String.compareTo is UTF-16 order, which disagrees
    * on supplementary-plane characters. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** (top-gram codepoint mass, dup-gram codepoint mass) for one n. */
  private def gramMass(toks: Array[String], tokCp: Array[Long], n: Int): (Long, Long) = {
    if (toks.length < n) return (0L, 0L)
    val m = new java.util.HashMap[String, Array[Long]]() // gram -> [count, cpMass]
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + n <= toks.length) {
      sb.setLength(0)
      var mass = 0L
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        mass += tokCp(i + j)
        j += 1
      }
      val key = sb.toString
      val slot = m.get(key)
      if (slot == null) m.put(key, Array(1L, mass))
      else slot(0) += 1L
      i += 1
    }
    var topKey: String = null
    var topCount = 0L
    var topMass = 0L
    var dupMass = 0L
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue()(0)
      val mass = e.getValue()(1)
      if (c > topCount || (c == topCount && utf8Lt(e.getKey, topKey))) {
        topCount = c; topMass = c * mass; topKey = e.getKey
      }
      if (c >= 2L) dupMass += c * mass
    }
    (topMass, dupMass)
  }

  def stats(s: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val text = s.toString
    val (dl, dlc) = dupSegments(text.split("\n", -1))
    val (dp, dpc) = dupSegments(text.split("\n\n", -1))
    val toks = text.split("\\s+").filter(_.nonEmpty)
    val tokCp = new Array[Long](toks.length)
    var totalTokCp = 0L
    var i = 0
    while (i < toks.length) {
      tokCp(i) = cp(toks(i)); totalTokCp += tokCp(i); i += 1
    }
    val out = new Array[Long](13)
    out(0) = dl; out(1) = dlc; out(2) = dp; out(3) = dpc
    var n = 2
    while (n <= 10) {
      val (topMass, dupMass) = gramMass(toks, tokCp, n)
      out(2 + n) =
        if (n <= 4) ppm(topMass.toDouble, totalTokCp.toDouble)
        else ppm(dupMass.toDouble, totalTokCp.toDouble)
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Shannon entropy of a document's code-point distribution — the classic
  * gibberish/boilerplate signal (near-zero for repeated-character spam,
  * anomalously high for encoded binary-in-text; used alongside the Gopher
  * gates in crawl-cleaning pipelines). One codegen'd pass per row; terms
  * sum in code-point order, so the value is deterministic across the
  * cluster. Consumers round to 6 decimals before any cross-engine
  * comparison (the DuckDB oracle sums its groupBy in arbitrary order —
  * identical to the last ulp only after rounding, same contract as the
  * cosine scores). */
case class CharEntropyExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "char_entropy"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string input, got ${other.simpleString}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropyExpr.entropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropyExpr.entropy($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropyExpr =
    copy(child = newChild)
}

object CharEntropyExpr {
  def entropy(s: UTF8String): Double = {
    val str = s.toString
    if (str.isEmpty) return 0.0
    // ASCII fast path + sorted map for the long tail: iteration order is
    // code-point order either way, so the sum order is deterministic
    val ascii = new Array[Long](128)
    var rest: java.util.TreeMap[Integer, Long] = null
    var n = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp < 128) ascii(cp) += 1
      else {
        if (rest == null) rest = new java.util.TreeMap[Integer, Long]()
        val prev = rest.get(cp)
        rest.put(cp, if (prev == null) 1L else prev + 1L)
      }
      n += 1
      i += Character.charCount(cp)
    }
    val dn = n.toDouble
    var h = 0.0
    var c = 0
    while (c < 128) {
      if (ascii(c) > 0) { val p = ascii(c) / dn; h -= p * math.log(p) }
      c += 1
    }
    if (rest != null) {
      val it = rest.values().iterator()
      while (it.hasNext) { val p = it.next() / dn; h -= p * math.log(p) }
    }
    h
  }
}
