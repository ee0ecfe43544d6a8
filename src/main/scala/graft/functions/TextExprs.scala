package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
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
