package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
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
