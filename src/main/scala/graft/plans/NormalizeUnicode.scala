package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `normalize_unicode(text, 'NFC'|'NFD'|'NFKC'|'NFKD')`: Unicode
  * normalization as a native expression. A crawl corpus mixes composed and
  * decomposed encodings of identical text ("café" as 4 or 5 codepoints);
  * every downstream exact operator — fingerprint dedup, token counts,
  * phrase search, PII regexes — silently misses matches unless text is
  * normalized first, so this belongs scan-side ahead of all of them.
  *
  * Spark has no normalization built-in; the preference order (built-ins >
  * native Expression > UDF) lands here. The implementation delegates to
  * the JDK's `java.text.Normalizer` (Unicode-conformant ICU-equivalent)
  * through [[NormText.normalize]], with an `isNormalized` fast path that
  * returns the input buffer untouched for already-normal text — the
  * overwhelmingly common case, so the hot path allocates nothing.
  * `doGenCode` emits a direct static call: one virtual-call-free line
  * inside the scan's whole-stage-codegen span.
  */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {
  require(NormText.Forms.contains(form),
    s"normalize_unicode form must be one of ${NormText.Forms.mkString("/")}, got '$form'")

  override def prettyName: String = "normalize_unicode"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_unicode expects a string argument, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType

  private lazy val formEnum = java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(a: Any): Any =
    NormText.normalize(a.asInstanceOf[UTF8String], formEnum)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.NormText.normalize($c, java.text.Normalizer.Form.$form)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

/** Static helper target for [[NormalizeUnicode]]'s generated code (plain
  * object → Java-visible static forwarder, the SketchHash pattern). */
object NormText {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def normalize(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}
