package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-normalization kernel (SURVEY §2.H7) — the Spark analog of
  * the reference's `utf8_normalize` compute kernel
  * (cpp/src/arrow/compute/kernels/scalar_string_utf8.cc): canonical /
  * compatibility (de)composition of UTF-8 strings, NFC by default.
  *
  * Implemented as a native expression so it stays inside whole-stage
  * codegen on the documents scan — normalization is the first step of
  * every text-curation pipeline and runs over 100% of corpus bytes.
  */
object TextNormRuntime {

  val formNames: Seq[String] = Seq("NFC", "NFD", "NFKC", "NFKD")

  def formOf(name: String): Normalizer.Form = name.toUpperCase match {
    case "NFC" => Normalizer.Form.NFC
    case "NFD" => Normalizer.Form.NFD
    case "NFKC" => Normalizer.Form.NFKC
    case "NFKD" => Normalizer.Form.NFKD
    case other => throw new IllegalArgumentException(
      s"unicode_normalize: unknown form '$other' (expected one of ${formNames.mkString("/")})")
  }

  /** Normalize one value. Fast path: already-normalized text (all of
    * ASCII, i.e. the overwhelming share of corpus bytes) returns the
    * input UTF8String untouched — no String round-trip.
    */
  def normalize(s: UTF8String, form: Normalizer.Form): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }
}

/** unicode_normalize(str[, 'NFC'|'NFD'|'NFKC'|'NFKD']) → str. */
case class UnicodeNormalize(child: Expression, formName: String = "NFC")
    extends UnaryExpression {

  // validate eagerly: a bad form is a query-authoring error
  private val form: Normalizer.Form = TextNormRuntime.formOf(formName)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string, got $other")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override protected def nullSafeEval(input: Any): Any =
    TextNormRuntime.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      // form is whitelist-validated above, so the enum access is safe
      s"graft.functions.TextNormRuntime.normalize($c, java.text.Normalizer.Form.${form.name()})")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}
