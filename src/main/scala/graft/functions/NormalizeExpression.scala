package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (`unicode_normalize(text, 'NFC')`) —
  * the canonicalization step in front of any text fingerprint: a corpus
  * mixing composed ("é", U+00E9) and decomposed ("e"+U+0301) forms
  * hash-splits identical text into distinct dedup keys, inflating every
  * downstream exact/minhash surface. Spark ships no normalizer
  * function, so this wraps `java.text.Normalizer` as a native
  * UnaryExpression: one JDK call per row inside whole-stage codegen, no
  * encoder round-trip, null-propagating. The form is a plan-time
  * literal validated at construction.
  *
  * Parity note: `java.text.Normalizer` and DuckDB's `nfc_normalize`
  * both implement UAX #15 — the q-entry oracles NFC against it.
  */
case class NormalizeExpression(child: Expression, form: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types._

  NormalizeExpression.formOf(form) // validates at plan time

  override def dataType: DataType = StringType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"unicode_normalize expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(s: Any): Any =
    NormalizeExpression.normalize(s.asInstanceOf[UTF8String], form)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""${ev.value} = graft.functions.NormalizeExpression.normalize(
         |  $s, "$form");""".stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object NormalizeExpression {

  private[functions] def formOf(form: String): java.text.Normalizer.Form =
    form match {
      case "NFC" => java.text.Normalizer.Form.NFC
      case "NFD" => java.text.Normalizer.Form.NFD
      case "NFKC" => java.text.Normalizer.Form.NFKC
      case "NFKD" => java.text.Normalizer.Form.NFKD
      case other => throw new IllegalArgumentException(
        s"unicode_normalize form must be NFC|NFD|NFKC|NFKD, got $other")
    }

  /** Kernel: already-normalized strings (the overwhelming majority of
    * real corpora) short-circuit on the quick-check without allocating.
    */
  def normalize(s: UTF8String, form: String): UTF8String = {
    val j = s.toString
    val f = formOf(form)
    if (java.text.Normalizer.isNormalized(j, f)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(j, f))
  }
}
