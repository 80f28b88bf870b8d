package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass character statistics (`char_stats(text)`):
  * struct(n_chars, sum_sq, distinct_chars) over CODE POINTS — the
  * inputs to exact character-diversity quality scoring (Simpson index
  * 1 − Σc²/n²) without materializing a row per character. The naive
  * relational form explodes the corpus to one row per char and shuffles
  * on (doc, char); this kernel keeps the whole computation in the scan
  * stage, emitting three integers per document.
  *
  * Integer outputs are the point: every downstream diversity/ratio
  * derivation is exact integer math plus at most one IEEE division, so
  * thresholds replay bit-identically on any engine (no ln, no
  * data-ordered float accumulation — the reason Simpson is preferred
  * over Shannon entropy for an oracled surface).
  *
  * Code-point (not UTF-16 char) indexing throughout — the q136 lesson:
  * surrogate pairs count once, matching any engine that indexes
  * characters.
  */
case class CharStatsExpression(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types._

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("sum_sq", LongType, nullable = false),
    StructField("distinct_chars", IntegerType, nullable = false)))

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"char_stats expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(s: Any): Any =
    CharStatsExpression.stats(s.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CharStatsExpression.stats(" +
        s"$s.toString());")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object CharStatsExpression {

  /** One pass over code points; per-class counts in a hash map whose
    * size is bounded by the alphabet, not the text.
    */
  def stats(text: String): InternalRow = {
    val counts = new java.util.HashMap[Integer, Long]()
    var i = 0
    var n = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      counts.merge(cp, 1L, (a, b) => a + b)
      n += 1L
      i += Character.charCount(cp)
    }
    var sumSq = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); sumSq += c * c }
    new GenericInternalRow(Array[Any](n, sumSq, counts.size()))
  }
}
