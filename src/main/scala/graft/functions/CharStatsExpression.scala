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

  /** One pass over code points; per-class counts bounded by the
    * alphabet, not the text. ASCII (the dominant corpus case) counts in
    * a primitive long[128] — zero per-character allocation; only
    * non-ASCII code points touch the boxed overflow map (HashMap.merge
    * boxes the key and re-boxes the value per hit, which on an
    * all-ASCII corpus would be two garbage objects per character in the
    * scan stage this kernel exists to keep cheap).
    */
  def stats(text: String): InternalRow = {
    val ascii = new Array[Long](128)
    var counts: java.util.HashMap[Integer, java.lang.Long] = null
    var i = 0
    var n = 0L
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (cp < 128) ascii(cp) += 1L
      else {
        if (counts == null) counts = new java.util.HashMap()
        counts.merge(cp, 1L,
          (a: java.lang.Long, b: java.lang.Long) => a + b)
      }
      n += 1L
      i += Character.charCount(cp)
    }
    var sumSq = 0L
    var distinct = 0
    var c = 0
    while (c < 128) {
      val k = ascii(c)
      if (k > 0) { sumSq += k * k; distinct += 1 }
      c += 1
    }
    if (counts != null) {
      val it = counts.values().iterator()
      while (it.hasNext) { val k = it.next(); sumSq += k * k }
      distinct += counts.size()
    }
    new GenericInternalRow(Array[Any](n, sumSq, distinct))
  }
}
