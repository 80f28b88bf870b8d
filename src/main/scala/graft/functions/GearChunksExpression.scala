package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData

import graft.pipeline.GearTable

/** Codegen'd content-defined chunking (the FastCDC/gear family) — the
  * scale path of `TextAnalysis.cdcChunksGear`, lifted from a UDF to a
  * native Expression: the per-document rolling-gear loop runs inside
  * whole-stage codegen with no encoder round-trip. Output is
  * bit-identical to the UDF twin (pinned in PipelineSpec): same
  * normalization (lowercase, whitespace collapse, trim), same
  * code-point indexing, same [[GearTable]] recurrence and spread mask,
  * same md5-60 chunk fingerprints.
  *
  * Returns `array<struct<fp: long, len: int, start: int>>` — one row
  * per chunk, lengths and offsets in CODE POINTS (SQL `substr`
  * semantics; see the q121 oracle).
  */
case class GearChunksExpression(child: Expression, maskBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types._

  GearTable.mask(maskBits) // validates the range at plan time

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("start", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gear_chunks expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(s: Any): Any =
    GearChunksExpression.chunks(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      maskBits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.GearChunksExpression.chunks(" +
        s"$s.toString(), $maskBits);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object GearChunksExpression {

  private val EMPTY =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Any])

  // per-row hot-path hoists: Pattern.compile per replaceAll and the
  // JCA provider lookup in MessageDigest.getInstance are fixed costs
  // multiplied by corpus row count — exactly what this kernel exists
  // to avoid. MD5 instances are not thread-safe → one per task thread.
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")
  private val Md5 =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The chunking kernel: normalize → code points → rolling gear hash
    * (one table lookup per code point) → boundary where the spread
    * mask bits are all zero → md5-60 fingerprint per chunk.
    */
  def chunks(s: String, maskBits: Int): ArrayData = {
    val mask = GearTable.mask(maskBits)
    val gear = GearTable.values
    val t = WsPattern.matcher(s.toLowerCase).replaceAll(" ").trim
    val cps = t.codePoints().toArray
    val n = cps.length
    if (n == 0) return EMPTY
    val md = Md5.get()
    val cuts = new java.util.ArrayList[Integer]()
    cuts.add(0)
    var h = 0
    var p = 0
    while (p < n) {
      h = ((h << 1) + gear(cps(p) & 0xff)) & (GearTable.Mod - 1)
      // a boundary at the last code point coincides with the end bound
      if ((h & mask) == 0 && p + 1 < n) cuts.add(p + 1)
      p += 1
    }
    cuts.add(n)
    val out = new Array[Any](cuts.size() - 1)
    var i = 0
    while (i < cuts.size() - 1) {
      val a = cuts.get(i).intValue
      val b = cuts.get(i + 1).intValue
      md.reset()
      val dig = md.digest(new String(cps, a, b - a).getBytes("UTF-8"))
      var fp = 0L
      var j = 0
      while (j < 7) { fp = (fp << 8) | (dig(j) & 0xffL); j += 1 }
      fp = (fp << 4) | ((dig(7) & 0xf0L) >>> 4)
      out(i) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(Array[Any](fp, b - a, a))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
