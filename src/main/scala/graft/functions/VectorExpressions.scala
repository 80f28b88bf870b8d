package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns — the native-
  * `Expression` upgrade over a Scala UDF for the similarity kernels: the
  * UDF pays an encoder round-trip per call (each array materialized as a
  * boxed `Seq[Double]`, ~µs/pair); this reads Catalyst's internal
  * ArrayData directly (`toDoubleArray` is an unboxed copy) and stays
  * inside whole-stage codegen.
  *
  * Fold order is the same left-to-right sum the UDF performed, so
  * results are bitwise identical — oracle parity is unaffected. Arrays
  * must not contain nulls (the embeddings contract); a length mismatch
  * FAILS LOUDLY (IllegalArgumentException): ragged embeddings are
  * corrupt input, and a silent shorter-prefix dot product would rank
  * candidates on garbage similarity.
  */
case class DotProductExpression(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // no ExpectsInputTypes (AbstractDataType is private[sql] in Spark 4):
  // reject non-double arrays explicitly — toDoubleArray on an int array
  // would reinterpret raw bytes and return silent garbage
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.types.ArrayType
    def isDoubleArray(t: org.apache.spark.sql.types.DataType): Boolean =
      t match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      }
    if (Seq(left, right).forall(e => isDoubleArray(e.dataType)))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<double>, array<double>), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpression.dot(
      a.asInstanceOf[ArrayData].toDoubleArray(),
      b.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.DotProductExpression.dot(" +
        s"$a.toDoubleArray(), $b.toDoubleArray());")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductExpression {
  /** Sequential left-to-right fold; mismatched dimensions fail loudly
    * (a truncated dot product is a plausible-but-wrong score).
    */
  def dot(x: Array[Double], y: Array[Double]): Double = {
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"vec_dot: dimension mismatch (${x.length} vs ${y.length})")
    var s = 0.0
    var i = 0
    val n = x.length
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }
}

/** Codegen'd int8 scalar quantization of an `array<double>` embedding —
  * the 100 TB storage/bandwidth path: 8× smaller than float64 (the
  * vector becomes BINARY, one byte per dimension) at ~0.4% max
  * per-dimension error, the standard serving trick for billion-vector
  * ANN (quantized first pass, exact rerank of the survivors).
  *
  * Output: `struct(scale: double, q: binary)` with
  * `q_i = floor(x_i·127/amax + 0.5)` (half-up — spelled as floor so any
  * engine replays it bit-for-bit; `round` disagrees between engines on
  * negative halves), `scale = amax/127`, so `x̂_i = q_i·scale`. An
  * all-zero vector quantizes to scale 0 and zero bytes.
  */
case class VecQuantize8Expression(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types._

  override def dataType: DataType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", BinaryType, nullable = false)))

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_q8 expects array<double>, got ${other.simpleString}")
    }

  override protected def nullSafeEval(a: Any): Any =
    VecQuantize8Expression.quantize(
      a.asInstanceOf[ArrayData].toDoubleArray())

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecQuantize8Expression.quantize(" +
        s"$a.toDoubleArray());")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object VecQuantize8Expression {
  def quantize(x: Array[Double]): InternalRow = {
    var amax = 0.0
    var i = 0
    while (i < x.length) {
      val a = math.abs(x(i))
      if (a > amax) amax = a
      i += 1
    }
    val q = new Array[Byte](x.length)
    val scale = if (amax == 0.0) 0.0 else amax / 127.0
    if (amax != 0.0) {
      i = 0
      while (i < x.length) {
        q(i) = math.floor(x(i) * 127.0 / amax + 0.5).toByte
        i += 1
      }
    }
    InternalRow(scale, q)
  }
}

/** Codegen'd int dot product over two int8-quantized vectors (BINARY
  * columns from [[VecQuantize8Expression]]) — pure integer arithmetic,
  * exact at any fold order; 64 dims stay far inside Long range.
  */
case class VecDot8Expression(left: Expression, right: Expression)
    extends BinaryExpression {

  import org.apache.spark.sql.types._

  override def dataType: DataType = LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vec_dot8 expects (binary, binary), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecDot8Expression.dot8(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecDot8Expression.dot8($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VecDot8Expression {
  def dot8(x: Array[Byte], y: Array[Byte]): Long = {
    // fail loudly: silently truncating to the shorter operand would
    // return a plausible-but-wrong score and corrupt ANN rankings
    // undetectably downstream
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"vec_dot8: dimension mismatch (${x.length} vs ${y.length})")
    var s = 0L
    var i = 0
    val n = x.length
    while (i < n) { s += x(i).toLong * y(i).toLong; i += 1 }
    s
  }
}

/** Codegen'd distinct word n-gram shingles straight from the text
  * column — the dedup family's hottest scan expression. Replaces the
  * `split(trim(text)) → shingles-UDF` chain: the UDF paid an encoder
  * round-trip per document (tokens materialized as a boxed Seq[String],
  * shingle array re-encoded on the way out); this reads the UTF8String
  * once and emits Catalyst array data directly, staying inside
  * whole-stage codegen.
  *
  * Parity contract (pinned by test): identical output to
  * `shingles(split(trim(text), "\s+"), n)` — ASCII-space-only trim
  * (UTF8String.trim == Spark's StringTrim), `String.split("\s+", -1)`
  * tokenization (what Spark's `split` runs), single-space joins,
  * first-occurrence distinct order.
  */
case class TextShinglesExpression(child: Expression, n: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types._

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"text_shingles expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(s: Any): Any =
    TextShinglesExpression.shingle(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextShinglesExpression.shingle($s, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

/** Codegen'd winnowing fingerprints (the MOSS scheme) — the rolling-
  * hash scale path of `TextAnalysis.winnowingFingerprints`, lifted from
  * a UDF to a native Expression: same per-document loop, no encoder
  * round-trip, stays inside whole-stage codegen. Output and
  * normalization are bit-identical to the UDF (Java `String.trim`,
  * lowercase, whitespace collapse, polynomial base 1000003, rightmost
  * window minimum, distinct sorted).
  */
case class WinnowFpsExpression(child: Expression, k: Int, w: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  import org.apache.spark.sql.types._

  require(k >= 1 && w >= 1, "k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps expects string, got ${other.simpleString}")
    }

  override protected def nullSafeEval(s: Any): Any =
    WinnowFpsExpression.fingerprints(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      k, w)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.WinnowFpsExpression.fingerprints(" +
        s"$s.toString(), $k, $w);")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WinnowFpsExpression {
  private val EMPTY =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array.empty[Long])

  // hoisted: replaceAll compiles a fresh Pattern per row otherwise —
  // pure repeated work in a per-document scan kernel
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  def fingerprints(s: String, k: Int, w: Int): ArrayData = {
    val t = WsPattern.matcher(s.trim.toLowerCase).replaceAll(" ")
    val n = t.length
    if (n < k) return EMPTY
    val B = 1000003L
    var bPow = 1L // B^(k-1)
    var i = 1
    while (i < k) { bPow *= B; i += 1 }
    val m = n - k + 1
    val hashes = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + t.charAt(i); i += 1 }
    hashes(0) = h
    i = 1
    while (i < m) {
      h = (h - t.charAt(i - 1) * bPow) * B + t.charAt(i + k - 1)
      hashes(i) = h
      i += 1
    }
    // sliding-window minimum, rightmost tie (standard winnowing)
    val selected = new java.util.TreeSet[java.lang.Long]()
    var minIdx = -1
    var start = 0
    val lastStart = math.max(0, m - w)
    while (start <= lastStart) {
      val end = math.min(start + w, m)
      if (minIdx < start) {
        minIdx = start
        var j = start + 1
        while (j < end) {
          if (hashes(j) <= hashes(minIdx)) minIdx = j
          j += 1
        }
      } else {
        val j = end - 1
        if (hashes(j) <= hashes(minIdx)) minIdx = j
      }
      selected.add(hashes(minIdx))
      start += 1
    }
    val out = new Array[Long](selected.size())
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object TextShinglesExpression {
  private val EMPTY =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])

  def shingle(
      text: org.apache.spark.unsafe.types.UTF8String,
      n: Int): ArrayData = {
    // UTF8String.trim trims ASCII spaces only — same as Spark's trim()
    val toks = text.trim().toString.split("\\s+", -1)
    if (toks.length < n) return EMPTY
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    val last = toks.length - n
    while (i <= last) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
