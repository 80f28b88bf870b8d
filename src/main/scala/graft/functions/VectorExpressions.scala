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
  * must not contain nulls (the embeddings contract); length mismatch
  * folds over the shorter prefix, matching the UDF's `min(len)` guard.
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
  /** Sequential left-to-right fold over the common prefix. */
  def dot(x: Array[Double], y: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) { s += x(i) * y(i); i += 1 }
    s
  }
}
