package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.MapData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.model.{Sensor, SensorType, SensorUnit}

/** Codegen'd Catalyst expression for content-addressed sensor UUIDs
  * (F13; reference: src/datamodel/sensor.rs:74-178) — the native-
  * `Expression` upgrade over the Scala UDF: no encoder/serializer
  * round-trip per row, stays inside whole-stage codegen (the generated
  * code calls [[SensorUuidExpression.derive]] directly on Catalyst's
  * internal UTF8String/MapData values).
  *
  * `sensor_uuid(name, type_name, unit_name|null, labels_map|null)`.
  */
case class SensorUuidExpression(
    name: Expression,
    typeName: Expression,
    unitName: Expression,
    labels: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(name, typeName, unitName, labels)

  // analysis-time validation (ExpectsInputTypes is unavailable —
  // AbstractDataType is private[sql] in Spark 4 — so the check is
  // spelled out): without it a wrong-typed argument would pass analysis
  // and ClassCastException mid-job in eval/codegen
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    import org.apache.spark.sql.types.{MapType, NullType}
    def isStr(dt: DataType) = dt == StringType || dt == NullType
    val labelsOk = labels.dataType match {
      case NullType => true
      case MapType(StringType, StringType, _) => true
      case _ => false
    }
    if (isStr(name.dataType) && isStr(typeName.dataType) &&
        isStr(unitName.dataType) && labelsOk)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "sensor_uuid expects (string, string, string, " +
        s"map<string,string>), got (${name.dataType.simpleString}, " +
        s"${typeName.dataType.simpleString}, " +
        s"${unitName.dataType.simpleString}, " +
        s"${labels.dataType.simpleString})")
  }

  override def dataType: DataType = StringType

  /** null name or type → null uuid; unit/labels null means absent. */
  override def nullable: Boolean = true

  override def eval(input: InternalRow): Any = {
    val n = name.eval(input)
    val t = typeName.eval(input)
    if (n == null || t == null) return null
    SensorUuidExpression.derive(
      n.asInstanceOf[UTF8String], t.asInstanceOf[UTF8String],
      unitName.eval(input).asInstanceOf[UTF8String],
      labels.eval(input).asInstanceOf[MapData])
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val nameGen = name.genCode(ctx)
    val typeGen = typeName.genCode(ctx)
    val unitGen = unitName.genCode(ctx)
    val labelsGen = labels.genCode(ctx)
    val cls = SensorUuidExpression.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(code =
      code"""
        ${nameGen.code}
        ${typeGen.code}
        ${unitGen.code}
        ${labelsGen.code}
        boolean ${ev.isNull} = ${nameGen.isNull} || ${typeGen.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = $cls.derive(
            ${nameGen.value}, ${typeGen.value},
            ${unitGen.isNull} ? null : ${unitGen.value},
            ${labelsGen.isNull} ? null : ${labelsGen.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(name = newChildren(0), typeName = newChildren(1),
      unitName = newChildren(2), labels = newChildren(3))
}

object SensorUuidExpression {

  /** Row-level derivation on Catalyst internal types (called from both
    * interpreted eval and generated code).
    */
  def derive(
      name: UTF8String,
      typeName: UTF8String,
      unitName: UTF8String,
      labels: MapData): UTF8String = {
    val t = SensorType.fromString(typeName.toString).getOrElse(
      throw new IllegalArgumentException(s"bad sensor type: $typeName"))
    val unit = Option(unitName).map(u => SensorUnit(u.toString))
    val labelSeq =
      if (labels == null) Nil
      else {
        val ks = labels.keyArray()
        val vs = labels.valueArray()
        (0 until labels.numElements()).map(i =>
          ks.getUTF8String(i).toString -> vs.getUTF8String(i).toString)
      }
    UTF8String.fromString(Sensor.deriveUuid(name.toString, t, unit, labelSeq))
  }
}
