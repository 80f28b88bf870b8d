package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.SensorUuidExpression

/** Engine extensions registered via `SparkSessionExtensions` (the custom-
  * expression extension path): `sensor_uuid(name, type, unit, labels)` as
  * a codegen'd Catalyst expression, usable from SQL and `call_function`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("sensor_uuid"),
      new ExpressionInfo(classOf[SensorUuidExpression].getName, "sensor_uuid"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "sensor_uuid(name, type_name, unit_name, labels) takes 4 arguments")
        SensorUuidExpression(args(0), args(1), args(2), args(3))
      }))
  }
}
