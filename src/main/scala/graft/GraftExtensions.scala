package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{BpeSplitExpression, CharStatsExpression,
  DotProductExpression, GearChunksExpression, NormalizeExpression,
  SensorUuidExpression, TextShinglesExpression, VecDot8Expression,
  VecQuantize8Expression, WinnowFpsExpression}

/** Engine extensions registered via `SparkSessionExtensions`: codegen'd
  * Catalyst expressions (`sensor_uuid`, `vec_dot`, `vec_q8`, `vec_dot8`,
  * `text_shingles`, `winnow_fps`, `unicode_normalize`) usable from SQL
  * and `call_function`,
  * plus the [[graft.plans.MonthPruneRule]] optimizer rule (timestamp
  * bounds over store tables imply month partition pruning).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new graft.plans.MonthPruneRule)
    ext.injectPlannerStrategy(_ => new graft.plans.GraftStrategies)
    ext.injectFunction((
      new FunctionIdentifier("sensor_uuid"),
      new ExpressionInfo(classOf[SensorUuidExpression].getName, "sensor_uuid"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "sensor_uuid(name, type_name, unit_name, labels) takes 4 arguments")
        SensorUuidExpression(args(0), args(1), args(2), args(3))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[DotProductExpression].getName, "vec_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot(a, b) takes 2 arguments")
        DotProductExpression(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_q8"),
      new ExpressionInfo(classOf[VecQuantize8Expression].getName, "vec_q8"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "vec_q8(v) takes 1 argument")
        VecQuantize8Expression(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot8"),
      new ExpressionInfo(classOf[VecDot8Expression].getName, "vec_dot8"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "vec_dot8(a, b) takes 2 arguments")
        VecDot8Expression(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("text_shingles"),
      new ExpressionInfo(
        classOf[TextShinglesExpression].getName, "text_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "text_shingles(text, n) takes 2 arguments")
        require(args(1).foldable, "text_shingles n must be a literal")
        TextShinglesExpression(args(0),
          args(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("gear_chunks"),
      new ExpressionInfo(
        classOf[GearChunksExpression].getName, "gear_chunks"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "gear_chunks(text, mask_bits) takes 2 arguments")
        require(args(1).foldable, "gear_chunks mask_bits must be a literal")
        GearChunksExpression(args(0),
          args(1).eval().asInstanceOf[Number].intValue())
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_split"),
      new ExpressionInfo(classOf[BpeSplitExpression].getName, "bpe_split"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "bpe_split(word) takes 1 argument")
        BpeSplitExpression(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("char_stats"),
      new ExpressionInfo(classOf[CharStatsExpression].getName, "char_stats"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "char_stats(text) takes 1 argument")
        CharStatsExpression(args(0))
      }))
    ext.injectFunction((
      new FunctionIdentifier("unicode_normalize"),
      new ExpressionInfo(
        classOf[NormalizeExpression].getName, "unicode_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "unicode_normalize(text, form) takes 2 arguments")
        require(args(1).foldable, "unicode_normalize form must be a literal")
        NormalizeExpression(args(0),
          args(1).eval().asInstanceOf[
            org.apache.spark.unsafe.types.UTF8String].toString)
      }))
    ext.injectFunction((
      new FunctionIdentifier("winnow_fps"),
      new ExpressionInfo(classOf[WinnowFpsExpression].getName, "winnow_fps"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "winnow_fps(text, k, w) takes 3 arguments")
        require(args(1).foldable && args(2).foldable,
          "winnow_fps k and w must be literals")
        WinnowFpsExpression(args(0),
          args(1).eval().asInstanceOf[Number].intValue(),
          args(2).eval().asInstanceOf[Number].intValue())
      }))
  }
}
