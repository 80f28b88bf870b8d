package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `linear_rlike(value, pattern-literal)` — the drop-in replacement for
  * `rlike` on every USER-SUPPLIED regex path (label matchers, catalog
  * `name_regex`, PromQL `label_replace`). The pattern is compiled ONCE at
  * construction (driver side: invalid patterns fail the query build and
  * map to HTTP 400, same as the reference's regex-crate parse errors);
  * matching runs the linear-time [[LinearRegex]] Pike VM, so a hostile
  * pattern cannot backtrack-pin an executor the way `java.util.regex`
  * behind `rlike` can (reference immunity: the Rust regex crate,
  * src/storage/sqlite/storage.rs:46-48, is linear by construction).
  *
  * Stays inside whole-stage codegen: the compiled NFA is shipped as a
  * reference object and invoked as a plain method call.
  */
case class LinearRegexMatchExpression(child: Expression, regex: String)
    extends UnaryExpression {

  // compiled eagerly: construction is the validation point
  @transient private lazy val compiled: LinearRegex =
    LinearRegex.compile(regex)
  // force driver-side validation at construction
  LinearRegex.compile(regex)

  override def dataType: DataType = BooleanType
  override def prettyName: String = "linear_rlike"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"linear_rlike expects a string value, got ${child.dataType.simpleString}")

  override protected def nullSafeEval(v: Any): Any =
    compiled.find(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val re = ctx.addReferenceObj("linearRe", compiled,
      classOf[LinearRegex].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $re.find($v.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `linear_regex_replace_full(value, pattern-literal, replacement-literal)`
  * — Prometheus `label_replace` semantics: the pattern must match the
  * WHOLE value; returns the expanded replacement (`$1`/`${name}` capture
  * references) on match, NULL on non-match. Linear-time like the match
  * expression; capture tracking runs the Pike VM with save slots.
  */
case class LinearRegexReplaceFullExpression(
    child: Expression, regex: String, replacement: String)
    extends UnaryExpression {

  @transient private lazy val compiled: LinearRegex =
    LinearRegex.compile(regex)
  LinearRegex.compile(regex)

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "linear_regex_replace_full"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "linear_regex_replace_full expects a string value, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(v: Any): Any = {
    val r = compiled.replaceFull(v.asInstanceOf[UTF8String].toString,
      replacement)
    if (r == null) null else UTF8String.fromString(r)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val re = ctx.addReferenceObj("linearRe", compiled,
      classOf[LinearRegex].getName)
    val repl = ctx.addReferenceObj("repl", replacement, "java.lang.String")
    val r = ctx.freshName("linRepl")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |java.lang.String $r = $re.replaceFull($v.toString(), $repl);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.unsafe.types.UTF8String.fromString($r);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
