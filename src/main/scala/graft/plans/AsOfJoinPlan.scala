package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join: for each left row, the most recent right row
  * with `rightTs <= leftTs` in the same key group (inner semantics —
  * unmatched left rows drop). Spark has no native as-of operator;
  * this node + [[GraftStrategies]] + [[AsOfJoinExec]] provide one —
  * the tier-(c) extension route (custom LogicalPlan → Strategy →
  * SparkPlan) for semantics the composable operators can't express
  * as a single pass. The DataFrame-composed twin
  * ([[graft.operators.AsOfJoin.asOf]]) stays the reference
  * implementation; PropertySpec pins the two equivalent.
  *
  * `rightTsOut`/`rightValsOut` are FRESH output attributes minted at
  * construction ([[producedAttributes]]), so a self-join of one base
  * relation cannot alias: the builder re-aliases the right child's
  * columns before resolving against it.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute],
    rightTsOut: AttributeReference,
    rightValsOut: Seq[AttributeReference]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ (rightTsOut +: rightValsOut)

  override def producedAttributes: AttributeSet =
    AttributeSet(rightTsOut +: rightValsOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
