package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy mapping graft logical nodes to their physical
  * operators (registered via `injectPlannerStrategy` in
  * [[graft.GraftExtensions]]).
  */
class GraftStrategies extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(p.leftKey, p.leftTs, p.rightKey, p.rightTs,
        p.rightVals, p.rightTsOut +: p.rightValsOut,
        planLater(p.left), planLater(p.right)) :: Nil
    case _ => Nil
  }
}
