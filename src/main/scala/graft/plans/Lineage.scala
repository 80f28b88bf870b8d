package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{
  Alias, Attribute, AttributeMap, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{
  Aggregate, LogicalPlan, Project, Window => WindowPlan}
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage: for each output column of a DataFrame, the
  * set of SOURCE columns (`<file-or-table>.<column>`) it transitively
  * depends on — the governance/impact-analysis primitive ("which
  * outputs move if this source column changes?", "does anything
  * derived from PII reach this export?").
  *
  * Walks the ANALYZED logical plan bottom-up carrying an
  * attribute→sources map: leaf relations seed their own columns;
  * Project/Aggregate/Window resolve each named expression's
  * references through the child map (an aggregate of x depends on x's
  * sources); every other node — joins, unions, generates, filters,
  * custom nodes like [[AsOfJoinPlan]] — contributes conservatively:
  * an attribute it PRODUCES depends on everything the node
  * references, an attribute it passes through keeps its child
  * lineage, and union outputs merge positionally across children.
  * Conservative means the result may over-approximate (a filter
  * column never taints outputs — filters produce nothing), never
  * under-approximate.
  */
object Lineage {

  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.get(a).getOrElse(Set.empty)).toMap
  }

  private def relationLabel(l: LogicalRelation): String =
    l.catalogTable.map(_.identifier.unquotedString)
      .orElse(l.relation match {
        case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
          fs.location.rootPaths.headOption.map(_.getName)
        case _ => None
      })
      .getOrElse("relation")

  private def resolve(
      e: Expression, child: AttributeMap[Set[String]]): Set[String] =
    e.references.toSeq.flatMap(a => child.get(a).getOrElse(Set.empty)).toSet

  private def walk(plan: LogicalPlan): AttributeMap[Set[String]] =
    plan match {
      case l: LogicalRelation =>
        val label = relationLabel(l)
        AttributeMap(l.output.map(a => a -> Set(s"$label.${a.name}")))

      case p: Project =>
        val child = walk(p.child)
        AttributeMap(p.projectList.map {
          case al: Alias => al.toAttribute -> resolve(al.child, child)
          case a: Attribute => a -> child.get(a).getOrElse(Set.empty)
          case ne => ne.toAttribute -> resolve(ne, child)
        })

      case a: Aggregate =>
        val child = walk(a.child)
        AttributeMap(a.aggregateExpressions.map {
          case al: Alias => al.toAttribute -> resolve(al.child, child)
          case ne: NamedExpression =>
            ne.toAttribute -> resolve(ne, child)
        })

      case w: WindowPlan =>
        val child = walk(w.child)
        val win = w.windowExpressions.map {
          case al: Alias => al.toAttribute -> resolve(al.child, child)
          case ne => ne.toAttribute -> resolve(ne, child)
        }
        AttributeMap(child.toSeq ++ win)

      case other =>
        // generic: merge children (positional merge for unions),
        // produced attributes depend on all node references
        val childMaps = other.children.map(walk)
        val merged: Seq[(Attribute, Set[String])] =
          if (other.children.size > 1 &&
            other.children.forall(_.output.length == other.output.length) &&
            other.nodeName.toLowerCase.contains("union")) {
            other.output.zipWithIndex.map { case (a, i) =>
              a -> other.children.zip(childMaps).flatMap { case (c, m) =>
                m.get(c.output(i)).getOrElse(Set.empty)
              }.toSet
            }
          } else childMaps.flatMap(_.toSeq)
        val base = AttributeMap(merged)
        val produced = other.producedAttributes.toSeq.map { a =>
          a -> other.expressions.flatMap(e => resolve(e, base)).toSet
        }
        AttributeMap(merged ++ produced)
    }
}
