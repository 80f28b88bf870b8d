package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: derive `month` PARTITION predicates from
  * `timestamp_us` bounds over the store's month-partitioned tables.
  *
  * `SensorStore.samplesInRange` derives the month predicate by hand, but
  * a user writing plain SQL over [[graft.store.SensorStore.registerViews]]
  * (or filtering `samples(t)` directly) only states the timestamp bound —
  * without this rule that scan reads EVERY month directory and relies on
  * row-group stats alone. The rule runs in the operator-optimization
  * fixed point (after predicate pushdown has parked the timestamp filter
  * directly above the file relation), finds conjunctive
  * `timestamp_us ⋈ literal` bounds, and conjoins the implied
  * `month >= / <= yyyyMM(bound)` predicates; FileSourceStrategy then
  * turns those into partition pruning before any IO — the ClickHouse
  * monthly-partition-index effect for ad-hoc SQL.
  *
  * Safety:
  *  - fires ONLY on file relations physically partitioned by an integer
  *    `month` column that also expose a long `timestamp_us` data column
  *    (exactly the store layout — a coincidental `month` column on a
  *    non-partitioned frame never matches);
  *  - `yyyyMM(ts)` is monotone in `ts`, so the added predicates are
  *    implied by the timestamp bounds — never a semantics change;
  *  - skips when the condition already constrains `month` (also the
  *    idempotence guard for the fixed-point batch).
  */
class MonthPruneRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, rel: LogicalRelation) =>
      monthAndTs(rel) match {
        case Some((monthAttr, tsAttr))
            if !cond.references.contains(monthAttr) =>
          val conjuncts = splitConjuncts(cond)
          val lo = conjuncts.collectFirst {
            case GreaterThanOrEqual(a: AttributeReference, Literal(v: Long, LongType))
                if a.semanticEquals(tsAttr) => v
            case GreaterThan(a: AttributeReference, Literal(v: Long, LongType))
                if a.semanticEquals(tsAttr) => v
            case LessThanOrEqual(Literal(v: Long, LongType), a: AttributeReference)
                if a.semanticEquals(tsAttr) => v
            case LessThan(Literal(v: Long, LongType), a: AttributeReference)
                if a.semanticEquals(tsAttr) => v
          }
          val hi = conjuncts.collectFirst {
            case LessThanOrEqual(a: AttributeReference, Literal(v: Long, LongType))
                if a.semanticEquals(tsAttr) => v
            case LessThan(a: AttributeReference, Literal(v: Long, LongType))
                if a.semanticEquals(tsAttr) => v
            case GreaterThanOrEqual(Literal(v: Long, LongType), a: AttributeReference)
                if a.semanticEquals(tsAttr) => v
            case GreaterThan(Literal(v: Long, LongType), a: AttributeReference)
                if a.semanticEquals(tsAttr) => v
          }
          val extra = Seq(
            lo.map(v => GreaterThanOrEqual(monthAttr,
              Literal(MonthPruneRule.monthOf(v), IntegerType))),
            hi.map(v => LessThanOrEqual(monthAttr,
              Literal(MonthPruneRule.monthOf(v), IntegerType)))).flatten
          if (extra.isEmpty) f
          else Filter(extra.foldLeft(cond)(And(_, _)), rel)
        case _ => f
      }
  }

  /** The (month partition attr, timestamp_us data attr) pair when — and
    * only when — `rel` is a file relation physically partitioned by an
    * integer `month` with a long `timestamp_us` column.
    */
  private def monthAndTs(
      rel: LogicalRelation): Option[(AttributeReference, AttributeReference)] =
    rel.relation match {
      case fs: HadoopFsRelation
          if fs.partitionSchema.fieldNames.contains("month") =>
        for {
          m <- rel.output.collectFirst {
            case a: AttributeReference
                if a.name == "month" && a.dataType == IntegerType => a
          }
          ts <- rel.output.collectFirst {
            case a: AttributeReference
                if a.name == "timestamp_us" && a.dataType == LongType => a
          }
        } yield (m, ts)
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}

object MonthPruneRule {
  /** yyyyMM (UTC) of a µs epoch — the store's partition value function
    * (`SensorStore.monthOf`).
    */
  def monthOf(us: Long): Int = {
    val d = java.time.LocalDate.ofInstant(
      java.time.Instant.ofEpochSecond(Math.floorDiv(us, 1000000L)),
      java.time.ZoneOffset.UTC)
    d.getYear * 100 + d.getMonthValue
  }
}
