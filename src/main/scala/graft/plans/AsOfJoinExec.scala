package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, BoundReference, JoinedRow,
  SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.LongType

/** Physical as-of join: one streaming merge pass per co-partitioned,
  * co-sorted partition pair — the plan a native engine runs for
  * merge_asof, expressed as a first-class SparkPlan.
  *
  * Scale shape: `requiredChildDistribution` clusters both sides on
  * the key (EnsureRequirements inserts ONE exchange per side, or none
  * when the child is already partitioned — e.g. bucketed stores) and
  * `requiredChildOrdering` asks for (key, ts) sorts, so the operator
  * itself is O(|L| + |R|) per partition with O(1) state: the current
  * right row and the last match, nothing buffered. Versus the
  * composed union+window form ([[graft.operators.AsOfJoin.asOf]]):
  * no union of mismatched schemas, no ignoreNulls carry over the
  * combined rows, and the left payload never moves through a window
  * buffer. Output keeps the left side's partitioning and ordering, so
  * a downstream per-key aggregate reuses the exchange.
  *
  * Semantics: inner as-of — emit left rows having a right row with
  * `rightTs <= leftTs` on the same key, carrying that right row's ts
  * and value columns. Ties on rightTs resolve to the last row in sort
  * order (same as the composed form). Both ts columns must be LongType
  * (µs-epoch — the engine's sample contract); the key may be any
  * ordered atomic type.
  *
  * Row-level evaluation is interpreted (bound-reference eval + one
  * unsafe projection per emitted row); whole-stage codegen for the
  * merge loop is deliberately out of scope — the pass is
  * memory-bandwidth-bound, not expression-bound.
  */
case class AsOfJoinExec(
    leftKey: Attribute,
    leftTs: Attribute,
    rightKey: Attribute,
    rightTs: Attribute,
    rightVals: Seq[Attribute],
    outAttrs: Seq[Attribute], // rightTsOut +: rightValsOut
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  require(leftTs.dataType == LongType && rightTs.dataType == LongType,
    "as-of join requires LongType (µs) time columns")
  require(leftKey.dataType == rightKey.dataType,
    s"as-of join key types must match: ${leftKey.dataType} vs " +
      s"${rightKey.dataType} (cast one side before asOfNative)")

  override def output: Seq[Attribute] = left.output ++ outAttrs

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyOrdering = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val leftOut = left.output
    val rightOut = right.output
    val rightProjExprs = rightKey +: rightTs +: rightVals
    val numLeft = leftOut.length
    val carriedTypes = (rightTs +: rightVals).map(_.dataType)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyEval = BindReferences.bindReference(
        leftKey.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
        leftOut)
      val lTsEval = BindReferences.bindReference(
        leftTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
        leftOut)
      val rKeyEval = BindReferences.bindReference(
        rightKey.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
        rightOut)
      val rTsEval = BindReferences.bindReference(
        rightTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression],
        rightOut)
      // stored match: (key, ts, vals…) — an unsafe COPY, stable across
      // the reused source rows
      val rStoreProj = UnsafeProjection.create(rightProjExprs, rightOut)
      // final row: left columns by ordinal, then the stored row's
      // (ts, vals…) — ordinal 0 of the stored row is its key, skipped
      val resultProj = UnsafeProjection.create(
        leftOut.zipWithIndex.map { case (a, i) =>
          BoundReference(i, a.dataType, a.nullable)
        } ++ carriedTypes.zipWithIndex.map { case (dt, j) =>
          BoundReference(numLeft + 1 + j, dt, true)
        })
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rCurrent: InternalRow =
          if (rIter.hasNext) rIter.next() else null
        private var matchRow: InternalRow = null // copied (key, ts, vals…)
        private var nextOut: InternalRow = null

        private def advanceRightThrough(lk: Any, lt: Long): Unit = {
          var continue = rCurrent != null
          while (continue) {
            val rk = rKeyEval.eval(rCurrent)
            // SQL join semantics: a null key matches nothing — skip the
            // row instead of feeding null to the interpreted ordering
            // (which would NPE deep in the merge). Null keys sort first
            // under the required Ascending order, so they drain here
            // before any non-null comparison happens.
            if (rk == null) {
              rCurrent = if (rIter.hasNext) rIter.next() else null
              continue = rCurrent != null
            } else {
              val cmp = keyOrdering.compare(rk, lk)
              val take = cmp < 0 ||
                (cmp == 0 && rTsEval.eval(rCurrent).asInstanceOf[Long] <= lt)
              if (take) {
                if (cmp == 0) matchRow = rStoreProj(rCurrent).copy()
                rCurrent = if (rIter.hasNext) rIter.next() else null
                continue = rCurrent != null
              } else continue = false
            }
          }
        }

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val lRow = lIter.next()
            val lk = lKeyEval.eval(lRow)
            if (lk == null) {
              // null-keyed left rows can never match (inner as-of) —
              // emit nothing, keep scanning
            } else {
            val lt = lTsEval.eval(lRow).asInstanceOf[Long]
            advanceRightThrough(lk, lt)
            if (matchRow != null &&
              keyOrdering.compare(matchRow.get(0, leftKey.dataType), lk) == 0) {
              nextOut = resultProj(joined(lRow, matchRow))
            }
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextOut == null) computeNext()
          nextOut != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = nextOut
          nextOut = null
          r
        }
      }
    }
  }
}
