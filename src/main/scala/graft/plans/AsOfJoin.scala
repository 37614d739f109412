package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst extension for the as-of join (SURVEY §7.2
  * level (c): custom LogicalPlan + SparkStrategy + SparkPlan): a
  * SORT-MERGE AS-OF JOIN physical operator. Both children are
  * hash-clustered on the `by` keys and sorted by (by, t) — the
  * planner inserts the exchanges/sorts via
  * requiredChildDistribution/Ordering exactly as for a sort-merge
  * join — and each co-partition pair is merged in ONE linear pass
  * holding one candidate right row: O(n+m) per partition, no window
  * buffering, no union row inflation (compare
  * [[graft.ops.Temporal.asofLeft]], the composed built-ins form).
  *
  * Semantics (identical to Temporal.asofLeft): for each left row,
  * attach `rightValues` from the LATEST right row with
  * rightOn <= leftOn in the same by-group; nulls when none exists.
  * Right side must be unique per (by, rightOn) for deterministic
  * output.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftBy: Seq[Attribute], rightBy: Seq[Attribute],
                        leftOn: Attribute, rightOn: Attribute,
                        rightValues: Seq[Attribute])
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]. Injected via
  * `SparkSessionExtensions.injectPlannerStrategy` ([[graft.functions.GraftExtensions]])
  * and, for sessions built without the extension, added idempotently
  * to `spark.experimental.extraStrategies` by the library API. */
case object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lb, rb, lo, ro, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lb, rb, lo, ro, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftBy: Seq[Attribute], rightBy: Seq[Attribute],
                        leftOn: Attribute, rightOn: Attribute,
                        rightValues: Seq[Attribute])
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightValues.map(_.withNullability(true))

  // the same contract as SortMergeJoinExec: cluster both children on
  // the equi keys (EnsureRequirements co-partitions them) and sort by
  // (keys, time) so the per-partition merge is a single linear pass
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftBy) :: ClusteredDistribution(rightBy) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftBy :+ leftOn).map(SortOrder(_, Ascending)),
    (rightBy :+ rightOn).map(SortOrder(_, Ascending)))
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftBy.map(_.dataType)
    val tTypes = Seq(leftOn.dataType)
    val leftOutput = left.output
    val rightOutput = right.output
    val lBy = leftBy; val rBy = rightBy
    val lOn = leftOn; val rOn = rightOn
    val rVals = rightValues
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lBy, leftOutput)
      val rKeyProj = UnsafeProjection.create(rBy, rightOutput)
      val lTProj = UnsafeProjection.create(Seq(lOn.asInstanceOf[Expression]), leftOutput)
      val rTProj = UnsafeProjection.create(Seq(rOn.asInstanceOf[Expression]), rightOutput)
      val rValProj = UnsafeProjection.create(rVals, rightOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tOrd = RowOrdering.createNaturalAscendingOrdering(tTypes)
      val nullVals = InternalRow.fromSeq(Seq.fill(rVals.size)(null))
      val joined = new JoinedRow
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)

      // one-row lookahead over the right side; held = the latest right
      // row consumed so far (its key + projected values)
      var rKey: InternalRow = null; var rT: InternalRow = null
      var rAvail = false
      var heldKey: InternalRow = null; var heldVal: InternalRow = null
      var rPending: InternalRow = null

      def advanceRight(): Unit =
        if (rIt.hasNext) {
          val r = rIt.next()
          rKey = rKeyProj(r).copy(); rT = rTProj(r).copy()
          rPending = rValProj(r).copy()
          rAvail = true
        } else rAvail = false

      advanceRight()
      lIt.map { l =>
        val lKey = lKeyProj(l)
        val lT = lTProj(l)
        // consume right rows that are at or before this left row
        while (rAvail && {
          val kc = keyOrd.compare(rKey, lKey)
          kc < 0 || (kc == 0 && tOrd.compare(rT, lT) <= 0)
        }) {
          heldKey = rKey; heldVal = rPending
          advanceRight()
        }
        val matched = heldKey != null && keyOrd.compare(heldKey, lKey) == 0
        toUnsafe(joined(l, if (matched) heldVal else nullVals))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
