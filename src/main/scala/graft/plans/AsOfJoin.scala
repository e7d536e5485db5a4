package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native as-of join — the whole-operator custom-plan path
  * (SURVEY §7.3 option c): logical node + planner strategy + physical
  * operator, registered through `GraftExtensions`.
  *
  * Semantics: LEFT OUTER as-of — every left row pairs with the LAST
  * right row (in the right child's (pk, ts) order) of the same
  * partition key whose timestamp is ≤ the left row's; unmatched left
  * rows carry nulls. Rows with a null key or timestamp never match
  * (SQL join semantics, not null-equality). Callers wanting a
  * deterministic tie among equal right timestamps pre-aggregate the
  * right side to unique (pk, ts) — see `Events.asofJoinNative`.
  *
  * Why a physical operator at all: the composed form (union + carry,
  * `Events.asofJoin`) pays a window over the UNION of both sides —
  * every right row travels through the left side's shuffle and sort.
  * This operator instead demands only hash co-partitioning on the key
  * and per-partition (pk, ts) order from its children (the same
  * machinery SortMergeJoin uses — Catalyst's EnsureRequirements plans
  * the exchanges/sorts, and elides them when an upstream operator or
  * bucketed layout already provides the property), then merges each
  * co-partition pair in ONE streaming pass with O(1) state: strictly
  * less data moved, and the 100 TB-friendly shape — no buffered
  * right-side window frames, just two sorted cursors.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftPk: Attribute, leftTs: Attribute,
                        rightPk: Attribute, rightTs: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans the library's custom logical nodes (`AsOfJoinPlan`,
  * `IntervalJoinPlan`) onto their physical operators; everything else
  * falls through to the built-in strategies.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lPk, lTs, rPk, rTs) =>
      AsOfJoinExec(lPk, lTs, rPk, rTs, planLater(l), planLater(r)) :: Nil
    case IntervalJoinPlan(l, r, lPk, lSt, lEn, rPk, rTs) =>
      IntervalJoinExec(lPk, lSt, lEn, rPk, rTs,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftPk: Attribute, leftTs: Attribute,
                        rightPk: Attribute, rightTs: Attribute,
                        left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Hash co-partition both children on the key — EnsureRequirements
    * aligns partition counts and reuses any existing hash layout.
    */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftPk)) ::
      ClusteredDistribution(Seq(rightPk)) :: Nil

  /** (pk, ts) order within partitions on both sides; satisfied-by-
    * prefix, so a child already sorted (pk, ts, id) sorts nothing.
    */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftPk, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightPk, Ascending), SortOrder(rightTs, Ascending)))

  // the merge is left-driven: partitioning and order pass through
  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftPk, Ascending), SortOrder(leftTs, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val pkOrd = TypeUtils.getInterpretedOrdering(leftPk.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    // ascribe Expression: bindReference casts its result back to the
    // argument's type, and a bare Attribute argument would make that
    // cast BoundReference → Attribute (CCE)
    val lPkRef = BindReferences.bindReference(leftPk: Expression, left.output)
    val lTsRef = BindReferences.bindReference(leftTs: Expression, left.output)
    val rPkRef = BindReferences.bindReference(rightPk: Expression, right.output)
    val rTsRef = BindReferences.bindReference(rightTs: Expression, right.output)
    val nRightCols = right.output.size

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nulls = new GenericInternalRow(nRightCols)
      val joined = new JoinedRow
      // parents (and a bare collect) expect UnsafeRow — project the
      // JoinedRow like SortMergeJoin's result projection does
      val toUnsafe =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(output, output)
      // one copied row of held state: the latest right row whose
      // (pk, ts) is ≤ the left cursor — O(1) memory per partition
      var held: InternalRow = null
      var heldPk: Any = null
      var rNext: InternalRow = if (rIt.hasNext) rIt.next() else null

      lIt.map { lRow =>
        val lPk = lPkRef.eval(lRow)
        val lTs = lTsRef.eval(lRow)
        if (lPk != null && lTs != null) {
          var advancing = true
          while (advancing && rNext != null) {
            val rPk = rPkRef.eval(rNext)
            val rTs = rTsRef.eval(rNext)
            if (rPk == null || rTs == null) {
              // null key/ts rows sort first and can never match
              rNext = if (rIt.hasNext) rIt.next() else null
            } else {
              val c = pkOrd.compare(rPk, lPk)
              if (c < 0) {
                rNext = if (rIt.hasNext) rIt.next() else null
              } else if (c == 0 && tsOrd.compare(rTs, lTs) <= 0) {
                held = rNext.copy() // child iterators reuse row buffers
                heldPk = rPk
                rNext = if (rIt.hasNext) rIt.next() else null
              } else advancing = false
            }
          }
        }
        numOutputRows += 1
        val matched = lPk != null && held != null && pkOrd.equiv(heldPk, lPk)
        toUnsafe(joined(lRow, if (matched) held else nulls))
      }
    }
  }
}
