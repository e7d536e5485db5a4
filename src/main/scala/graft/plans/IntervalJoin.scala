package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics

/** Native interval join — the second operator through `GraftStrategy`
  * (the strategy machinery generalizes: one registration, many node
  * types). INNER join of an interval table `(pk, start, end, …)` with
  * a probe table `(pk, ts, …)` on `pk equal ∧ start ≤ ts ≤ end`.
  *
  * Physical shape: both children hash co-partition on the key;
  * intervals sort (pk, start), probes sort (pk, ts). Each partition
  * pair merges in one pass: probes stream in ts order, intervals
  * enter an ACTIVE buffer when their start passes, and leave it
  * lazily once their end falls behind the probe cursor. State =
  * the key's maximum concurrent-interval depth (1 for gap sessions,
  * which never overlap) — never the full interval table, and nothing
  * resembling the O(|L|·|R|) blow-up a theta-join plan would risk.
  * The composed alternative (`Events.rangeJoin`) buckets intervals
  * onto a time grid and equality-joins; this operator needs no grid
  * parameter and moves each input once.
  */
case class IntervalJoinPlan(left: LogicalPlan, right: LogicalPlan,
                            leftPk: Attribute, leftStart: Attribute,
                            leftEnd: Attribute,
                            rightPk: Attribute, rightTs: Attribute)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class IntervalJoinExec(leftPk: Attribute, leftStart: Attribute,
                            leftEnd: Attribute,
                            rightPk: Attribute, rightTs: Attribute,
                            left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftPk)) ::
      ClusteredDistribution(Seq(rightPk)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftPk, Ascending), SortOrder(leftStart, Ascending)),
    Seq(SortOrder(rightPk, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning = right.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(rightPk, Ascending), SortOrder(rightTs, Ascending))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val pkOrd = TypeUtils.getInterpretedOrdering(leftPk.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(rightTs.dataType)
    val lPkRef = BindReferences.bindReference(leftPk: Expression, left.output)
    val lStartRef =
      BindReferences.bindReference(leftStart: Expression, left.output)
    val lEndRef = BindReferences.bindReference(leftEnd: Expression, left.output)
    val rPkRef = BindReferences.bindReference(rightPk: Expression, right.output)
    val rTsRef = BindReferences.bindReference(rightTs: Expression, right.output)

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        // parents (and a bare collect) expect UnsafeRow — project the
        // JoinedRow like SortMergeJoin's result projection does
        private val toUnsafe =
          org.apache.spark.sql.catalyst.expressions.UnsafeProjection
            .create(output, output)
        // active intervals of the CURRENT key, with their end values
        private val active = ArrayBuffer.empty[(InternalRow, Any)]
        private var activePk: Any = null
        private var lNext: InternalRow = if (lIt.hasNext) lIt.next() else null
        private var probe: InternalRow = null
        private var probeTs: Any = null
        private var emitIdx = 0

        private def advanceLeft(): Unit =
          lNext = if (lIt.hasNext) lIt.next() else null

        /** Position `active` for (pk, ts): admit started intervals of
          * this key, lazily drop expired ones. */
        private def fill(pk: Any, ts: Any): Unit = {
          if (activePk == null || !pkOrd.equiv(activePk, pk)) {
            active.clear(); activePk = pk
          }
          var advancing = true
          while (advancing && lNext != null) {
            val lp = lPkRef.eval(lNext)
            val c = if (lp == null) -1 else pkOrd.compare(lp, pk)
            if (c < 0) advanceLeft() // keys already behind every probe
            else if (c == 0) {
              val st = lStartRef.eval(lNext)
              if (st == null) advanceLeft() // null starts sort first; skip
              else if (tsOrd.compare(st, ts) <= 0) {
                val end = lEndRef.eval(lNext)
                // end < start intervals can never match; skip them
                if (end != null && tsOrd.compare(end, st) >= 0)
                  active += ((lNext.copy(), end))
                advanceLeft()
              } else advancing = false
            } else advancing = false
          }
          var i = active.length - 1
          while (i >= 0) {
            if (tsOrd.compare(active(i)._2, ts) < 0) active.remove(i)
            i -= 1
          }
        }

        private def nextProbe(): Boolean = {
          while (rIt.hasNext) {
            probe = rIt.next()
            val pk = rPkRef.eval(probe)
            probeTs = rTsRef.eval(probe)
            if (pk != null && probeTs != null) {
              fill(pk, probeTs)
              if (active.nonEmpty) { emitIdx = 0; return true }
            }
          }
          probe = null
          false
        }

        override def hasNext: Boolean =
          (probe != null && emitIdx < active.length) || nextProbe()

        override def next(): InternalRow = {
          // once emitIdx exhausts `active`, the next hasNext() call
          // falls through to nextProbe() and advances the probe cursor
          val row = joined(active(emitIdx)._1, probe)
          emitIdx += 1
          numOutputRows += 1
          toUnsafe(row)
        }
      }
    }
  }
}
