package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import graft.expressions.HashExpressions.SetProbeCount

/** Optimizer rule: probe fixed string sets once per executor, not once
  * per row.
  *
  * `size(array_intersect(col, <array literal>))` — the natural way to
  * count how many of a row's strings belong to a fixed reference set
  * (decontamination, stop-list hits, vocabulary coverage) — evaluates
  * `ArrayIntersect` per row, and each evaluation rebuilds the lookup
  * hash table for the constant side (measured 2× end-to-end on the
  * contamination operator at sf0.1). The rewrite to `SetProbeCount`
  * carries the set as one reference object whose table builds once.
  *
  * Exactness: `size(array_intersect(a, b))` = |distinct(a) ∩
  * distinct(b)| (with a null element counting iff present in both),
  * which is symmetric — so the literal may appear on either side, and
  * `SetProbeCount`'s distinct-match evaluator reproduces it verbatim,
  * including `size`'s null-in → null-out (the legacy `size(null) = -1`
  * mode is left alone). String element type only — that is what the
  * probe set stores.
  */
object StaticSetProbeRule extends Rule[LogicalPlan] {

  private def stringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  private object StaticStringArray {
    def unapply(e: Expression): Option[(Seq[String], Boolean)] = e match {
      case Literal(arr: ArrayData, ArrayType(StringType, _)) =>
        val n = arr.numElements()
        val out = Seq.newBuilder[String]
        var hasNull = false
        var i = 0
        while (i < n) {
          if (arr.isNullAt(i)) hasNull = true
          else out += arr.getUTF8String(i).toString
          i += 1
        }
        Some((out.result(), hasNull))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(child, StaticStringArray(elems, hasNull)), false)
          if stringArray(child) =>
        SetProbeCount(child, elems, hasNull)
      case Size(ArrayIntersect(StaticStringArray(elems, hasNull), child), false)
          if stringArray(child) =>
        SetProbeCount(child, elems, hasNull)
    }
}
