package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.DataType

/** Identity wrapper that reports `deterministic = false` so the
  * optimizer will not move the enclosing predicate.
  *
  * Why it exists: a `.filter` over a computed column (e.g.
  * `size(tokenize(text)) > 0`) is pushed below the projection and the
  * exchange by PushDownPredicates, which re-inlines the full computing
  * expression into the filter — the expensive expression then runs in
  * the pre-shuffle (often single-task, because fixtures are single-file
  * parquet) stage, and lambda-bearing expressions blow up O(len²) when
  * re-inlined (measured 12s single-task stages at sf0.1). Wrapping the
  * condition in `noPushdown` keeps the filter exactly where it was
  * written, after the cheap attribute is already materialized.
  *
  * The value is a pure pass-through — "non-deterministic" is a promise
  * to the optimizer, not a behavior.
  */
case class NoPushdown(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): NoPushdown =
    copy(child = newChild)
}

object OptimizerBarrier {
  /** Block predicate pushdown/reordering of the condition `c`. */
  def noPushdown(c: Column): Column =
    ColumnBridge.column(NoPushdown(ColumnBridge.expression(c)))
}
