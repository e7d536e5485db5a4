package org.apache.spark.sql.graftglue

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** The two `private[sql]` crossings a library-level custom operator
  * needs: DataFrame → analyzed LogicalPlan, and LogicalPlan →
  * DataFrame. Lives under `org.apache.spark.sql` solely to be inside
  * that access scope — the standard shim shape Spark extension
  * libraries use; everything else in graft stays in public API.
  */
object PlanApi {

  /** The analyzed logical plan backing a DataFrame (attribute ids here
    * are what a custom plan node must reference).
    */
  def analyzed(df: Dataset[_]): LogicalPlan =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed

  /** Wrap a (resolved) logical plan back into a DataFrame on `s`. */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(s.asInstanceOf[classic.SparkSession], plan)

  // NOTE: classic.ExpressionUtils.expression(Column) is NOT a usable
  // bridge for injectFunction — it wraps the column's unresolved node
  // tree in an opaque Unevaluable that the analyzer never revisits
  // (codegen then throws). Build resolved catalyst trees instead
  // (see TextFns.tokenizeExpr).
}
