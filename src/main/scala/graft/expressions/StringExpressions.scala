package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity expressions beyond the Spark built-ins.
  *
  * Spark ships `levenshtein` but not Jaro-Winkler; this fills the gap
  * as a native codegen'd expression (no UDF serialization, stays inside
  * whole-stage codegen) with semantics matched to DuckDB's
  * `jaro_winkler_similarity` so results are oracle-comparable:
  * either side empty → 0, prefix boost (p = 0.1, prefix ≤ 4) applied
  * only when the Jaro score exceeds 0.7.
  */
object StringExpressions {

  /** Classic two-pass Jaro + Winkler boost. Shared by the interpreted
    * and generated paths.
    */
  def jaroWinklerEval(l: UTF8String, r: UTF8String): Double = {
    val a = l.toString
    val b = r.toString
    val n = a.length
    val m = b.length
    if (n == 0 || m == 0) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(n, m) / 2 - 1)
    val aMatch = new Array[Boolean](n)
    val bMatch = new Array[Boolean](m)
    var matches = 0
    var i = 0
    while (i < n) {
      val hi = math.min(m - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          matches += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var trans = 0
    var j = 0
    i = 0
    while (i < n) {
      if (aMatch(i)) {
        while (!bMatch(j)) j += 1
        if (a.charAt(i) != b.charAt(j)) trans += 1
        j += 1
      }
      i += 1
    }
    val mm = matches.toDouble
    val jaro = (mm / n + mm / m + (mm - trans / 2.0) / mm) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val cap = math.min(4, math.min(n, m))
    while (prefix < cap && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }

  private val Evaluator = "graft.expressions.StringExpressions$.MODULE$"

  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (left.dataType == StringType && right.dataType == StringType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"jaro_winkler expects (string, string), got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      jaroWinklerEval(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"$Evaluator.jaroWinklerEval($a, $b)")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): JaroWinkler = copy(left = l, right = r)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.column(
      JaroWinkler(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
