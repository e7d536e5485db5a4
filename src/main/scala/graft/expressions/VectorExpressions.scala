package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Vector-similarity expressions over `array<float|double>` embedding
  * columns.
  *
  * The built-in encoding (`aggregate(zip_with(...))`) allocates two
  * intermediate arrays per comparison; this fused expression runs the
  * dot products in one pass with no allocation — the difference matters
  * when brute-force scoring pairs each query against the whole corpus.
  * Accumulation is sequential left-to-right in double precision, so
  * results are deterministic and match DuckDB's list_cosine_similarity
  * on DOUBLE[].
  */
object VectorExpressions {

  /** Shared evaluator (also called from generated code). `aFloat`/
    * `bFloat` select the element accessor (float vs double arrays).
    * Null elements count as 0. Returns Double.NaN when either norm is
    * zero, matching the undefined-cosine convention.
    */
  def cosineEval(a: ArrayData, aFloat: Boolean,
                 b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x =
        if (a.isNullAt(i)) 0.0
        else if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y =
        if (b.isNullAt(i)) 0.0
        else if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / math.sqrt(na) / math.sqrt(nb)
  }

  private val Evaluator = "graft.expressions.VectorExpressions$.MODULE$"

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      def ok(e: Expression) = e.dataType match {
        case ArrayType(FloatType | DoubleType, _) => true
        case _ => false
      }
      if (ok(left) && ok(right))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim expects array<float|double> arguments, got " +
            s"${left.dataType.sql} and ${right.dataType.sql}")
    }
    override def dataType: DataType = DoubleType
    override protected def nullSafeEval(a: Any, b: Any): Any =
      cosineEval(a.asInstanceOf[ArrayData], isFloat(left),
        b.asInstanceOf[ArrayData], isFloat(right))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"$Evaluator.cosineEval($a, ${isFloat(left)}, $b, ${isFloat(right)})")
    override protected def withNewChildrenInternal(
        l: Expression, r: Expression): CosineSim = copy(left = l, right = r)
  }

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(
      CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
