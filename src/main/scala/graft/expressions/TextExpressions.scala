package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused reference tokenizer (OPTIMIZATION r11, guide §4 "eliminate
  * non-codegen Expressions in the hot path").
  *
  * The reference tokenizer semantics — whitespace-split → lowercase →
  * strip leading/trailing non-`[a-z]` runs → drop empties — were
  * previously composed from `split` + `transform(regexp_replace)` +
  * `filter(length > 0)`. The two higher-order functions
  * (`ArrayTransform`, `ArrayFilter`) are CodegenFallback in Spark: every
  * tokenize call broke whole-stage codegen into interpreted eval with a
  * lambda-variable box per token, plus two regex engines
  * (`\\s+` split and the `(^[^a-z]+|[^a-z]+$)` strip) and two
  * intermediate arrays per document. This expression produces the
  * IDENTICAL token array in one pass over the lowered string — no regex,
  * no intermediate arrays, codegen-friendly — which matters because
  * ~60 text-tier queries tokenize the corpus as their first stage.
  *
  * Exact-equivalence notes (pinned by TokenizeExprSpec against the old
  * composite on the fixture corpus + adversarial cases):
  *  - lowercase FIRST over the whole string via `UTF8String.toLowerCase`
  *    — the same call `Lower` makes, so Unicode case mapping (including
  *    length-changing mappings) is bit-identical;
  *  - token boundaries are maximal runs of non-`\s` chars, `\s` being
  *    Java regex's ASCII class `[ \t\n\x0B\f\r]` (what
  *    `split(lower(c), "\\s+")` used); the empty first/last fields that
  *    regex split emits around leading/trailing whitespace were always
  *    dropped by the length filter, so skipping them is identical;
  *  - per token, the kept slice runs from the first to the last ASCII
  *    `[a-z]` char inclusive (interior non-letters survive — the old
  *    regex only stripped edge runs); tokens with no letter vanish,
  *    exactly like the old strip-to-empty + filter.
  */
object TextExpressions {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' ||
      c == '\r'

  /** Shared evaluator (also called from generated code). */
  def tokenizeEval(s: UTF8String): ArrayData = {
    val lower = s.toLowerCase.toString
    val n = lower.length
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      var j = i
      while (j < n && !isWs(lower.charAt(j))) j += 1
      if (j > i) {
        var a = i
        while (a < j && (lower.charAt(a) < 'a' || lower.charAt(a) > 'z'))
          a += 1
        if (a < j) {
          var b = j - 1
          while (b > a && (lower.charAt(b) < 'a' || lower.charAt(b) > 'z'))
            b -= 1
          out += UTF8String.fromString(lower.substring(a, b + 1))
        }
      }
      i = j
    }
    new GenericArrayData(out.toArray)
  }

  private val Evaluator = "graft.expressions.TextExpressions$.MODULE$"

  case class Tokenize(child: Expression) extends UnaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case StringType =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckFailure(
              s"graft_tokenize expects a string argument, got ${other.sql}")
      }
    // containsNull = false matches the former
    // filter(transform(split(...)), ...) composite's schema exactly
    // (StringSplit's element non-nullness propagates through the
    // lambda chain; TokenizeExprSpec pins the equality)
    override def dataType: DataType = ArrayType(StringType,
      containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      tokenizeEval(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Evaluator.tokenizeEval($c)")
    override protected def withNewChildInternal(c: Expression): Tokenize =
      copy(child = c)
  }

  def tokenize(c: Column): Column =
    ColumnBridge.column(Tokenize(ColumnBridge.expression(c)))

  /** One greedy left-to-right BPE merge pass (OPTIMIZATION r11):
    * split `tok` into code-point symbols and merge every (x, y)
    * adjacency into the symbol x+y, scanning left to right so a
    * consumed symbol can't re-match — byte-for-byte the semantics of
    * the former `aggregate(split(tok, ""), struct-fold)` in
    * `TextStats.bpeIter2Counts`, which built O(len²) intermediate
    * arrays per token through an interpreted higher-order fold. One
    * Java loop, no intermediate arrays, codegen-friendly.
    */
  def bpeMergeEval(tok: UTF8String, x: UTF8String,
                   y: UTF8String): ArrayData = {
    val t = tok.toString
    val xs = x.toString
    val ys = y.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    var carry: String = null
    var i = 0
    while (i < t.length) {
      val j = t.offsetByCodePoints(i, 1)
      val c = t.substring(i, j)
      if (carry == null) carry = c
      else if (carry == xs && c == ys) {
        out += UTF8String.fromString(xs + ys); carry = null
      } else { out += UTF8String.fromString(carry); carry = c }
      i = j
    }
    if (carry != null) out += UTF8String.fromString(carry)
    new GenericArrayData(out.toArray)
  }

  case class BpeMergeOnce(first: Expression, second: Expression,
                          third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (children.forall(_.dataType == StringType))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckSuccess
      else
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult
          .TypeCheckFailure("graft_bpe_merge expects string arguments")
    override def dataType: DataType = ArrayType(StringType,
      containsNull = false)
    override protected def nullSafeEval(t: Any, a: Any, b: Any): Any =
      bpeMergeEval(t.asInstanceOf[UTF8String], a.asInstanceOf[UTF8String],
        b.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (t, a, b) => s"$Evaluator.bpeMergeEval($t, $a, $b)")
    override protected def withNewChildrenInternal(
        f: Expression, snd: Expression, t: Expression): BpeMergeOnce =
      copy(first = f, second = snd, third = t)
  }

  def bpeMergeOnce(tok: Column, x: String, y: String): Column =
    ColumnBridge.column(BpeMergeOnce(ColumnBridge.expression(tok),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(x), StringType),
      org.apache.spark.sql.catalyst.expressions.Literal(
        UTF8String.fromString(y), StringType)))

  /** Word n-gram shingles of a token array, space-joined
    * (OPTIMIZATION r11): the fused form of `Dedup.shingles`'
    * `when(size >= n, transform(slice, (_, i) => concat_ws(" ",
    * slice(ts, i+1, n)))).otherwise(array(concat_ws(" ", ts)))`
    * composite — which evaluated an interpreted lambda per shingle,
    * each allocating a sliced sub-array. One pass, shared by ~26
    * dedup/curation call sites (the whole LSH tier's first stage).
    * Semantics (ShinglesExprSpec pins equality to the composite):
    * size ≥ n → size−n+1 shingles of n tokens joined by one space;
    * size < n (including 0) → ONE element joining all tokens
    * (concat_ws semantics: null elements skipped, no separator run).
    */
  def shinglesEval(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val sb = new java.lang.StringBuilder()
    def join(from: Int, until: Int): UTF8String = {
      sb.setLength(0)
      var first = true
      var i = from
      while (i < until) {
        if (!arr.isNullAt(i)) {
          if (!first) sb.append(' ')
          sb.append(arr.getUTF8String(i).toString)
          first = false
        }
        i += 1
      }
      UTF8String.fromString(sb.toString)
    }
    if (m >= n) {
      val out = new Array[Any](m - n + 1)
      var i = 0
      while (i <= m - n) { out(i) = join(i, i + n); i += 1 }
      new GenericArrayData(out)
    } else new GenericArrayData(Array[Any](join(0, m)))
  }

  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(StringType, _) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult
            .TypeCheckFailure(
              s"word_shingles expects array<string>, got ${other.sql}")
      }
    override def dataType: DataType = ArrayType(StringType,
      containsNull = false)
    override protected def nullSafeEval(v: Any): Any =
      shinglesEval(v.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"$Evaluator.shinglesEval($c, $n)")
    override protected def withNewChildInternal(c: Expression): WordShingles =
      copy(child = c)
  }

  def wordShingles(ts: Column, n: Int): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expression(ts), n))
}
