package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text functions (reference `assignment2/Tokenizer.scala:8-12`,
  * `WordCount.java:46-49`) as pure Spark built-ins — no UDFs, so every
  * step stays inside whole-stage codegen and Catalyst can reorder/prune
  * around them.
  */
object TextFns {

  /** Reference tokenizer semantics: whitespace-split → lowercase → strip
    * leading/trailing non-`[a-z]` runs → drop empties.
    *
    * OPTIMIZATION r11 (guide §4): now the fused codegen expression
    * [[graft.expressions.TextExpressions.Tokenize]] — one pass, no
    * regex, no interpreted higher-order functions. Token-for-token
    * identical to the built-ins composite below (TokenizeExprSpec pins
    * it on the fixture corpus + adversarial cases).
    */
  def tokenize(c: Column): Column =
    graft.expressions.TextExpressions.tokenize(c)

  /** The pre-r11 pure-built-ins composite, kept as the no-custom-code
    * reference implementation the equivalence spec compares against.
    */
  def tokenizeBuiltins(c: Column): Column =
    filter(
      transform(
        split(lower(c), "\\s+"),
        t => regexp_replace(t, "(^[^a-z]+|[^a-z]+$)", "")),
      t => length(t) > 0)

  /** First `cap` tokens, de-duplicated — the reference's PMI co-occurrence
    * window (`PairsPMI.java:55-66`: cap 100 then per-line distinct).
    */
  def distinctWindow(tokens: Column, cap: Int): Column =
    array_distinct(slice(tokens, 1, cap))

  /** The tokenizer as a RESOLVED catalyst expression tree (for the SQL
    * function registration in `GraftExtensions` — injected functions
    * bypass lambda-variable resolution, so the higher-order lambdas
    * are built on `NamedLambdaVariable` directly, the form the
    * analyzer would produce). Must mirror `tokenize` exactly; the
    * ExtensionsSpec asserts SQL-vs-Column equality.
    */
  def tokenizeExpr(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    graft.expressions.TextExpressions.Tokenize(e)
}
