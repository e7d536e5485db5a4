package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions.HashExpressions._
import graft.expressions.VectorExpressions.CosineSim
import graft.expressions.NoPushdown

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so the whole library surface is
  * reachable from `spark.sql(...)` (and spark-sql / JDBC users), not
  * just the Scala DataFrame API:
  *
  * {{{
  * SparkSession.builder()
  *   .withExtensions(new GraftExtensions)          // programmatic
  *   // or spark.sql.extensions=graft.GraftExtensions
  * ...
  * spark.sql("SELECT simhash40(tokens), cosine_sim(a, b) FROM t")
  * }}}
  *
  * Also injects two optimizer rules — exact, semantics-preserving
  * rewrites (see each rule's doc):
  *  - `BandedLevenshteinRule`: thresholded edit-distance filter
  *    predicates (`levenshtein(a,b) <= k`) run the banded O(len·k)
  *    algorithm;
  *  - `StaticSetProbeRule`: `size(array_intersect(col, <literal>))`
  *    probes a once-per-executor hash set instead of rebuilding the
  *    constant side's lookup table per row.
  * And one planner strategy — `GraftStrategy`, which plans the
  * library's native `AsOfJoinPlan` operator (co-partitioned sorted-
  * merge as-of join, `graft.plans.AsOfJoin`). Everything is additive
  * and idempotent; no built-in behavior changes.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.BandedLevenshteinRule)
    ext.injectOptimizerRule(_ => graft.plans.StaticSetProbeRule)
    // whole-operator path: plans AsOfJoinPlan → AsOfJoinExec (native
    // co-partitioned sorted-merge as-of join; see graft.plans.AsOfJoin)
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    GraftExtensions.functions.foreach(ext.injectFunction)
  }
}

/** The SQL-function surface as data, so it can be (a) injected at
  * session build time by the class above and (b) registered onto a
  * LIVE session by `PlanAudits.sqlExtensionsAudit` (the driver's
  * Verify session is built without extensions — the audit registers
  * and exercises each function itself, W12/W96/W110 rows-only gate).
  */
object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def one(args: Seq[Expression], name: String): Expression = {
    require(args.length == 1, s"$name expects 1 argument, got ${args.length}")
    args.head
  }

  /** Registers every graft SQL function on a live session
    * (idempotent: registerFunction overwrites).
    */
  def registerAll(s: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, inf, builder) =>
      s.sessionState.functionRegistry.registerFunction(id, inf, builder)
    }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(array<string>) - 64-bit SimHash signature"),
      args => SimHash64(one(args, "simhash64"))),
    (FunctionIdentifier("simhash40"),
      info("simhash40", "simhash40(array<string>) - 40-bit SQL-restatable SimHash"),
      args => SimHash40(one(args, "simhash40"))),
    (FunctionIdentifier("poly_hash_array"),
      info("poly_hash_array",
        "poly_hash_array(array<string>) - per-element base-31 hash mod 2^40"),
      args => PolyHashArray(one(args, "poly_hash_array"))),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(array<string>, k) - k-permutation MinHash signature"),
      args => {
        require(args.length == 2, "minhash_signature expects (array, k)")
        val k = args(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"minhash_signature k must be an integer literal, got $other")
        }
        MinHashSignature(args.head, k)
      }),
    (FunctionIdentifier("cosine_sim"),
      info("cosine_sim",
        "cosine_sim(array<float|double>, array<float|double>) - cosine similarity"),
      args => {
        require(args.length == 2, "cosine_sim expects 2 arguments")
        CosineSim(args.head, args(1))
      }),
    (FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(string, string) - Jaro-Winkler similarity in [0,1]"),
      args => {
        require(args.length == 2, "jaro_winkler expects 2 arguments")
        graft.expressions.StringExpressions.JaroWinkler(args.head, args(1))
      }),
    (FunctionIdentifier("no_pushdown"),
      info("no_pushdown",
        "no_pushdown(expr) - identity; blocks predicate pushdown of the " +
          "enclosing filter (see OptimizerBarrier)"),
      args => NoPushdown(one(args, "no_pushdown"))),
    // the engine's canonical tokenizer as a SQL function: the same
    // split/transform/filter built-in tree as the Column API (resolved
    // catalyst form — see TextFns.tokenizeExpr), so SQL users tokenize
    // EXACTLY like Scala users (same codegen, same semantics, no UDF)
    (FunctionIdentifier("graft_tokenize"),
      info("graft_tokenize",
        "graft_tokenize(string) - reference tokenizer: lowercase, " +
          "whitespace split, strip non-letter edges, drop empties"),
      args => graft.functions.TextFns.tokenizeExpr(
        one(args, "graft_tokenize"))),
    // the curation tier's deterministic percentage hash (Curation
    // .pctHash): SQL pipelines sample/split exactly like the Scala API
    (FunctionIdentifier("pct_hash"),
      info("pct_hash",
        "pct_hash(bigint) - deterministic pseudo-uniform value in " +
          "[0, 100) for reproducible sampling/splitting"),
      args => {
        import org.apache.spark.sql.catalyst.expressions.{Literal, Multiply, Pmod}
        val e = one(args, "pct_hash")
        Pmod(Multiply(Pmod(e, Literal(2147483648L)), Literal(8388593L)),
          Literal(100L))
      }),
    // exact set-Jaccard of two arrays (the dedup tier's verification
    // metric) as one expression: |A∩B| / |A∪B| over distinct elements
    (FunctionIdentifier("jaccard_sim"),
      info("jaccard_sim",
        "jaccard_sim(array, array) - exact Jaccard similarity of the " +
          "two arrays' distinct element sets"),
      args => {
        require(args.length == 2, "jaccard_sim expects 2 arguments")
        import org.apache.spark.sql.catalyst.expressions.{
          ArrayIntersect, ArrayUnion, Cast, Divide, EqualTo, If, Literal,
          Size}
        import org.apache.spark.sql.types.DoubleType
        val union = Size(ArrayUnion(args.head, args(1)))
        // two empty arrays → 0/0, which ANSI mode turns into a runtime
        // DIVIDE_BY_ZERO; define J(∅, ∅) = null instead
        If(EqualTo(union, Literal(0)),
          Literal(null, DoubleType),
          Divide(
            Cast(Size(ArrayIntersect(args.head, args(1))), DoubleType),
            Cast(union, DoubleType)))
      }))
}
