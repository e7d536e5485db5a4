package graft

import org.apache.spark.sql.functions._

/** StaticSetProbeRule: plan rewrite fires and preserves exact
  * `size(array_intersect(...))` semantics, including duplicates and
  * null elements.
  */
class SetProbeRuleSpec extends SparkSpec {
  import spark.implicits._

  private val ref = Seq("b", "c", "z")

  test("rule rewrites the built-in form and results match") {
    val df = Seq(
      Seq("a", "b", "c"),
      Seq("b", "b", "b"),        // duplicates count once
      Seq("x"),
      Seq.empty[String]
    ).toDF("xs")
    // plan assertion needs a non-foldable source (an all-literal local
    // relation constant-folds away before the plan can be inspected)
    val scanQ = spark.read.parquet(s"$sf/documents.parquet")
      .select(size(array_intersect(split(col("text"), " "), typedlit(ref)))
        .as("n"))
    assert(scanQ.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("setprobecount"), "rule must fire")
    val q = df.select(
      size(array_intersect(col("xs"), typedlit(ref))).as("n"))
    assert(q.collect().map(_.getInt(0)).toSeq == Seq(2, 1, 0, 0))
    // literal on the left is the same set-cardinality computation
    val q2 = df.select(
      size(array_intersect(typedlit(ref), col("xs"))).as("n"))
    assert(q2.collect().map(_.getInt(0)).toSeq == Seq(2, 1, 0, 0))
  }

  test("null elements: counted iff present on both sides") {
    val withNull = Seq(Seq[String]("b", null), Seq[String](null, null))
      .toDF("xs")
    val litNoNull = typedlit(ref)
    val litNull = typedlit(Seq[String]("b", null))
    val got = withNull.select(
      size(array_intersect(col("xs"), litNoNull)).as("a"),
      size(array_intersect(col("xs"), litNull)).as("b")).collect()
    // row 1: {b, null}: vs {b,c,z} -> 1; vs {b,null} -> 2
    assert(got(0).getInt(0) == 1 && got(0).getInt(1) == 2)
    // row 2: {null}: vs no-null set -> 0; vs null-bearing set -> 1
    assert(got(1).getInt(0) == 0 && got(1).getInt(1) == 1)
  }

  test("null input array stays null") {
    val df = Seq((1, Seq("a")), (2, null.asInstanceOf[Seq[String]]))
      .toDF("id", "xs")
    val got = df.select(col("id"),
        size(array_intersect(col("xs"), typedlit(ref))).as("n"))
      .collect().sortBy(_.getInt(0))
    assert(!got(0).isNullAt(1))
    assert(got(1).isNullAt(1))
  }
}
