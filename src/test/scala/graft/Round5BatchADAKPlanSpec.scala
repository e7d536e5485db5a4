package graft

import graft.operators.{Relational, Similarity}

/** Physical-plan assertions for the round-5 batch AD–AK heavies:
  * keyed joins stay keyed, dimension/corpus broadcasts stay
  * broadcasts, and the only nested-loop shapes are the deliberate
  * broadcast all-pairs (embedding tier) and 1-row scalar spines.
  */
class Round5BatchADAKPlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("perfect_order_rate: lineitem joins orders on the order key") {
    val p = plan(Relational.perfectOrderRate(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin")
      || p.contains("BroadcastHashJoin"),
      "the lead join must be an equality join on l_orderkey")
    CacheScope.release(spark)
  }

  test("price_index: the two periods meet in a part-keyed self-join") {
    val p = plan(Relational.priceIndex(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin")
      || p.contains("BroadcastHashJoin"),
      "period legs must join on pk")
    CacheScope.release(spark)
  }

  test("theil_decomposition: the customer dimension broadcasts") {
    val p = plan(Relational.theilDecomposition(spark, sf))
    assert(p.contains("BroadcastExchange"),
      "customer(nation) dim must broadcast onto the spend agg")
    assert(!p.contains("CartesianProduct"))
    CacheScope.release(spark)
  }

  test("embedding_alignment: all-pairs via a BROADCAST range join") {
    val p = plan(Similarity.embeddingAlignment(spark, sf))
    // the all-pairs shape is deliberate at fixture scale, but it must
    // ride a broadcast (corpus-side duplication would be quadratic
    // shuffle); a CartesianProduct would mean the broadcast was lost
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), s"broadcast lost:\n$p")
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    CacheScope.release(spark)
  }
}
