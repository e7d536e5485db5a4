package graft

import graft.operators.{Graph, TextStats}

/** Physical-plan assertions for the round-5 batch Z–AC heavies: the
  * graph operators must pair through keyed equality joins (wedge or
  * degree keys), never a cartesian, and the sketch audit must
  * broadcast its cell table back onto the probe scan.
  */
class Round5BatchZACPlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("eigenvector_centrality: per-round scatter is a keyed join") {
    val p = plan(Graph.eigenvectorCentrality(spark, sf, rounds = 2))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    CacheScope.release(spark)
  }

  test("louvain_move_gains: gain join keyed on src/dst, 2m broadcast") {
    val p = plan(Graph.louvainMoveGains(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin")
      || p.contains("BroadcastHashJoin"),
      "degree joins must be equality joins")
    CacheScope.release(spark)
  }

  test("resource_allocation: wedge join on the customer key only") {
    val p = plan(Graph.resourceAllocation(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin")
      || p.contains("BroadcastHashJoin"),
      "the wedge must pair through an equality join on c")
    CacheScope.release(spark)
  }

  test("moran_i: projection pairs via the order key; scalars broadcast") {
    val p = plan(Graph.moranI(spark, sf))
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    CacheScope.release(spark)
  }

  test("countsketch_audit: the 3x256 cell table broadcasts back") {
    val p = plan(TextStats.countSketchAudit(spark, sf))
    assert(p.contains("BroadcastExchange"),
      "cell table must broadcast onto the top-k probe")
    assert(!p.contains("CartesianProduct"))
    CacheScope.release(spark)
  }
}
