package graft

import graft.operators.{Curation, Spatial, Graph}

/** Dev-only plan peek for round-10 ops (kept as a posture spec):
  * the spatial radius join must broadcast the 9x-exploded supplier
  * side at fixture shape, and quantile normalization's pooled lookup
  * must be a broadcast join, with no corpus-wide sort anywhere.
  */
class PlanPeekR10Spec extends SparkSpec {
  private def physical(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("geo_radius_join: cell join has no cartesian and no global sort") {
    val p = physical(Spatial.geoRadiusJoin(spark, sf))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin") || !p.contains("Exchange rangepartitioning"),
      "unexpected global range sort in radius join")
  }

  test("quantile_normalize: pooled interval lookup broadcasts") {
    val p = physical(Curation.quantileNormalize(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("hash_walks: levels are checkpointed once, final plan is a " +
    "bare union (no per-action loop recompute)") {
    val p = physical(Graph.hashWalks(spark, sf, steps = 1))
    // each level localCheckpoints inside the loop, so the surfaced
    // plan must be a union of checkpoint scans — joins/aggs ran once
    assert(p.contains("Union") && p.contains("ExistingRDD"), p)
    assert(!p.contains("Join"), "loop stages leaked into the final plan")
  }
}
