package graft

import graft.operators.{Dedup, Events, Graph, Index, Ml, Relational,
  Similarity}

/** Physical-plan assertions for the round-5 batch D–K operators —
  * pinning each new operator's scale posture (decorrelated laterals,
  * equality-only joins, no cartesian blowups; the 1-row scalar
  * BroadcastNestedLoopJoin is the one legitimate nested-loop shape).
  */
class Round5BatchDKPlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    CacheScope.release(spark)
    p
  }

  test("lateral_join_topk: Catalyst decorrelates to ONE ranked join") {
    val p = plan(Relational.lateralJoinTopk(spark, sf))
    // the whole point of the operator: no per-row subquery execution —
    // the rewrite must produce a single equality join plus a rank
    assert(!p.contains("CartesianProduct"), "lateral must decorrelate")
    val joins = "SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findAllIn(p).length
    assert(joins == 1, s"expected exactly one ranked join, got $joins")
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      "the LIMIT-per-key must plan as a rank window")
  }

  test("seq_patterns: user-keyed equality joins only") {
    val p = plan(Events.seqPatterns(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "the per-type min tables must join on u, never nested-loop")
  }

  test("shapley_attribution: corpus side never fans into coalitions") {
    val p = plan(Events.shapleyAttribution(spark, sf))
    // the 2^C spines may nested-loop among themselves (≤16 rows);
    // what must not happen is a cartesian against the events scan
    assert(!p.contains("CartesianProduct"))
  }

  test("link_pred_eval: wedge joins are supplier-keyed equality joins") {
    val p = plan(Graph.linkPredEval(spark, sf, maxDeg = 10000L))
    assert(!p.contains("CartesianProduct"))
  }

  test("fs_em_weights: the EM surface plan stays cartesian-free") {
    // the blocked (noun, band) self-join sits BELOW the 8-row pattern
    // spine's localCheckpoint, so the visible plan is the EM
    // arithmetic; what it must never contain is a cartesian
    val p = plan(Dedup.fsEmWeights(spark, sf))
    assert(!p.contains("CartesianProduct"))
  }

  test("pq_codebook / pit_join / burrows_delta: no cartesian anywhere") {
    assert(!plan(Similarity.pqCodebook(spark, sf))
      .contains("CartesianProduct"))
    assert(!plan(Relational.pitJoin(spark, sf))
      .contains("CartesianProduct"))
    assert(!plan(graft.operators.TextStats.burrowsDelta(spark, sf))
      .contains("CartesianProduct"))
  }

  test("temperature_scaling: the T-grid rides a broadcast spine") {
    val p = plan(Ml.temperatureScaling(spark, sf))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastExchange"),
      "the 16-row literal grid must broadcast, not shuffle")
    assert(!p.contains("CartesianProduct"))
  }

  test("lm_dirichlet_topk: postings shuffle once, scalars broadcast") {
    val p = plan(Index.lmDirichletTopk(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("WindowGroupLimit") || p.contains("Window"),
      "the top-k cut must be a rank window")
  }
}
