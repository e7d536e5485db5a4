package graft

import graft.operators.{Curation, Events, Graph, Relational, Similarity}

/** Physical-plan assertions for the round-4 operators: the scale
  * posture (what broadcasts, what never goes cartesian) is part of
  * each operator's contract, so pin it — a regression that flips a
  * broadcast to a shuffle or sneaks in a cartesian product should
  * fail CI, not a 100 TB run.
  */
class Round4PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("two_hop_reach: degree-cap filter broadcasts; no cartesian") {
    val p = plan(Graph.twoHopReach(spark, sf))
    assert(p.contains("BroadcastHashJoin"), "mid filter must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("hard_negatives / negative_samples: candidate side broadcasts") {
    val p1 = plan(Similarity.hardNegatives(spark, sf, 10))
    assert(p1.contains("BroadcastExchange"), "query side must broadcast")
    val p2 = plan(Curation.negativeSamples(spark, sf))
    assert(p2.contains("BroadcastExchange"), "negative pool must broadcast")
    assert(!p2.contains("CartesianProduct"))
  }

  test("frequent_pairs / pair_lift: pair fan-out is an equality join") {
    Seq(plan(Relational.frequentPairs(spark, sf)),
        plan(Relational.pairLift(spark, sf))).foreach { p =>
      assert(!p.contains("CartesianProduct"))
      assert(!p.contains("BroadcastNestedLoopJoin"),
        "basket pairing must join on the order key, never NL")
    }
  }

  test("psi_drift / mad_anomalies / seasonal_hourly: stats broadcast back") {
    Seq(plan(Events.psiDrift(spark, sf)),
        plan(Events.madAnomalies(spark, sf)),
        plan(Events.seasonalHourly(spark, sf))).foreach { p =>
      assert(p.contains("BroadcastExchange"),
        "per-type stats must broadcast onto the scan, not shuffle it")
    }
  }

  test("eventually_follows: span join is equality-keyed on user") {
    val p = plan(Events.eventuallyFollows(spark, sf))
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("Join") || p.contains("join"))
  }

  test("mp_quantiles: sketch rides partial aggregation") {
    val p = plan(Relational.mpQuantiles(spark, sf))
    // typed Aggregator partials appear as ObjectHashAggregate /
    // SortAggregate partial+final pairs — both mean map-side state
    assert(p.contains("Aggregate"), "must plan as an aggregate")
    assert(!p.contains("CartesianProduct"))
  }
}
