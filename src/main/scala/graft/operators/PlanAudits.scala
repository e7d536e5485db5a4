package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.Tables

/** Driver-visible audit rows for the two storage/runtime capabilities
  * that are real library surface but not hash-oracle-able (no DuckDB
  * restatement exists for physical-plan facts): bucketed co-located
  * joins (W32) and AQE runtime coalescing (W123). Each runs the
  * capability END TO END on the round's tables and surfaces the plan
  * evidence as a one-row DataFrame, so the driver's rows-only gate
  * sees them every round instead of only `sbt test` (SourcesSpec /
  * AqeSpec keep the strict asserts).
  */
object PlanAudits {

  /** Write orders and lineitem bucketed on the join key, join them
    * with broadcast disabled, and report the shuffle-exchange count in
    * the finalized plan (0 = the 100 TB co-location story: both scans
    * pre-hashed into the same bucket layout, the sort-merge join reads
    * buckets pairwise and nothing crosses the wire) plus row parity
    * with the plain unbucketed join.
    */
  def bucketedJoinAudit(s: SparkSession, dir: String,
                        buckets: Int = 8): DataFrame = {
    import s.implicits._
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_bucket_audit").toString
    val tag = java.util.UUID.randomUUID().toString.takeWhile(_ != '-')
    val (obT, lbT) = (s"graft_audit_ob_$tag", s"graft_audit_lb_$tag")
    val prevThresh = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast join: exchange ELIMINATION is the claim
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Tables.orders(s, dir).select("o_orderkey", "o_custkey")
        .write.option("path", s"$tmp/ob").mode("overwrite")
        .bucketBy(buckets, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(obT)
      Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
        .write.option("path", s"$tmp/lb").mode("overwrite")
        .bucketBy(buckets, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(lbT)
      val joined = s.table(obT)
        .join(s.table(lbT), col("o_orderkey") === col("l_orderkey"))
      val joinRows = joined.count()
      val plan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p                        => p
      }
      val exchanges =
        plan.collect { case e: ShuffleExchangeExec => e }.length
      val plainRows = Tables.orders(s, dir)
        .join(Tables.lineitem(s, dir),
          col("o_orderkey") === col("l_orderkey")).count()
      Seq((buckets, exchanges, exchanges == 0, joinRows,
          joinRows == plainRows))
        .toDF("buckets", "shuffle_exchanges", "exchange_free",
          "join_rows", "rows_match_unbucketed")
    } finally {
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
      s.sql(s"DROP TABLE IF EXISTS $obT")
      s.sql(s"DROP TABLE IF EXISTS $lbT")
    }
  }

  /** Aggregate orders onto 7 keys under the session's declared shuffle
    * partition count and report how many partitions the finalized
    * adaptive plan actually ran — runtime coalescing evidence (a tiny
    * shuffle must not fan out to the static setting; at 100 TB the
    * same mechanism right-sizes every post-filter stage).
    */
  def aqeCoalesceAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val agg = Tables.orders(s, dir)
      .select(pmod(col("o_orderkey"), lit(7)).as("k"))
      .groupBy("k").count()
    val declared = s.conf.get("spark.sql.shuffle.partitions").toInt
    val finalParts = agg.rdd.getNumPartitions // finalizes the AQE plan
    val nGroups = agg.count()
    Seq((s.conf.get("spark.sql.adaptive.enabled") == "true",
        declared, finalParts,
        finalParts < declared || declared == 1, nGroups))
      .toDF("aqe_enabled", "declared_partitions", "final_partitions",
        "coalesced", "n_groups")
  }

  /** In-flight pipeline observability via `Dataset.observe` (W329):
    * a `CollectMetrics` node rides the events scan and surfaces
    * row-count / null / malformed-JSON / negative-value tallies as a
    * side effect of the SAME pass that does the work — the mechanism
    * a 100 TB ingest uses for data-quality counters without paying a
    * second scan (the `Observation` helper blocks until the action's
    * metrics arrive; no listener plumbing). Unlike the plan audits
    * above, the VALUES are plain aggregates, so this one carries a
    * full DuckDB oracle: the observe path must agree with the direct
    * restatement bit-for-bit.
    */
  def observeMetrics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val obs = org.apache.spark.sql.Observation(
      s"graft_obs_${java.util.UUID.randomUUID().toString.take(8)}")
    val ev = Tables.events(s, dir).observe(obs,
      count(lit(1)).as("rows"),
      sum(col("value").isNull.cast("long")).as("null_values"),
      sum(get_json_object(col("props"), "$.k").isNull.cast("long"))
        .as("bad_props"),
      sum((col("value") < 0).cast("long")).as("neg_values"),
      // CollectMetrics forbids DISTINCT aggregates — max is the
      // freshness stand-in a watermarking ingest would track anyway
      max(col("event_id")).as("max_event_id"))
    // the RDD-path actions (foreachPartition) bypass the SQL metrics
    // event; count() drives the CollectMetrics node as documented
    ev.count()
    val m = obs.get
    Seq((m("rows").asInstanceOf[Long],
        m("null_values").asInstanceOf[Long],
        m("bad_props").asInstanceOf[Long],
        m("neg_values").asInstanceOf[Long],
        m("max_event_id").asInstanceOf[Long]))
      .toDF("n_rows", "null_values", "bad_props", "neg_values",
        "max_event_id")
  }

  /** Rows-only audit for the SQL-extension surface (W12/W96/W110,
    * VERDICT r5 #7): registers every graft SQL function on the live
    * session (the driver's Verify session is built without
    * `withExtensions`) and evaluates each on a fixed literal sample —
    * one deterministic row per function, so the driver sees the whole
    * `spark.sql(...)` surface resolve, parse, and execute every round
    * instead of only under `sbt test` (ExtensionsSpec keeps the strict
    * value asserts). The table enumerates itself: a newly injected
    * function without a sample row fails the audit's own count gate.
    */
  def sqlExtensionsAudit(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.registerAll(s)
    val samples = Seq(
      "simhash64" -> "simhash64(array('the','quick','fox'))",
      "simhash40" -> "simhash40(array('the','quick','fox'))",
      "poly_hash_array" -> "poly_hash_array(array('abc','def'))",
      "minhash_signature" ->
        "minhash_signature(array('abc','def'), 4)",
      "cosine_sim" ->
        "cosine_sim(array(1.0d, 0.0d), array(0.6d, 0.8d))",
      "jaro_winkler" -> "jaro_winkler('martha', 'marhta')",
      "no_pushdown" -> "no_pushdown(42)",
      "graft_tokenize" -> "graft_tokenize('The quick, Fox!')",
      "pct_hash" -> "pct_hash(123456789)",
      "jaccard_sim" ->
        "jaccard_sim(array('a','b','c'), array('b','c','d'))")
    require(samples.length == graft.GraftExtensions.functions.length &&
      samples.map(_._1).toSet ==
        graft.GraftExtensions.functions.map(_._1.funcName).toSet,
      "sqlExtensionsAudit sample table out of sync with GraftExtensions")
    val selects = samples.map { case (n, e) =>
      s"""SELECT '$n' AS function, '${e.replace("'", "''")}' AS sample,
          CAST(($e) AS STRING) AS result"""
    }
    s.sql(selects.mkString(" UNION ALL ")).orderBy("function")
  }
}
