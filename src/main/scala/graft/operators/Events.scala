package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CacheScope, Tables}
import graft.expressions.HashExpressions.polyHashArray

/** Event-stream tier over the `events` fixture: gap-based
  * sessionization and tumbling-window aggregation — the batch
  * equivalents of the Structured Streaming operators in
  * `graft.streaming` (same semantics, oracle-checkable here).
  *
  * Timestamps surface as epoch seconds (bigint) so the DuckDB compare
  * is representation-independent.
  */
object Events {

  /** Gap-based sessions: a new session starts when a user is idle longer
    * than `gapMinutes`. One shuffle on user_id; the lag/cumsum pattern
    * keeps everything inside two window passes over the same partition.
    */
  def sessionize(s: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val epoch = unix_timestamp(col("ts"))
    val prev = lag(epoch, 1).over(w)
    val newSession = when(
      prev.isNull || (epoch - prev > gapMinutes * 60L), 1).otherwise(0)
    Tables.events(s, dir)
      .withColumn("new_s", newSession)
      .withColumn("session_seq",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(epoch).as("start_epoch"),
        max(epoch).as("end_epoch"),
        round(sum(col("value")), 4).as("sum_value"))
  }

  /** Range-frame moving aggregate: per user, the average and count of
    * event values in the trailing `rangeSec`-second window ending at
    * each event (frame = RANGE BETWEEN rangeSec PRECEDING AND CURRENT
    * ROW on the epoch ordering). Range frames are tie-safe by
    * construction — events in the same second share one frame — so the
    * result is deterministic without an event-id tiebreak. Same
    * shuffle shape as any window: one exchange on user_id.
    */
  def movingAvg(s: SparkSession, dir: String,
                rangeSec: Long = 300): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ep")
      .rangeBetween(-rangeSec, 0)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ep"), col("value"))
      .withColumn("mov_avg", round(avg(col("value")).over(w), 6))
      .withColumn("mov_cnt", count(lit(1)).over(w))
  }

  /** Sliding-window aggregation via Spark's `window()`: 1-hour windows
    * every 30 minutes, so each event lands in exactly two windows
    * (batch twin of the streaming windowed agg — identical call shape
    * under `readStream`). Planned as one generate (the two window
    * assignments) + one aggregate: a single shuffle.
    */
  def slidingWindow(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("cnt"), col("sum_value"))

  /** JSON property extraction + aggregate (gap-list operator — the
    * reference had no JSON/map functions): pull `props.k` out of the
    * JSON column and aggregate per event type. `get_json_object` is a
    * codegen'd built-in; at scale a repeatedly-queried key would be
    * materialized to its own column at ingest.
    */
  def jsonPropAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("int").as("kv"))
      .groupBy("event_type")
      .agg(count(col("kv")).as("cnt"),
        round(avg(col("kv")), 6).as("avg_k"),
        min(col("kv")).as("min_k"),
        max(col("kv")).as("max_k"))

  /** Gap sessions via Spark's native `session_window` operator (the
    * declarative form of `sessionize`'s lag/cumsum construction — one
    * aggregate, streaming-compatible). Boundary semantics match the lag
    * form exactly: events exactly `gap` apart still merge (verified by
    * spec — the session extends through `last + gap` INCLUSIVE), a new
    * session starts only when `diff > gap`. Window end = last event +
    * gap; the oracle mirrors this at full microsecond precision.
    */
  def sessionWindowAgg(s: SparkSession, dir: String,
                       gapMinutes: Int = 30): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"),
        session_window(col("ts"), s"$gapMinutes minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        unix_timestamp(col("sw.start")).as("start_epoch"),
        unix_timestamp(col("sw.end")).as("end_epoch"),
        col("n_events"), col("sum_value"))

  /** Tumbling 1-hour windows per event type (batch twin of the
    * streaming windowed aggregation).
    */
  def hourlyAgg(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 4).as("sum_value"))

  /** Per-user inter-arrival gaps (lag/lead window pair — gap-list
    * operators): seconds since the previous event and until the next
    * one. Inner rows only (both neighbors present) so the result is
    * null-free for the oracle compare.
    */
  def interArrival(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val ep = unix_timestamp(col("ts"))
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), ep.as("ep"),
        lag(ep, 1).over(w).as("prev_ep"),
        lead(ep, 1).over(w).as("next_ep"))
      .filter(col("prev_ep").isNotNull && col("next_ep").isNotNull)
      .select(col("user_id"), col("event_id"), col("ep"),
        (col("ep") - col("prev_ep")).as("gap_before"),
        (col("next_ep") - col("ep")).as("gap_after"))
  }

  /** Range (interval) join via bucketing — the scale pattern for theta
    * joins on time ranges: sessions built over `intervalType` events
    * become [start, end] intervals; `probeType` events join into the
    * interval containing them. Instead of the nested-loop a raw
    * `BETWEEN` theta join would plan, each interval explodes into the
    * coarse hour-buckets it covers and probes join on the EQUALITY key
    * (user, bucket) first — candidates are bucket-mates only, the exact
    * range predicate filters after. Gap-based sessions are disjoint per
    * user, so every probe lands in at most one interval (deterministic).
    */
  def rangeJoin(s: SparkSession, dir: String,
                intervalType: String, probeType: String,
                gapMinutes: Int = 30, bucketSecs: Long = 3600L): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("ep"), col("event_type"))
    // order by the RAW timestamp (sub-second resolution), exactly like
    // sessionize and the oracle — ordering by the floored epoch could
    // place a gap-boundary flag on a different same-second row
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag(col("ep"), 1).over(w)
    val sess = ev.filter(col("event_type") === intervalType)
      .withColumn("new_s",
        when(prev.isNull || (col("ep") - prev > gapMinutes * 60L), 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq")
      .agg(min(col("ep")).as("start_epoch"),
        // a session stays "active" until its gap would have expired
        (max(col("ep")) + gapMinutes * 60L).as("end_epoch"))
    val ivals = sess.select(col("user_id"), col("session_seq"),
      col("start_epoch"), col("end_epoch"),
      explode(sequence((col("start_epoch") / bucketSecs).cast("long"),
        (col("end_epoch") / bucketSecs).cast("long"))).as("bucket"))
    val probes = ev.filter(col("event_type") === probeType)
      .select(col("user_id"), col("event_id"), col("ep"),
        (col("ep") / bucketSecs).cast("long").as("bucket"))

    probes.join(ivals, Seq("user_id", "bucket"))
      .filter(col("ep").between(col("start_epoch"), col("end_epoch")))
      .groupBy("user_id", "session_seq")
      .agg(count(lit(1)).as("n_probe"))
  }

  /** `rangeJoin` again, through the NATIVE interval-join operator
    * (`graft.plans.IntervalJoinExec` via `GraftStrategy`): sessions
    * build declaratively exactly as in `rangeJoin`, but probes join
    * the session intervals through the sorted-merge active-buffer
    * exec instead of the time-grid bucket join — no grid parameter,
    * each input moves once, and per-key state is the (tiny) concurrent
    * interval depth. Same output contract, so the same oracle must
    * hash-match.
    */
  def rangeJoinNative(s: SparkSession, dir: String,
                      intervalType: String, probeType: String,
                      gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.graftglue.PlanApi
    if (!s.experimental.extraStrategies.exists(_ eq graft.plans.GraftStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.GraftStrategy
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_timestamp(col("ts")).as("ep"), col("event_type"))
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val prev = lag(col("ep"), 1).over(w)
    val sess = ev.filter(col("event_type") === intervalType)
      .withColumn("new_s",
        when(prev.isNull || (col("ep") - prev > gapMinutes * 60L), 1)
          .otherwise(0))
      .withColumn("session_seq",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id").as("s_user"), col("session_seq"))
      .agg(min(col("ep")).as("start_epoch"),
        (max(col("ep")) + gapMinutes * 60L).as("end_epoch"))
    val probes = ev.filter(col("event_type") === probeType)
      .select(col("user_id"), col("event_id"), col("ep"))
    val (lPlan, rPlan) = (PlanApi.analyzed(sess), PlanApi.analyzed(probes))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) = p.output.find(_.name == name).get
    PlanApi.ofRows(s, graft.plans.IntervalJoinPlan(
        lPlan, rPlan,
        attr(lPlan, "s_user"), attr(lPlan, "start_epoch"),
        attr(lPlan, "end_epoch"),
        attr(rPlan, "user_id"), attr(rPlan, "ep")))
      .groupBy(col("s_user").as("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_probe"))
  }

  /** As-of join (custom operator the built-in join surface lacks): for
    * each `leftType` event, the latest `rightType` event of the same
    * user with ts_r <= ts_l. Implemented as the scalable union+carry
    * pattern — tag both sides, one window pass carries the most recent
    * right-side row forward, then keep left rows — ONE shuffle on
    * user_id, no range-join candidate explosion (a range join would
    * produce O(|L|·|R|) per user before filtering; this is O(|L|+|R|)).
    * Right side is pre-deduped to the max event_id per (user, second)
    * so ties are deterministic. Inner flavor: lefts with no preceding
    * right are dropped (keeps the result null-free).
    */
  def asofJoin(s: SparkSession, dir: String,
               leftType: String, rightType: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ep"), col("event_type"), col("value"))
    val lefts = ev.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id"), col("ep"))
    val rights = ev.filter(col("event_type") === rightType)
      .groupBy(col("user_id"), col("ep").as("r_ep"))
      .agg(max_by(struct(col("event_id"), col("value")), col("event_id"))
        .as("r"))
      .select(col("user_id"), col("r_ep"),
        col("r.event_id").as("r_event_id"), col("r.value").as("r_value"))
    // union both sides; rights sort before lefts at the same second so
    // an as-of match may share the left's timestamp
    val tagged = lefts
      .select(col("user_id"), col("ep"), lit(1).as("side"),
        col("event_id"), lit(null).cast("long").as("r_event_id"),
        lit(null).cast("double").as("r_value"))
      .unionByName(rights
        .select(col("user_id"), col("r_ep").as("ep"), lit(0).as("side"),
          lit(null).cast("long").as("event_id"),
          col("r_event_id"), col("r_value")))
    val w = Window.partitionBy("user_id").orderBy("ep", "side")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .select(col("user_id"), col("event_id"), col("ep"),
        last(col("r_event_id"), ignoreNulls = true).over(w).as("r_event_id"),
        last(col("r_value"), ignoreNulls = true).over(w).as("r_value"),
        col("side"))
      .filter(col("side") === 1 && col("r_event_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ep"),
        col("r_event_id"), round(col("r_value"), 4).as("r_value"))
  }

  /** Time-to-convert distribution: seconds from each user's FIRST
    * `fromType` event to their first `toType` event at or after it,
    * summarized as exact percentiles plus the converting-user count.
    * Two tiny per-user min-aggregations (filter-pushed scans) joined
    * on the key — never a pairwise event join; the percentile gather
    * sees one row per converting user.
    */
  def timeToConvert(s: SparkSession, dir: String,
                    fromType: String = "view",
                    toType: String = "purchase"): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ep"))
    val firstFrom = ev.filter(col("event_type") === fromType)
      .groupBy("user_id").agg(min(col("ep")).as("from_ep"))
    val conv = ev.filter(col("event_type") === toType)
      .join(firstFrom, "user_id")
      .filter(col("ep") >= col("from_ep"))
      .groupBy("user_id")
      // from_ep is constant within the group post-join; min selects it
      .agg((min(col("ep")) - min(col("from_ep"))).as("secs"))
    conv.agg(count(lit(1)).as("n_converted"),
      round(percentile(col("secs"), lit(0.5)), 4).as("p50_sec"),
      round(percentile(col("secs"), lit(0.9)), 4).as("p90_sec"))
  }

  /** Median and p90 inter-arrival gap per event type — the summary the
    * raw `interArrival` listing feeds (capacity planning reads these
    * two numbers, not 10k gaps). One window pass for the lag, one
    * percentile aggregate per type.
    */
  def gapPercentiles(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("event_type", "user_id")
      .orderBy("ep", "event_id")
    Tables.events(s, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ep"))
      .withColumn("gap", col("ep") - lag(col("ep"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        round(percentile(col("gap"), lit(0.5)), 4).as("p50_gap"),
        round(percentile(col("gap"), lit(0.9)), 4).as("p90_gap"))
  }

  /** Rolling 7-day active users per day: for every day with events,
    * the distinct users active in the trailing `windowDays` window —
    * the DAU/WAU family. Events first collapse to distinct
    * (user, day) pairs (the only pass over the raw table); the tiny
    * day spine broadcasts against those pairs with a range predicate,
    * so no theta-join explosion touches the event log. At 100 TB the
    * exact countDistinct swaps for per-day HLL sketches merged over
    * the window — same two-level shape, mergeable state.
    */
  def rollingActiveUsers(s: SparkSession, dir: String,
                         windowDays: Int = 7): DataFrame = {
    val userDays = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .persist()
    CacheScope.register(userDays) // eager: spine + the window join both read it
    val spine = userDays.select(col("day").as("d")).distinct()
    userDays.join(broadcast(spine),
        datediff(col("d"), col("day")).between(0, windowDays - 1))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(col("d").as("day"), col("active_users"))
  }

  /** Most common event-type trigrams across per-user timelines (two
    * leads inside the user partition, one global count, distributed
    * top-k via TakeOrderedAndProject) — the path-mining primitive
    * behind "what do users do next" analyses. Ties break on the
    * trigram string so the selected set is deterministic.
    */
  def commonTrigrams(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("t1"))
      .withColumn("t2", lead(col("t1"), 1).over(w))
      .withColumn("t3", lead(col("t1"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("t1"), col("t2"), col("t3")).as("trigram"))
      .groupBy("trigram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("trigram"))
      .limit(k)
  }

  /** Cross-series correlation: Pearson correlation between two event
    * types' DAILY counts — "do clicks and purchases move together?".
    * Two tiny keyed aggregates full-outer-joined on day (absent days
    * count zero — dropping them would bias the correlation upward),
    * then one corr aggregate over ~days rows.
    */
  def typeDailyCorr(s: SparkSession, dir: String,
                    typeA: String = "click",
                    typeB: String = "purchase"): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), to_date(col("ts")).as("day"))
    def daily(t: String, out: String) =
      ev.filter(col("event_type") === t)
        .groupBy("day").agg(count(lit(1)).as(out))
    daily(typeA, "a").join(daily(typeB, "b")
        .withColumnRenamed("day", "day_b"),
        col("day") === col("day_b"), "full_outer")
      .select(coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
      .agg(round(corr(col("a"), col("b")), 6).as("daily_corr"),
        count(lit(1)).as("n_days"))
  }

  /** New vs returning actives per day: a user counts as NEW on their
    * first-ever day and returning afterwards — the acquisition/
    * retention split on every product dashboard. First-seen day is one
    * keyed min-aggregate; the daily split joins it back on user and
    * compares days. All frames are user-day sized, never the raw log.
    */
  def newVsReturning(s: SparkSession, dir: String): DataFrame = {
    val userDays = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .persist()
    CacheScope.register(userDays) // eager: first-seen + the split both read it
    val first = userDays.groupBy("user_id")
      .agg(min(col("day")).as("first_day"))
    userDays.join(first, "user_id")
      .groupBy("day")
      .agg(sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
        .as("n_new"),
        sum(when(col("day") === col("first_day"), 0L).otherwise(1L))
          .as("n_returning"))
  }

  /** DAU/WAU stickiness per day: the share of the trailing week's
    * active users who were also active TODAY — the engagement ratio
    * product teams track. Reuses the rolling-window shape: one
    * distinct user-day collapse feeds both the daily and the windowed
    * distinct counts (two aggregates over the collapsed pairs, joined
    * on day; never two passes over the raw log).
    */
  def dauWauRatio(s: SparkSession, dir: String,
                  windowDays: Int = 7): DataFrame = {
    val userDays = Tables.events(s, dir)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .persist()
    CacheScope.register(userDays) // eager: both aggregates read it
    val dau = userDays.groupBy("day")
      .agg(countDistinct(col("user_id")).as("dau"))
    val spine = userDays.select(col("day").as("d")).distinct()
    val wau = userDays.join(broadcast(spine),
        datediff(col("d"), col("day")).between(0, windowDays - 1))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("d"))
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau").cast("double") / col("wau"), 6).as("stickiness"))
  }

  /** Chi-square independence statistic between event type and
    * hour-of-day — the drift check a pipeline runs on a categorical
    * pair before trusting a segmentation. The contingency table is one
    * aggregate; marginals re-aggregate from it (cells ≪ rows, so both
    * are cheap at any scale); expected counts come from the FULL
    * type × hour grid (a cross of the two small marginal frames), so
    * never-observed cells still contribute their expected mass.
    * Output: one row (chi2, n_cells).
    */
  def chiSquare(s: SparkSession, dir: String): DataFrame = {
    val obs = Tables.events(s, dir)
      .select(col("event_type"), hour(col("ts")).as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("o"))
      .persist()
    CacheScope.register(obs) // eager: marginals + the grid join all read it
    val rowTot = obs.groupBy("event_type").agg(sum(col("o")).as("rt"))
    val colTot = obs.groupBy("hr").agg(sum(col("o")).as("ct"))
    val total = obs.agg(sum(col("o")).as("n"))
    rowTot.crossJoin(colTot).crossJoin(broadcast(total))
      .join(obs, Seq("event_type", "hr"), "left")
      .select((coalesce(col("o"), lit(0))).as("o"),
        (col("rt") * col("ct") / col("n")).as("e"))
      .agg(round(sum(pow(col("o") - col("e"), 2) / col("e")), 4).as("chi2"),
        count(lit(1)).as("n_cells"))
  }

  /** Time-weighted average of `value` per user: each reading holds
    * until the next one, so it weighs by its holding duration —
    * twa = Σ vᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first). The metric a
    * state-sampled gauge needs where the plain `avg` over-counts
    * burst periods. One window pass (lead) + one aggregate; users
    * with a single event have no held interval and drop out.
    */
  def timeWeightedAvg(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ep"), col("value"))
      .withColumn("next_ep", lead(col("ep"), 1).over(w))
      .filter(col("next_ep").isNotNull)
      .groupBy("user_id")
      .agg(round(sum(col("value") * (col("next_ep") - col("ep"))) /
          (max(col("next_ep")) - min(col("ep"))), 6).as("twa"),
        count(lit(1)).as("n_held"))
  }

  /** Last-write-wins compaction: the latest event per (user, type) —
    * the CDC/upsert-log collapse every snapshot-serving store runs.
    * Deterministic tie-break on event_id; the rank filter plans as
    * WindowGroupLimit, so each map task keeps one candidate per key
    * before the shuffle — at 100 TB the shuffle carries one row per
    * (user, type), not the log.
    */
  def latestSnapshot(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("ep").desc, col("event_id").desc)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_timestamp(col("ts")).as("ep"), col("value"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_type", "event_id", "ep", "value")
  }

  /** The as-of join again, through the NATIVE physical operator
    * (`graft.plans.AsOfJoinExec` via `AsOfJoinPlan` + `GraftStrategy`;
    * the session must carry `GraftExtensions`). Same contract and
    * output as `asofJoin` — the right side is pre-aggregated to unique
    * (user, second) with the max-event_id tiebreak, so "last right row
    * in child order" is deterministic. Versus the union+carry
    * composition, only the two inputs shuffle (each once, on the key)
    * and the merge itself is a single streaming pass with one held row
    * of state — no window frames over the unioned stream.
    */
  def asofJoinNative(s: SparkSession, dir: String,
                     leftType: String, rightType: String): DataFrame = {
    import org.apache.spark.sql.graftglue.PlanApi
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).as("ep"), col("event_type"), col("value"))
    val lefts = ev.filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id"), col("ep"))
    // repartition on user BEFORE the (user, second) dedup aggregate:
    // hash(user) satisfies the agg's ClusteredDistribution(user, ep)
    // (subset key) AND the join's ClusteredDistribution(user), so the
    // right side shuffles exactly once — without it EnsureRequirements
    // plans hash(user, ep) for the agg plus a second hash(user)
    // exchange for the join
    val rights = ev.filter(col("event_type") === rightType)
      .repartition(col("user_id"))
      .groupBy(col("user_id").as("r_user"), col("ep").as("r_ep"))
      .agg(max_by(struct(col("event_id"), col("value")), col("event_id"))
        .as("r"))
      .select(col("r_user"), col("r_ep"),
        col("r.event_id").as("r_event_id"), col("r.value").as("r_value"))
    // self-sufficient on any session: extension-less sessions (e.g. a
    // bare spark-shell) get the strategy via experimental; sessions
    // built withExtensions(GraftExtensions) already have it (a second
    // registration would be harmless — planner candidates dedupe by
    // first match — but skip it anyway)
    if (!s.experimental.extraStrategies.exists(_ eq graft.plans.GraftStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ graft.plans.GraftStrategy
    val (lPlan, rPlan) = (PlanApi.analyzed(lefts), PlanApi.analyzed(rights))
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             name: String) = p.output.find(_.name == name).get
    val joined = PlanApi.ofRows(s, graft.plans.AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, "user_id"), attr(lPlan, "ep"),
      attr(rPlan, "r_user"), attr(rPlan, "r_ep")))
    joined.filter(col("r_event_id").isNotNull)
      .select(col("user_id"), col("event_id"), col("ep"),
        col("r_event_id"), round(col("r_value"), 4).as("r_value"))
  }

  /** Ordered funnel analysis: how far each user progresses through
    * view → click → purchase, where each stage must strictly follow the
    * previous one in (second-granularity) event time. Three filtered
    * min-aggregations chained by key joins — each stage's frame shrinks,
    * so the plan is a cascade of small hash joins, never a per-user
    * sort. Returns (user_id, stage ∈ 1..3) for users with ≥1 view.
    */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ep"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ep").as("t1"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(views, "user_id").filter(col("ep") > col("t1"))
      .groupBy("user_id").agg(min("ep").as("t2"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, "user_id").filter(col("ep") > col("t2"))
      .groupBy("user_id").agg(min("ep").as("t3"))
    views.join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select(col("user_id"),
        (lit(1) + when(col("t2").isNotNull, 1).otherwise(0) +
          when(col("t3").isNotNull, 1).otherwise(0)).as("stage"))
  }

  /** Deadline-windowed funnel (ClickHouse `windowFunnel` semantics):
    * a user reaches depth d iff SOME view→click→purchase chain exists
    * with every stage inside `windowSecs` of ITS OWN entry view — the
    * campaign-attribution funnel, where [[funnel]]'s lifetime funnel
    * over-counts. Starting the chain greedily from each view and
    * taking the earliest qualifying next stage is existence-optimal
    * (earliest next step maximizes remaining slack), so the plan is a
    * cascade of user-keyed joins + min-aggs per entry view — no
    * per-user sort, nothing quadratic beyond per-user stage counts
    * (the windowFunnel cost class everywhere it's implemented).
    * Output: per reached depth, user count and corpus share.
    */
  def windowFunnel(s: SparkSession, dir: String,
                   windowSecs: Long = 21600L): DataFrame = {
    val ev = CacheScope.track(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ep"))
      .persist()) // three stage filters scan it
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ep").as("tv"))
    val c2 = v.join(ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ep").as("tc")), "user_id")
      .filter(col("tc") > col("tv"))
      .groupBy("user_id", "tv").agg(min("tc").as("t2"))
    val c3 = c2.join(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ep").as("tp")), "user_id")
      .filter(col("tp") > col("t2"))
      .groupBy("user_id", "tv", "t2").agg(min("tp").as("t3"))
      .select("user_id", "tv", "t3")
    val depth = v
      .join(c2, Seq("user_id", "tv"), "left")
      .join(c3, Seq("user_id", "tv"), "left")
      .select(col("user_id"),
        when(col("t3").isNotNull &&
          col("t3") <= col("tv") + lit(windowSecs), 3)
          .when(col("t2").isNotNull &&
            col("t2") <= col("tv") + lit(windowSecs), 2)
          .otherwise(1).as("d"))
      .groupBy("user_id").agg(max("d").as("depth"))
    val tot = depth.agg(count(lit(1)).as("n_entered"))
    depth.groupBy("depth").agg(count(lit(1)).as("n_users"))
      .crossJoin(broadcast(tot))
      .select(col("depth"), col("n_users"),
        q(col("n_users").cast("double") / col("n_entered"), 6)
          .as("share"))
      .orderBy("depth")
  }

  /** Event-transition matrix: P(next event type | current type) per
    * user timeline — `lead` over each user's (ts, event_id) order, pair
    * counts, then a per-source window total for the probability. Two
    * shuffles (user window + pair count) regardless of history length;
    * the output is |types|² rows.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type"), col("next_type"))
      .agg(count(lit(1)).as("cnt"))
    val wSrc = Window.partitionBy("event_type")
    pairs.select(col("event_type"), col("next_type"), col("cnt"),
      round(col("cnt") / sum(col("cnt")).over(wSrc), 6).as("prob"))
  }

  /** Gaps-and-islands: longest strictly-increasing value streak per
    * user. A run boundary is `value <= lag(value)`; the running count
    * of boundaries labels each maximal island, whose sizes reduce to a
    * per-user max. Everything stays inside one user-partition window
    * pass plus two keyed aggregations.
    */
  def valueStreaks(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val run = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("brk",
        when(lag(col("value"), 1).over(w).isNull ||
          col("value") <= lag(col("value"), 1).over(w), 1).otherwise(0))
      .withColumn("island", sum(col("brk")).over(run))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"))
  }

  /** Exponential moving average (α = 0.2) over each user's value
    * timeline — an order-dependent recurrence (ema_i = α·x_i +
    * (1−α)·ema_{i−1}, seeded with the first value) that no commutative
    * aggregate expresses. Each user's events are collected into one
    * sorted array (one shuffle) and folded by a single `aggregate`
    * lambda; the fold emits the running value per element so the result
    * explodes back to one row per event. Per-user state is the
    * timeline length — bounded in practice; a year of hourly telemetry
    * is ~9k elements. The recurrence is evaluated in the same IEEE
    * double op order as the oracle's recursive CTE, so values match
    * bit-for-bit before the final display rounding.
    */
  def emaSmooth(s: SparkSession, dir: String, alpha: Double = 0.2): DataFrame = {
    val acc0 = array().cast(
      "array<struct<event_id:bigint,value:double,ema:double>>")
    val folded = Tables.events(s, dir)
      .select(col("user_id"),
        struct(col("ts"), col("event_id"), col("value")).as("e"))
      .groupBy("user_id")
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(col("user_id"), aggregate(col("es"), acc0, (acc, e) => {
        val seeded = struct(e("event_id").as("event_id"),
          e("value").as("value"), e("value").as("ema"))
        val stepped = struct(e("event_id").as("event_id"),
          e("value").as("value"),
          (lit(alpha) * e("value") +
            lit(1 - alpha) * element_at(acc, -1)("ema")).as("ema"))
        when(size(acc) === 0, array(seeded))
          .otherwise(concat(acc, array(stepped)))
      }).as("out"))
    folded.select(col("user_id"), explode(col("out")).as("o"))
      .select(col("user_id"), col("o.event_id"), col("o.value"),
        round(col("o.ema"), 6).as("ema"))
  }

  /** Time-series gap interpolation: densify each user's hourly mean
    * value onto a full hour spine (generated `sequence`, bounded by the
    * user's own first/last hour) and linearly interpolate missing
    * hours between their nearest observed neighbors. Two window passes
    * (backward carry + forward carry, IGNORE NULLS) over the spine —
    * the standard fill idiom; endpoints are always observed because the
    * spine is span-bounded. Spine size is span-hours per user, so the
    * operator scales with time range, not event volume.
    */
  def interpolateHourly(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .groupBy(col("user_id"),
        unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"))
      .agg(avg(col("value")).as("v"))
    val spine = hourly.groupBy("user_id")
      .agg(min("hour_epoch").as("lo"), max("hour_epoch").as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), lit(3600L))).as("hour_epoch"))
    val back = Window.partitionBy("user_id").orderBy("hour_epoch")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val fwd = Window.partitionBy("user_id").orderBy("hour_epoch")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(hourly, Seq("user_id", "hour_epoch"), "left")
      .select(col("user_id"), col("hour_epoch"), col("v"),
        last(col("v"), ignoreNulls = true).over(back).as("pv"),
        last(when(col("v").isNotNull, col("hour_epoch")), ignoreNulls = true)
          .over(back).as("ph"),
        first(col("v"), ignoreNulls = true).over(fwd).as("nv"),
        first(when(col("v").isNotNull, col("hour_epoch")), ignoreNulls = true)
          .over(fwd).as("nh"))
      .select(col("user_id"), col("hour_epoch"),
        when(col("v").isNotNull, lit(1)).otherwise(lit(0)).as("observed"),
        // explicit half-up via floor keeps rounding a pure IEEE formula
        // (round() half-way behavior differs between engines and the
        // hour-midpoint interpolations land exactly on .xxxxxx5)
        (floor(when(col("v").isNotNull, col("v")).otherwise(
          col("pv") + (col("nv") - col("pv")) *
            ((col("hour_epoch") - col("ph")).cast("double") /
              (col("nh") - col("ph")))) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("value"))
  }

  /** Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): correlate
    * per-bucket click and purchase volumes where the bucket itself is
    * nullable (low-value events fall into the NULL bucket, which must
    * match ITSELF — a plain `=` would silently drop it). Both sides
    * aggregate before the join, so the null-safe comparison runs over
    * two tiny keyed tables regardless of event volume.
    */
  def nullsafeJoin(s: SparkSession, dir: String,
                   minValue: Double = 5.0): DataFrame = {
    val ev = Tables.events(s, dir).select(col("event_type"),
      when(col("value") >= minValue,
        pmod(get_json_object(col("props"), "$.k").cast("int"), lit(10)))
        .as("bucket"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("bucket").agg(count(lit(1)).as("n_click"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("bucket").agg(count(lit(1)).as("n_purchase"))
    clicks.join(purchases, clicks("bucket") <=> purchases("bucket"))
      .select(clicks("bucket").as("bucket"),
        col("n_click"), col("n_purchase"))
  }

  /** Frame-exact value windows: each user's first, last and second
    * event type over the full partition frame (`first_value` /
    * `last_value` / `nth_value` with ROWS BETWEEN UNBOUNDED PRECEDING
    * AND UNBOUNDED FOLLOWING — the default running frame would make
    * `last_value` vacuously equal the current row). Collapsed to one
    * row per user; the values are frame-constant, so max() is an
    * arbitrary-but-exact picker.
    */
  def firstLastWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(col("user_id"),
        first(col("event_type")).over(w).as("first_et"),
        last(col("event_type")).over(w).as("last_et"),
        nth_value(col("event_type"), 2).over(w).as("second_et"))
      .groupBy("user_id")
      .agg(max("first_et").as("first_et"),
        max("last_et").as("last_et"),
        max("second_et").as("second_et"))
  }

  /** Retention cohort matrix: users cohorted by first-seen ISO week;
    * cell (cohort, offset) counts distinct users from that cohort active
    * `offset` weeks later. Two shuffles — the per-user min and the final
    * distinct-count — both keyed, both partially aggregated map-side;
    * the user⇄cohort join is a fact-to-fact equality join on user_id
    * (at 100 TB: both sides bucketed by user_id, or the first-seen table
    * maintained incrementally as new events arrive).
    */
  def retentionCohorts(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).select(col("user_id"), col("ts"))
    val first = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    ev.join(first, "user_id")
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"),
          date_trunc("week", col("first_ts")).cast("date")) / 7)
          .cast("int").as("week_offset"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("active_users"))
  }

  /** Cohort lifetime-value (LTV) curve — the revenue companion to
    * [[retentionCohorts]]' activity counts: per signup-week cohort and
    * week offset, the CUMULATIVE value per cohort member. Answers "how
    * much is a week-N-old user worth so far" — the curve every
    * payback-period decision reads. Same week conventions as the
    * retention table (date_trunc week, offset = day-diff // 7).
    *
    * Exactness: event values land on the 1e-6 LONG grid, per-cell sums
    * and the cumulative window are exact LONGs, cohort sizes exact
    * counts — one double division per surfaced cell. Cost: one
    * user-keyed shuffle for first-seen, one (cohort, offset)-keyed
    * partial agg, then a window over the tiny cohort×offset table.
    */
  def cohortLtv(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("user_id"), col("ts"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
    val first = ev.groupBy("user_id").agg(min(col("ts")).as("first_ts"))
    val cells = ev.join(first, "user_id")
      .select(col("user_id"),
        date_trunc("week", col("first_ts")).cast("date").as("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"),
          date_trunc("week", col("first_ts")).cast("date")) / 7)
          .cast("int").as("week_offset"),
        col("v6"))
      .groupBy("cohort_week", "week_offset")
      .agg(sum(col("v6")).as("rev6"))
    val sizes = first
      .groupBy(date_trunc("week", col("first_ts")).cast("date")
        .as("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
    val wcum = Window.partitionBy("cohort_week").orderBy("week_offset")
      .rowsBetween(Window.unboundedPreceding, 0)
    cells.join(sizes, "cohort_week")
      .withColumn("cum6", sum(col("rev6")).over(wcum))
      .select(col("cohort_week"), col("week_offset"), col("n_users"),
        q(col("rev6").cast("double") / lit(1e6), 4).as("week_revenue"),
        q(col("cum6").cast("double") / col("n_users") / lit(1e6), 6)
          .as("ltv_per_user"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Interval-union coverage: treat each event as a half-open interval
    * [ts, ts + value seconds] and merge overlapping/touching intervals
    * per user (the classic overlap-merge: an interval opens a new island
    * iff it starts strictly after the running max end of everything
    * before it). Output per user: interval count, island count, and
    * total covered seconds — the "time actually in state" metric naive
    * `sum(duration)` double-counts whenever intervals overlap.
    *
    * One shuffle on user_id; two window passes over the same partition
    * (running-max-end lag, then island-id cumsum) and one aggregate.
    * Island boundaries depend only on the (ts, event_id)-ordered prefix
    * maxima, so the result is partitioning-independent.
    */
  def intervalUnion(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    val wPrev = w.rowsBetween(Window.unboundedPreceding, -1)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        unix_timestamp(col("ts")).cast("double").as("ep"), col("value"))
      .withColumn("iend", col("ep") + col("value"))
      .withColumn("prev_max", max(col("iend")).over(wPrev))
      .withColumn("new_island",
        when(col("prev_max").isNull || col("ep") > col("prev_max"), 1)
          .otherwise(0))
      .withColumn("island", sum(col("new_island")).over(wRun))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("n_iv"),
        min(col("ep")).as("istart"), max(col("iend")).as("iend"))
      .groupBy("user_id")
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        round(sum(col("iend") - col("istart")), 4).as("covered_sec"))
  }

  /** Per-type z-score outliers: events whose value deviates from the
    * event_type mean by ≥ `cut` population standard deviations. The
    * per-type moments are one partial-aggregated shuffle over a
    * handful of groups, then broadcast back onto the scan — the big
    * side is read once and never shuffled, which is the only shape
    * that survives a 100 TB events table. Moments are rounded to 6 dp
    * before the z computation so the flag threshold compares identical
    * doubles on both engines (raw stddev merge order differs).
    */
  /** Nearest-in-time event join: for each purchase, the click of the
    * same user with the smallest |Δt| within a ±1 h band — the
    * attribution shape where "closest touchpoint" beats "last
    * touchpoint" (that one is the as-of join). Equality key (user) +
    * band predicate bounds the candidate set like every interval join
    * here; the argmin is one `min_by` over a (distance, id) struct, so
    * ties break to the lower click id deterministically. All time math
    * is integer microseconds — exact on both engines. At 100 TB the
    * refinement is the same as `rangeJoinNative`: bucket both sides by
    * time so the band predicate prunes before the user-key shuffle.
    */
  def nearestEvent(s: SparkSession, dir: String,
                   bandSec: Long = 3600): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        // parquet ts reads as TIMESTAMP_NTZ; unix_micros requires an
        // instant, so cast via the session zone (pinned UTC in every
        // entry point) — wall-clock == instant, micro-exact
        unix_micros(col("ts").cast("timestamp")).as("us"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("p_id"), col("us").as("p_us"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"), col("us").as("c_us"))
    val d = abs(col("c_us") - col("p_us"))
    p.join(c, Seq("user_id"))
      .filter(d <= bandSec * 1000000L)
      .groupBy(col("p_id"))
      .agg(min_by(struct(d.as("d"), col("c_id")),
        struct(d.as("d"), col("c_id"))).as("m"))
      .select(col("p_id"), col("m.c_id").as("c_id"), col("m.d").as("dist_us"))
  }

  def zscoreAnomalies(s: SparkSession, dir: String,
                      cut: Double = 2.5): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"), col("value"))
    val stats = ev.groupBy("event_type")
      .agg(round(avg("value"), 6).as("mu"),
        round(stddev_pop(col("value")), 6).as("sigma"))
    ev.join(broadcast(stats), "event_type")
      .withColumn("z", round((col("value") - col("mu")) / col("sigma"), 4))
      .filter(abs(col("z")) >= cut)
      .select("event_id", "event_type", "value", "z")
  }

  /** Top session paths: the `plen`-event-type prefix of every session
    * (same 30-min-gap sessionization as `sessionize`), joined with `>`
    * into a path string, counted, top-k paths. The funnel-discovery
    * complement of `funnelConversion`'s fixed funnel: this one MINES
    * the common paths. Same single exchange on user_id as sessionize;
    * the per-session prefix comes from a bounded `slice` of the
    * sorted event list (struct sort on (ts, event_id) keeps tie order
    * deterministic), and the path count is a second ≤|paths|-key
    * shuffle. Top-k cuts on (count, path) — fully deterministic.
    */
  /** Incremental aggregate maintenance: a standing per-type aggregate
    * (count/sum/min/max) kept current by MERGING a new batch's partial
    * aggregate into the stored state instead of rescanning history —
    * the pattern behind every incrementally-maintained 100 TB rollup.
    * The split point divides events into "state" and "delta"; each
    * side aggregates independently (in production the state side is a
    * stored table, not a scan), then the merge is a re-aggregate over
    * 2×|groups| rows: counts/sums add, min/max fold. The oracle
    * computes the full-table aggregate directly — passing proves the
    * merge is lossless. Sums merge in DECIMAL so the merge order
    * cannot perturb the result.
    */
  def incrementalAgg(s: SparkSession, dir: String,
                     splitDay: Int = 25): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("value"),
        dayofmonth(col("ts")).as("dom"))
    def part(df: DataFrame): DataFrame = df.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,6)")).as("sv"),
        min(col("value")).as("mn"), max(col("value")).as("mx"))
    part(ev.filter(col("dom") < splitDay))
      .unionAll(part(ev.filter(col("dom") >= splitDay)))
      .groupBy("event_type")
      .agg(sum(col("n")).as("n_events"),
        round(sum(col("sv")).cast("double"), 4).as("sum_value"),
        min(col("mn")).as("min_value"), max(col("mx")).as("max_value"))
  }

  def topPaths(s: SparkSession, dir: String, gapMinutes: Int = 30,
               plen: Int = 3, k: Int = 15): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val epoch = unix_timestamp(col("ts"))
    val prev = lag(epoch, 1).over(w)
    val newSession = when(
      prev.isNull || (epoch - prev > gapMinutes * 60L), 1).otherwise(0)
    Tables.events(s, dir)
      .withColumn("new_s", newSession)
      .withColumn("session_seq",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(array_join(
        slice(transform(
          sort_array(collect_list(
            struct(col("ts"), col("event_id"), col("event_type")))),
          e => e.getField("event_type")), 1, plen), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Per-type daily-volume OLS trend: closed-form least-squares slope +
    * intercept of daily event counts against the epoch-day index — the
    * "is this event type growing?" monitor, fit in one pass instead of
    * a solver. All five sufficient statistics (n, Σx, Σy, Σxy, Σx²) are
    * EXACT integer aggregates, so slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and
    * intercept = (ΣyΣx²−ΣxΣxy)/(nΣx²−(Σx)²) are single well-defined
    * double divisions — no accumulation-order float hazard at all; the
    * 6-dp rounding is presentation only. Two partial-agg shuffles
    * (day×type, then type) over keys, never a data movement by row.
    */
  def olsTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
    daily.groupBy("event_type").agg(
        count(lit(1)).as("n_days"),
        sum(col("day")).as("sx"), sum(col("y")).as("sy"),
        sum(col("day") * col("y")).as("sxy"),
        sum(col("day") * col("day")).as("sxx"))
      .select(col("event_type"), col("n_days"),
        round((col("n_days") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n_days") * col("sxx") - col("sx") * col("sx")), 6)
          .as("slope"),
        round((col("sy") * col("sxx") - col("sx") * col("sxy"))
          .cast("double") /
          (col("n_days") * col("sxx") - col("sx") * col("sx")), 6)
          .as("intercept"))
      .orderBy("event_type")
  }

  /** Event-type Markov chain: row-normalized first-order transition
    * matrix from each user's chronological event sequence, then
    * `rounds` power-iteration steps from the uniform vector toward the
    * stationary distribution. Fixed round count and 9-dp rounding of
    * both the transition probabilities and each iterate keep the
    * arithmetic restatable — the DuckDB oracle unrolls the identical
    * updates (same chained matrix-vector products).
    *
    * The transition matrix is |types|² rows — after one windowed pass
    * over events (shuffled on user only) every later step is
    * broadcast-sized regardless of corpus scale; each iteration is a
    * tiny join+agg, `localCheckpoint`ed so plans don't nest.
    */
  def markovStationary(s: SparkSession, dir: String,
                       rounds: Int = 3): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    val tot = trans.groupBy("cur").agg(sum(col("c")).as("tc"))
    val p = trans.join(tot, "cur")
      .select(col("cur"), col("nxt"), round(col("c") / col("tc"), 9).as("p"))
      .localCheckpoint()
    val states = p.select(col("cur").as("st")).distinct()
    var v = states
      .crossJoin(broadcast(states.agg(count(lit(1)).as("_k"))))
      .select(col("st"), round(lit(1.0) / col("_k"), 9).as("vp"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      v = v.join(p, col("st") === col("cur"))
        .groupBy(col("nxt").as("st2"))
        .agg(round(sum(col("vp") * col("p")), 9).as("vp"))
        .select(col("st2").as("st"), col("vp"))
        .localCheckpoint()
    }
    v.select(col("st").as("state"), round(col("vp"), 6).as("prob"))
      .orderBy("state")
  }

  /** Expected hitting time to the `target` state (W546) — the
    * absorbing-chain readout over [[markovStationary]]'s empirical
    * transition matrix: h(target) = 0, h(s) = 1 + Σ_t P(s,t)·h(t),
    * solved by `rounds` steps of value iteration from h₀ = 0 (so the
    * surfaced value is the exact expected number of steps truncated
    * at the horizon — "how many clicks from here to a purchase, within
    * k moves"). The ENTIRE iteration is exact integer arithmetic on
    * the 1e-6 grid (the `salsa_scores` discipline): each round is
    * H'(s) = 10⁶ + (Σ_t c_st·H(t)) div tc_s — one keyed join + one
    * partial-agg'd sum + one integral divide per round, every frame
    * ≤ |types|² rows, bit-identical in both engines (the oracle
    * unrolls the same rounds). Corpus-bound work: one windowed lead +
    * one keyed count, same as every Markov op here.
    */
  def hittingTime(s: SparkSession, dir: String,
                  target: String = "purchase",
                  rounds: Int = 12): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = CacheScope.track(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
      .persist())
    val tc = trans.groupBy("cur").agg(sum(col("c")).as("tc"))
    var h = trans.select(col("cur").as("state")).distinct()
      .select(col("state"), lit(0L).as("h6"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      // c·h6 rides DECIMAL(38): at 100 TB a transition count times a
      // 1e-6-grid value crosses 2^63 (the oracle's HUGEINT twin)
      h = trans.join(h, col("nxt") === col("state"))
        .groupBy("cur")
        .agg(sum(col("c").cast("decimal(38,0)") * col("h6")).as("num"))
        .join(tc, "cur")
        .select(col("cur").as("state"),
          when(col("cur") === lit(target), lit(0L))
            .otherwise(lit(1000000L) +
              Ranks.exactDiv(col("num"),
                col("tc").cast("decimal(38,0)"))).as("h6"))
        .localCheckpoint()
    }
    h.select(col("state"), col("h6"),
        q(col("h6").cast("double") / lit(1e6), 6).as("steps"))
      .orderBy("state")
  }

  /** Communicating classes of the user-behavior Markov chain (W540) —
    * the strongly connected components of [[markovStationary]]'s
    * transition graph, plus the recurrent/transient verdict: a class
    * is CLOSED (recurrent) iff no kept transition leaves it, which is
    * the condition under which the chain's long-run mass can live
    * there at all — the structural sanity check run before trusting
    * any stationary-distribution readout. The graph is the
    * DOMINANT-BEHAVIOR skeleton: each source keeps only its top-2
    * transitions by exact count (next-type tie-break), so the class
    * structure reflects where users mostly go rather than welding
    * everything into one blob through thin back-edges — and the
    * kept/dropped decision is exact-integer, bit-identical in both
    * engines (the fixture yields a closed recurrent core plus a
    * transient singleton, which is the shape the op exists to find).
    * Reachability closes by path DOUBLING (R ← R ∪ R∘R) to a counted
    * fixpoint — ⌈log₂ diameter⌉ ≤ ⌈log₂ |types|⌉ joins, every frame
    * ≤ |types|² rows, the same |types|-bounded contract as every
    * Markov op here; scc(v) = min{u : v→u ∧ u→v}. Corpus-bound work
    * is ONE windowed lead + one keyed count; the closure never sees a
    * corpus-proportional row.
    */
  def markovClasses(s: SparkSession, dir: String,
                    maxDoublings: Int = 12): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    val wSrc = Window.partitionBy("cur")
      .orderBy(col("c").desc, col("nxt"))
    val edges = CacheScope.track(trans
      .withColumn("rn", row_number().over(wSrc))
      .filter(col("rn") <= 2)
      .select(col("cur").as("src"), col("nxt").as("dst"))
      .persist())
    val nodes = edges.select(col("src").as("n"))
      .union(edges.select(col("dst").as("n"))).distinct()
    var reach = nodes.select(col("n").as("src"), col("n").as("dst"))
      .union(edges).distinct().localCheckpoint()
    var n = reach.count()
    var rounds = 0
    var fixed = false
    while (!fixed && rounds < maxDoublings) {
      val next = reach.as("a")
        .join(reach.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
        .union(reach).distinct().localCheckpoint()
      val n2 = next.count()
      fixed = n2 == n
      n = n2; reach = next; rounds += 1
    }
    // doubling covers diameter 2^maxDoublings (default 4096 — far past
    // any |types| seen); a non-fixpoint here means classes would be
    // computed on a PARTIAL closure and silently wrong — fail loudly
    if (!fixed) throw new IllegalStateException(
      s"markovClasses: reachability closure did not converge in " +
        s"$maxDoublings doublings ($n pairs) — raise maxDoublings")
    val mutual = reach.as("f")
      .join(reach.as("b"),
        col("f.src") === col("b.dst") && col("f.dst") === col("b.src"))
      .select(col("f.src").as("node"), col("f.dst").as("peer"))
    val classes = mutual.groupBy("node")
      .agg(min(col("peer")).as("class_id"),
        count(lit(1)).as("class_size"))
    val open = edges
      .join(classes.select(col("node").as("sn"),
        col("class_id").as("scid")), col("src") === col("sn"))
      .join(classes.select(col("node").as("dn"),
        col("class_id").as("dcid")), col("dst") === col("dn"))
      .filter(col("scid") =!= col("dcid"))
      .select(col("scid").as("class_id")).distinct()
      .withColumn("esc", lit(1))
    classes.join(open, Seq("class_id"), "left")
      .select(col("node").as("event_type"), col("class_id"),
        col("class_size"),
        when(col("esc").isNull, lit(1L)).otherwise(lit(0L)).as("closed"))
      .orderBy("event_type")
  }

  /** First-/last-touch conversion attribution: every purchase is
    * attributed to the earliest and latest non-purchase event of the
    * same user inside a `lookbackDays` window strictly before the
    * purchase; output is per-channel credit counts. The two credit
    * assignments are per-conversion argmin/argmax with a total
    * (epoch, event_id) tie-break, so credit is deterministic.
    *
    * The touchpoint join is user-keyed with a banded time predicate —
    * candidates per conversion are one user's recent events, never a
    * cross join — and the per-conversion argmin/argmax run in the same
    * partitioning the join already established (one shuffle total).
    * Final channel rollups are partial-agg over ≤ |channels| keys.
    */
  def attribution(s: SparkSession, dir: String,
                  lookbackDays: Int = 7): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ep"), col("event_id"))
      .persist()
    CacheScope.register(ev) // eager: purchase and touch sides both read it
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ep").as("pep"), col("event_id").as("pid"))
    val tch = ev.filter(col("event_type") =!= "purchase")
    val joined = pur.join(tch, Seq("user_id"))
      .filter(col("ep") < col("pep") &&
        col("ep") >= col("pep") - lit(lookbackDays * 86400L))
    val credited = joined.groupBy("user_id", "pid")
      .agg(
        min(struct(col("ep"), col("event_id"), col("event_type")))
          .getField("event_type").as("first_ch"),
        max(struct(col("ep"), col("event_id"), col("event_type")))
          .getField("event_type").as("last_ch"))
    val ft = credited.groupBy(col("first_ch").as("channel"))
      .agg(count(lit(1)).as("first_touch"))
    val lt = credited.groupBy(col("last_ch").as("channel"))
      .agg(count(lit(1)).as("last_touch"))
    ft.join(lt, Seq("channel"), "full_outer")
      .select(col("channel"),
        coalesce(col("first_touch"), lit(0L)).as("first_touch"),
        coalesce(col("last_touch"), lit(0L)).as("last_touch"))
      .orderBy("channel")
  }

  /** floor(x·10^d + 0.5)/10^d — cross-engine-deterministic quantization:
    * multiply/add/floor/divide are IEEE-exact-rounded (unlike double
    * round(), whose half-way behavior is implementation-defined), and
    * floor never emits -0.0, so surfaced doubles are canonical bytes.
    */
  private[operators] def q(c: org.apache.spark.sql.Column, d: Int) = {
    val p = math.pow(10, d)
    floor(c * lit(p) + lit(0.5)) / lit(p)
  }

  /** Autocorrelation of the daily total-event-count series at lags
    * 1..`maxLag` — the seasonality probe run before fitting any
    * forecast. The day spine is densified (missing days count 0) so
    * lags align calendar days, then each lag is a Pearson correlation
    * over (count[t], count[t+lag]) pairs from one self-join on
    * day+lag. All sufficient statistics are EXACT integer sums
    * (counts are ints); only the final correlation arithmetic is
    * double, identical on both engines. The series is one row per
    * day — tiny at any corpus scale (the heavy part is the first
    * groupBy, a standard partial-agg count) — so the lag self-join
    * never grows past days×maxLag rows.
    */
  def acfDaily(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // eager: spine bounds + both join sides
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val lags = s.range(1, maxLag + 1).select(col("id").cast("int").as("lag"))
    val pairs = daily.crossJoin(broadcast(lags))
      .select(col("lag"), (col("day") + col("lag")).as("day"),
        col("y").as("x"))
      .join(daily.select(col("day"), col("y")), Seq("day"))
    val st = pairs.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val num = n * col("sxy") - col("sx") * col("sy")
    val den = sqrt(n * col("sxx") - col("sx") * col("sx")) *
      sqrt(n * col("syy") - col("sy") * col("sy"))
    st.select(col("lag"), col("n").as("n_pairs"),
        q(num / den, 6).as("acf"))
      .orderBy("lag")
  }

  /** Hour-of-day seasonal profile per event type: each (type, hour)'s
    * share of the type's total events — the load-shape fingerprint
    * behind capacity planning and bot detection (humans have diurnal
    * shape, scrapers don't). Two keyed aggregations; the share divides
    * two exact counts, so the only double op is one division. Missing
    * hours surface as explicit zero rows (the dense 24-row profile a
    * downstream model expects), via one broadcast hour spine.
    */
  def seasonalHourly(s: SparkSession, dir: String): DataFrame = {
    val byHour = Tables.events(s, dir)
      .select(col("event_type"), hour(col("ts")).as("hr"))
      .groupBy("event_type", "hr").agg(count(lit(1)).as("n"))
      .persist()
    CacheScope.register(byHour) // eager: totals + spine join read it
    val totals = byHour.groupBy("event_type").agg(sum("n").as("tot"))
    val spine = totals.crossJoin(
      broadcast(s.range(0, 24).select(col("id").cast("int").as("hr"))))
    spine.join(byHour, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"),
        coalesce(col("n"), lit(0L)).as("n"),
        q(coalesce(col("n"), lit(0L)).cast("double") / col("tot"), 6)
          .as("share"))
  }

  /** Mutual information between event type and hour-of-day (nats):
    * Σ p(t,h)·ln(p(t,h)/(p(t)·p(h))) — "how much does the clock tell
    * you about what users do", the dependence screen run across
    * feature pairs before modeling. All probabilities are exact
    * integer-count ratios; ln() is the one libm call, and the PMI
    * terms are quantized to 6 dp BEFORE the final sum (the project's
    * round-before-decision rule: both engines sum identical quantized
    * doubles, in exact arithmetic after scaling by 1e6).
    */
  def mutualInformation(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("t"), hour(col("ts")).as("h"))
      .persist()
    CacheScope.register(ev) // eager: three marginals read it
    val joint = ev.groupBy("t", "h").agg(count(lit(1)).as("njh"))
    val mt = ev.groupBy("t").agg(count(lit(1)).as("nt"))
    val mh = ev.groupBy("h").agg(count(lit(1)).as("nh"))
    val tot = ev.count()
    // per-cell PMI contribution, quantized to an exact 1e-6 grid, then
    // summed as scaled integers — the sum order cannot perturb bits
    joint.join(broadcast(mt), "t").join(broadcast(mh), "h")
      .select(((col("njh").cast("double") / lit(tot.toDouble)) *
        log((col("njh").cast("double") * lit(tot.toDouble)) /
          (col("nt").cast("double") * col("nh").cast("double"))))
        .as("term"))
      .select(floor(col("term") * lit(1e6) + lit(0.5)).cast("long").as("ti"))
      .agg((sum(col("ti")).cast("double") / lit(1e6)).as("mi_nats"),
        count(lit(1)).as("n_cells"))
  }

  /** Schema/data drift report between two halves of the event stream
    * (split at the median day): per event type, row share, null rate
    * of `value`, and its mean — the distribution-shift check run when
    * a pipeline's upstream changes. One pass per slice (a single
    * groupBy with conditional aggregates — the slice flag is a
    * column, so no second scan), means from exact integer-quantized
    * sums (1e-6 grid), and the DRIFT columns are plain differences of
    * the two slices' metrics.
    */
  def schemaDrift(s: SparkSession, dir: String): DataFrame = {
    val ev0 = Tables.events(s, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        col("value"))
      .persist()
    CacheScope.register(ev0) // eager: median probe + the agg read it
    // median day from an exact count: day d0 such that half the rows
    // are at or before it (deterministic, order-insensitive)
    val half = ev0.count() / 2
    val cutRow = ev0.groupBy("day").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") >= half)
      .orderBy("day").limit(1).select("day")
    val ev = ev0.crossJoin(broadcast(cutRow.withColumnRenamed("day", "cut")))
      .select(col("event_type"),
        when(col("day") <= col("cut"), lit("a")).otherwise(lit("b"))
          .as("slice"),
        col("value"))
    def cnt(sl: String) = sum(when(col("slice") === sl, 1L).otherwise(0L))
    def nulls(sl: String) = sum(when(col("slice") === sl &&
      col("value").isNull, 1L).otherwise(0L))
    def vsum(sl: String) = sum(when(col("slice") === sl,
      floor(col("value") * lit(1e6) + lit(0.5)).cast("long")).otherwise(0L))
    ev.groupBy("event_type").agg(
        cnt("a").as("n_a"), cnt("b").as("n_b"),
        nulls("a").as("null_a"), nulls("b").as("null_b"),
        vsum("a").as("vs_a"), vsum("b").as("vs_b"))
      .select(col("event_type"), col("n_a"), col("n_b"),
        q(col("null_a").cast("double") / col("n_a"), 6).as("null_rate_a"),
        q(col("null_b").cast("double") / col("n_b"), 6).as("null_rate_b"),
        // nullif: an all-null slice yields mean NULL, not a double /0
        // → Infinity → ANSI overflow inside the floor quantizer
        q(col("vs_a").cast("double") / lit(1e6) /
          nullif(col("n_a") - col("null_a"), lit(0L)), 6).as("mean_a"),
        q(col("vs_b").cast("double") / lit(1e6) /
          nullif(col("n_b") - col("null_b"), lit(0L)), 6).as("mean_b"))
      .orderBy("event_type")
  }

  /** 7-day rolling MEDIAN of the daily event count — the robust
    * smoother ops dashboards use where a mean window is whale-skewed.
    * Spark has no windowed percentile, so the trailing frame
    * materializes as `collect_list` + `array_sort` + exact middle
    * (lower-median for even frames) — fine because the window rides
    * the one-row-per-DAY series, never raw events (the heavy lifting
    * is the first groupBy's partial count). Counts are integers, so
    * the median is exact — no float surface at all.
    */
  def rollingMedianDaily(s: SparkSession, dir: String,
                         window: Int = 7): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // eager: bounds + spine join read it
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val w = Window.orderBy("day").rowsBetween(-(window - 1), 0)
    daily
      .withColumn("fr", array_sort(collect_list(col("y")).over(w)))
      .select(col("day"), col("y").as("n_events"),
        element_at(col("fr"),
          ((size(col("fr")) + 1) / 2).cast("int")).as("rolling_median"))
  }

  /** "Eventually-follows" pairs (process mining's successor relation,
    * not just ADJACENT transitions like `eventTransitions`): for each
    * ordered type pair (a, b), how many users ever do `a` and then —
    * any time later — `b`. Per user the relation depends only on each
    * type's FIRST and LAST occurrence (a→b holds iff first(a) <
    * last(b)), so the per-user state collapses to 2·|types| epochs
    * before any pair is formed: the |types|²-safe rewrite of the
    * naive event×event self-join, which at 100 TB would square each
    * user's history. Ties (same timestamp) resolve by event_id, the
    * total order used everywhere here.
    */
  def eventuallyFollows(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("us"),
        col("event_id"))
    // lexicographic (us, event_id) min/max per (user, type): struct
    // ordering gives the total-order endpoints without packing both
    // into one scalar (which would overflow a long)
    val spans = ev.groupBy("user_id", "event_type")
      .agg(min(struct(col("us"), col("event_id"))).as("f"),
        max(struct(col("us"), col("event_id"))).as("l"))
    val before = col("f.us") < col("l_us") ||
      (col("f.us") === col("l_us") && col("f.event_id") < col("l_id"))
    spans.select(col("user_id"), col("event_type").as("a"), col("f"))
      .join(spans.select(col("user_id"), col("event_type").as("b"),
        col("l.us").as("l_us"), col("l.event_id").as("l_id")),
        Seq("user_id"))
      .filter(col("a") =!= col("b") && before)
      .groupBy("a", "b").agg(count(lit(1)).as("n_users"))
      .orderBy(col("a"), col("b"))
  }

  /** Daily bounce rate: share of sessions with exactly one event —
    * the engagement-quality metric every funnel report leads with.
    * Rides the [[sessionize]] output (one row per session); the day
    * key is the session's START day, exact integer counts, one
    * quantized division per day.
    */
  def bounceRate(s: SparkSession, dir: String,
                 gapMinutes: Int = 30): DataFrame = {
    sessionize(s, dir, gapMinutes)
      .select(floor(col("start_epoch") / lit(86400L)).as("day"),
        when(col("n_events") === 1, 1L).otherwise(0L).as("b"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_sessions"), sum("b").as("n_bounces"))
      .select(col("day"), col("n_sessions"), col("n_bounces"),
        q(col("n_bounces").cast("double") / col("n_sessions"), 6)
          .as("bounce_rate"))
      .orderBy("day")
  }

  /** MAD-based volume anomalies: flag (type, day) cells whose daily
    * count sits more than `cut`·MAD from the type's median — the
    * robust twin of [[zscoreAnomalies]] (a single whale day inflates
    * a stddev and masks itself; the median absolute deviation
    * doesn't). Counts are integers, medians of integers are exact
    * halves at worst, so every comparison is over engine-identical
    * doubles; the flag threshold compares quantized values (the
    * round-before-decision rule).
    */
  def madAnomalies(s: SparkSession, dir: String,
                   cut: Double = 3.0): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily) // eager: median, MAD and the flag scan
    val med = daily.groupBy("event_type")
      .agg(percentile(col("y"), lit(0.5)).as("med"))
    val mad = daily.join(broadcast(med), "event_type")
      .groupBy("event_type")
      .agg(percentile(abs(col("y") - col("med")), lit(0.5)).as("mad"),
        first(col("med")).as("med"))
    daily.join(broadcast(mad), "event_type")
      .select(col("event_type"), col("day"), col("y"),
        q((col("y") - col("med")) / nullif(col("mad"), lit(0.0)), 4)
          .as("mad_score"))
      .filter(abs(col("mad_score")) > cut)
      .orderBy("event_type", "day")
  }

  /** Population stability index of `value` per event type between the
    * two time halves (split at the same median day as [[schemaDrift]]):
    * PSI = Σ (p_a − p_b)·ln(p_a/p_b) over slice-A decile buckets —
    * THE drift score ML monitoring dashboards alarm on (0.1 = noted,
    * 0.25 = shifted). Bucket edges are slice-A's 9 inner deciles (one
    * tiny array per type, broadcast); both slices then bucket on one
    * scan (`size(filter(edges, e -> v > e))` — a codegen'd projection,
    * no per-bucket pass). Proportions floor at 1e-6 (the standard PSI
    * guard against empty buckets); each term quantizes to the 1e-6
    * grid before the exact scaled-integer sum, engine-identical.
    */
  def psiDrift(s: SparkSession, dir: String): DataFrame = {
    val ev0 = Tables.events(s, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        col("value"))
      .filter(col("value").isNotNull)
      .persist()
    CacheScope.register(ev0) // eager: cut probe, edges and both scans
    val half = ev0.count() / 2
    val cutRow = ev0.groupBy("day").agg(count(lit(1)).as("n"))
      .withColumn("cum", sum("n").over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .filter(col("cum") >= half)
      .orderBy("day").limit(1).select(col("day").as("cut"))
    val ev = ev0.crossJoin(broadcast(cutRow))
      .select(col("event_type"),
        when(col("day") <= col("cut"), lit("a")).otherwise(lit("b"))
          .as("slice"),
        col("value"))
      .persist()
    CacheScope.register(ev) // eager: edge fit + bucket counts read it
    val edges = ev.filter(col("slice") === "a")
      .groupBy("event_type")
      .agg(percentile(col("value"),
        array((1 to 9).map(i => lit(i / 10.0)): _*)).as("edges"))
    val bucketed = ev.join(broadcast(edges), "event_type")
      .select(col("event_type"), col("slice"),
        size(filter(col("edges"), e => col("value") > e)).as("bucket"))
      .groupBy("event_type", "bucket")
      .agg(sum(when(col("slice") === "a", 1L).otherwise(0L)).as("na"),
        sum(when(col("slice") === "b", 1L).otherwise(0L)).as("nb"))
    val tot = bucketed.groupBy("event_type")
      .agg(sum("na").as("ta"), sum("nb").as("tb"))
    val pa = greatest(col("na").cast("double") / col("ta"), lit(1e-6))
    val pb = greatest(col("nb").cast("double") / col("tb"), lit(1e-6))
    bucketed.join(broadcast(tot), "event_type")
      .select(col("event_type"),
        floor((pa - pb) * log(pa / pb) * lit(1e6) + lit(0.5))
          .cast("long").as("ti"))
      .groupBy("event_type")
      .agg((sum("ti").cast("double") / lit(1e6)).as("psi"),
        count(lit(1)).as("n_buckets"))
      .orderBy("event_type")
  }

  /** Behavioral diversity per session: Shannon entropy (nats) of each
    * session's event-type distribution, averaged by session-length
    * band — "do longer sessions explore or repeat", the engagement-
    * depth profile. Sessions come from the same gap rule as
    * [[sessionize]]; each session's entropy is computed from ITS OWN
    * integer counts (deterministic per session), quantized to the
    * 1e-6 grid, then averaged as exact scaled-integer sums per band —
    * partition merge order can't move a bit.
    */
  def sessionEntropy(s: SparkSession, dir: String,
                     gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val epoch = unix_timestamp(col("ts"))
    val prev = lag(epoch, 1).over(w)
    val newSession = when(
      prev.isNull || (epoch - prev > gapMinutes * 60L), 1).otherwise(0)
    val byType = Tables.events(s, dir)
      .withColumn("new_s", newSession)
      .withColumn("session_seq",
        sum(col("new_s")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_seq", "event_type")
      .agg(count(lit(1)).as("c"))
    val perSession = byType
      // H = ln(n) − Σ c·ln(c)/n. Each c·ln(c) term quantizes to the
      // 1e-9 integer grid BEFORE the per-session sum — float sums over
      // an aggregation group follow engine-private row order, so only
      // integer accumulation is bit-stable across engines
      .select(col("user_id"), col("session_seq"), col("c"),
        floor(col("c").cast("double") * log(col("c")) * lit(1e9)
          + lit(0.5)).cast("long").as("ti"))
      .groupBy("user_id", "session_seq")
      .agg(sum("c").as("n"), sum("ti").as("sti"))
      .select(
        least(col("n"), lit(5L)).as("len_band"),
        floor((log(col("n")) -
          col("sti").cast("double") / lit(1e9) / col("n")) * lit(1e6)
          + lit(0.5)).cast("long").as("hi"))
    perSession.groupBy("len_band")
      .agg(count(lit(1)).as("n_sessions"),
        ((sum("hi").cast("double") / count(lit(1))) / lit(1e6))
          .as("avg_entropy"))
      .orderBy("len_band")
  }

  /** Inter-session gap distribution: per user, the idle time between a
    * session's END and the NEXT session's start (the downtime the gap
    * rule already split on), summarized as per-user-count-weighted
    * percentiles — "how long do users stay away", the retention
    * signal between sessionization and cohort analysis. One window
    * over the session table (one row per session, tiny), exact
    * integer seconds.
    */
  def intersessionGaps(s: SparkSession, dir: String,
                       gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("session_seq")
    val sess = sessionize(s, dir, gapMinutes)
      .select(col("user_id"), col("session_seq"),
        col("start_epoch"), col("end_epoch"))
    sess
      .withColumn("next_start", lead(col("start_epoch"), 1).over(w))
      .filter(col("next_start").isNotNull)
      .select((col("next_start") - col("end_epoch")).as("gap_sec"))
      .agg(count(lit(1)).as("n_gaps"),
        min("gap_sec").as("min_gap"),
        // floor(x+0.5), not cast: the two engines interpolate with
        // different formulas (a+f·(b−a) vs a·(1−f)+b·f), so the value
        // can straddle an integer by one ulp — truncation flips there,
        // round-to-nearest doesn't (achievable fractions are k/5)
        floor(percentile(col("gap_sec"), lit(0.5)) + lit(0.5))
          .cast("long").as("p50_gap"),
        floor(percentile(col("gap_sec"), lit(0.9)) + lit(0.5))
          .cast("long").as("p90_gap"),
        max("gap_sec").as("max_gap"))
  }

  /** Per-user activity feature vector: recency (days since last
    * event), frequency (events, active days), monetary (summed
    * value), tenure, and mean inter-event gap — the standard churn-
    * model feature block, computed in ONE partial-aggregated pass
    * over the events table (no window, no join; every feature is an
    * algebraic aggregate). Top-`k` by event count keeps the surfaced
    * result bounded; the full frame is what a trainer would consume.
    */
  def userActivityFeatures(s: SparkSession, dir: String,
                           k: Int = 100): DataFrame = {
    val ep = unix_timestamp(col("ts"))
    val ev = Tables.events(s, dir)
      .select(col("user_id"), ep.as("ep"),
        floor(ep / lit(86400L)).as("day"), col("value"))
      .persist()
    CacheScope.register(ev) // eager: global max + per-user agg read it
    val endEpoch = ev.agg(max("ep")).head().getLong(0)
    ev.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("day")).as("active_days"),
        min("ep").as("first_ep"), max("ep").as("last_ep"),
        sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
          .as("vs"))
      .select(col("user_id"), col("n_events"), col("active_days"),
        ((lit(endEpoch) - col("last_ep")) / lit(86400L)).cast("long")
          .as("recency_days"),
        ((col("last_ep") - col("first_ep")) / lit(86400L)).cast("long")
          .as("tenure_days"),
        (floor(col("vs").cast("double") / lit(1e6) / col("n_events")
          * lit(1e4) + lit(0.5)) / lit(1e4)).as("avg_value"),
        when(col("n_events") > 1,
          (col("last_ep") - col("first_ep")) / (col("n_events") - 1))
          .cast("long").as("avg_gap_sec"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(k)
  }

  /** Benford first-digit screen over `value`: observed leading-digit
    * share vs Benford's log10(1+1/d) expectation plus the χ²
    * statistic — the quick forgery/synthetic-data tell (organic
    * heavy-tailed amounts follow it; fabricated ones rarely do).
    * First digit extraction is string-free integer math on the
    * absolute value scaled to [1, 10); every surfaced double is
    * quantized from exact counts.
    */
  def benfordDigits(s: SparkSession, dir: String): DataFrame = {
    // leading digit = first nonzero digit of the shortest decimal
    // repr — invariant under plain-vs-scientific formatting and free
    // of the log10/pow ulp hazard at digit boundaries (both engines
    // print the same shortest round-trip string for the same double)
    val v = abs(col("value"))
    val lead = regexp_extract(v.cast("string"), "[1-9]", 0).cast("int")
    val counts = Tables.events(s, dir)
      .filter(col("value").isNotNull && col("value") =!= 0.0)
      .select(lead.as("digit"))
      .filter(col("digit").between(1, 9))
      .groupBy("digit").agg(count(lit(1)).as("n"))
      .persist()
    CacheScope.register(counts) // eager: total + the per-digit scan
    val tot = counts.agg(sum("n")).head().getLong(0)
    // ln(x)/ln(10), NOT a native log10: both engines then evaluate the
    // identical IEEE expression tree (a correctly-rounded log10 on one
    // side would differ in the last ulp)
    val expected = log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))
    counts
      .select(col("digit"), col("n"),
        (floor(col("n").cast("double") / lit(tot.toDouble) * lit(1e6)
          + lit(0.5)) / lit(1e6)).as("observed"),
        (floor(expected * lit(1e6) + lit(0.5)) / lit(1e6)).as("benford"),
        (floor(pow(col("n").cast("double") - expected * lit(tot.toDouble), 2)
          / (expected * lit(tot.toDouble)) * lit(1e4) + lit(0.5)) / lit(1e4))
          .as("chi2_term"))
      .orderBy("digit")
  }

  /** k-anonymity audit over the quasi-identifier (event_type,
    * hour-of-day, value decile): how many equivalence classes exist,
    * how many hold fewer than `k` users, and the re-identification
    * headline — the share of distinct USERS sitting in at least one
    * violating class (a user in several violating classes counts
    * once), over all distinct users. The release-gate check run before
    * sharing "anonymized" event data. One pass to classes
    * (partial-agg'd), a broadcast semi-join of the classed rows
    * against the (tiny) violating-class list for the user count, and
    * a tiny aggregate over the class table; value deciles come from
    * global exact percentiles so the bucketing is restatable.
    */
  def kAnonymity(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), hour(col("ts")).as("hr"),
        col("value"), col("user_id"))
      .persist()
    CacheScope.register(ev) // eager: edge fit + class scan read it
    val edges = ev.agg(percentile(col("value"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("edges"))
    val classed = ev.crossJoin(broadcast(edges))
      .select(col("event_type"), col("hr"),
        size(filter(col("edges"), e => col("value") > e)).as("vb"),
        col("user_id"))
      .persist()
    CacheScope.register(classed) // eager: class table + risk scan
    val classes = classed
      .groupBy("event_type", "hr", "vb")
      .agg(countDistinct(col("user_id")).as("n_users"))
      .persist()
    CacheScope.register(classes) // eager: stats agg + violating filter
    // the TRUE user share: a user sitting in several violating classes
    // counts once — distinct users semi-joined against the (tiny,
    // broadcast) violating-class list over distinct users overall
    val violating = classes.filter(col("n_users") < k)
      .select(col("event_type"), col("hr"), col("vb"))
    val risk = classed.join(broadcast(violating),
        Seq("event_type", "hr", "vb"), "left_semi")
      .agg(countDistinct(col("user_id")).as("users_at_risk"))
    val tot = ev.agg(countDistinct(col("user_id")).as("total_users"))
    classes.agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("n_users") < k, 1L).otherwise(0L))
          .as("violating_classes"),
        min("n_users").as("min_class_users"))
      .crossJoin(risk).crossJoin(tot)
      .select(col("n_classes"), col("violating_classes"),
        col("min_class_users"),
        q(col("users_at_risk").cast("double") / col("total_users"), 6)
          .as("at_risk_share"))
  }

  /** l-diversity audit (W244), the companion to [[kAnonymity]]:
    * k-anonymity only counts SUBJECTS per quasi-identifier class — a
    * class can hold 50 users who all share one sensitive value, and an
    * attacker who places a user in it learns that value exactly.
    * Here the quasi-identifiers are (event_type, hour), the sensitive
    * attribute is the value decile (the SAME exact-percentile
    * bucketing the k-audit uses), and each class reports its distinct
    * sensitive-value count l, with the summary row counting classes
    * below `l` and the share of users sitting in them. All counts are
    * exact integers; the only double is the one share division. Same
    * plan skeleton as the k-audit: one scan, a broadcast 9-edge
    * bucketer, class-keyed aggregates.
    */
  def lDiversity(s: SparkSession, dir: String, l: Int = 3): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), hour(col("ts")).as("hr"),
        col("value"), col("user_id"))
      .persist()
    CacheScope.register(ev) // eager: edge fit + class scan read it
    val edges = ev.agg(percentile(col("value"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("edges"))
    val classed = ev.crossJoin(broadcast(edges))
      .select(col("event_type"), col("hr"),
        size(filter(col("edges"), e => col("value") > e)).as("vb"),
        col("user_id"))
      .persist()
    CacheScope.register(classed) // eager: class agg + risk scan
    val classes = classed
      .groupBy("event_type", "hr")
      .agg(count_distinct(col("vb")).as("l_div"),
        count_distinct(col("user_id")).as("n_users"))
      .persist()
    CacheScope.register(classes)
    val weak = classes.filter(col("l_div") < l)
      .select(col("event_type"), col("hr"))
    val risk = classed.join(broadcast(weak),
        Seq("event_type", "hr"), "left_semi")
      .agg(count_distinct(col("user_id")).as("users_at_risk"))
    val tot = ev.agg(count_distinct(col("user_id")).as("total_users"))
    classes.agg(count(lit(1)).as("n_classes"),
        sum(when(col("l_div") < l, 1L).otherwise(0L)).as("weak_classes"),
        min(col("l_div")).as("min_l"))
      .crossJoin(risk).crossJoin(tot)
      .select(col("n_classes"), col("weak_classes"), col("min_l"),
        q(col("users_at_risk").cast("double") / col("total_users"), 6)
          .as("at_risk_share"))
  }

  /** t-closeness audit (W266), the third privacy gate after
    * [[kAnonymity]] and [[lDiversity]]: l-diversity only counts
    * distinct sensitive values — a class whose value-decile histogram
    * is wildly skewed vs the corpus still leaks (an attacker learns
    * the deviation). For the ordered decile attribute the
    * earth-mover's distance collapses to the mean absolute gap of the
    * cumulative histograms: EMD = (1/(m−1))·Σᵢ|Pᵢ−Qᵢ|. Every cumulative
    * count is an exact integer and each |Pᵢ−Qᵢ| is cross-multiplied
    * (|cumᶜ·n − cumᵍ·n_c| over DECIMAL(38) — LONG would overflow the
    * product past ~3·10⁹ rows), so "class violates t=0.2" is the
    * integer test 5·emd_num > 9·n_c·n. One scan to the class×decile
    * grid (dense via an exploded 10-bucket spine so empty cells carry
    * zeros), a 10-row-per-class cumsum window, then class-bounded
    * arithmetic; at 100 TB the only corpus-bound stage is the first
    * groupBy — everything after is O(classes·deciles).
    */
  def tCloseness(s: SparkSession, dir: String): DataFrame = {
    val m = 10
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), hour(col("ts")).as("hr"),
        col("value"), col("user_id"))
      .persist()
    CacheScope.register(ev) // eager: edge fit + class scan read it
    val edges = ev.agg(percentile(col("value"),
      array((1 to 9).map(i => lit(i / 10.0)): _*)).as("edges"))
    val classed = ev.crossJoin(broadcast(edges))
      .select(col("event_type"), col("hr"),
        size(filter(col("edges"), e => col("value") > e)).as("vb"),
        col("user_id"))
      .persist()
    CacheScope.register(classed) // eager: cell counts + risk scan
    val cells = classed.groupBy("event_type", "hr", "vb")
      .agg(count(lit(1)).as("c"))
    // dense 10-bucket spine per class: cumulative histograms need the
    // empty cells, and the spine is O(classes) — broadcast-sized
    val spine = cells.select("event_type", "hr").distinct()
      .select(col("event_type"), col("hr"),
        explode(sequence(lit(0), lit(m - 1))).as("vb"))
    val dense = spine.join(cells, Seq("event_type", "hr", "vb"), "left")
      .na.fill(0L, Seq("c"))
    val wc = Window.partitionBy("event_type", "hr").orderBy("vb")
    val cum = dense.select(col("event_type"), col("hr"), col("vb"),
      sum(col("c")).over(wc).as("cum_c"),
      sum(col("c")).over(Window.partitionBy("event_type", "hr"))
        .as("n_c"))
    val wg = Window.orderBy("vb")
    val gcum = dense.groupBy("vb").agg(sum(col("c")).as("gc"))
      .select(col("vb"), sum(col("gc")).over(wg).as("cum_g"),
        sum(col("gc")).over().as("n_g"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val perClass = cum.join(broadcast(gcum), "vb")
      .filter(col("vb") < m - 1) // the last cumulative gap is always 0
      .groupBy("event_type", "hr")
      .agg(sum(abs(dec(col("cum_c")) * dec(col("n_g"))
          - dec(col("cum_g")) * dec(col("n_c")))).as("emd_num"),
        max(dec(col("n_c")) * dec(col("n_g"))).as("cd"))
      .select(col("event_type"), col("hr"),
        q(col("emd_num").cast("double")
            / (col("cd") * lit(m - 1)).cast("double"), 6).as("t"),
        (col("emd_num") * lit(5) > col("cd") * lit(m - 1))
          .as("viol"))
      .persist()
    CacheScope.register(perClass) // eager: summary agg + risk list
    val violating = perClass.filter(col("viol"))
      .select(col("event_type"), col("hr"))
    val risk = classed.join(broadcast(violating),
        Seq("event_type", "hr"), "left_semi")
      .agg(count_distinct(col("user_id")).as("users_at_risk"))
    val tot = ev.agg(count_distinct(col("user_id")).as("total_users"))
    perClass.agg(count(lit(1)).as("n_classes"),
        sum(when(col("viol"), 1L).otherwise(0L)).as("violating_classes"),
        max(col("t")).as("max_t"))
      .crossJoin(risk).crossJoin(tot)
      .select(col("n_classes"), col("violating_classes"), col("max_t"),
        q(col("users_at_risk").cast("double") / col("total_users"), 6)
          .as("at_risk_share"))
  }

  /** Welch two-sample t-test between event types' value distributions
    * (W240): the unequal-variance t statistic and Welch–Satterthwaite
    * df for every type pair — the A/B-testing significance screen the
    * categorical `chi_square` can't give for a continuous metric.
    * Determinism recipe: values land on a 1e-6 integer grid per row,
    * and ALL sufficient statistics (Σv, Σv²) are exact DECIMAL(38)
    * sums (order-free; a double Σv² would lose associativity and a
    * BIGINT one overflows past ~10⁶ rows at this grid) — the t/df
    * arithmetic is then one fixed double expression tree over
    * identical exact integers on both engines. One scan, |types| rows
    * of state, a trivially-broadcast pair join.
    */
  def welchTtest(s: SparkSession, dir: String): DataFrame = {
    val stats = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("vi").cast("decimal(38,0)")).as("sv"),
        sum((col("vi") * col("vi")).cast("decimal(38,0)")).as("sv2"))
      .localCheckpoint() // both sides of the pair join read it
    def side(sfx: String) = stats.select(
      col("event_type").as(s"type_$sfx"), col("n").as(s"n_$sfx"),
      col("sv").cast("double").as(s"sv_$sfx"),
      col("sv2").cast("double").as(s"sv2_$sfx"))
    def mean(sfx: String) =
      col(s"sv_$sfx") / col(s"n_$sfx") / lit(1e6)
    def vari(sfx: String) =
      (col(s"sv2_$sfx") - col(s"sv_$sfx") * col(s"sv_$sfx") /
        col(s"n_$sfx")) / (col(s"n_$sfx") - 1) / lit(1e12)
    def se2part(sfx: String) = vari(sfx) / col(s"n_$sfx")
    val se2 = se2part("a") + se2part("b")
    val dfW = se2 * se2 /
      (se2part("a") * se2part("a") / (col("n_a") - 1) +
        se2part("b") * se2part("b") / (col("n_b") - 1))
    side("a").join(side("b"), col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        col("n_a"), col("n_b"),
        q(mean("a"), 6).as("mean_a"), q(mean("b"), 6).as("mean_b"),
        when(se2 > 0, q((mean("a") - mean("b")) / sqrt(se2), 6))
          .as("t_stat"),
        when(se2 > 0, q(dfW, 4)).as("df"))
      .orderBy("type_a", "type_b")
  }

  /** STL-style decomposition of the daily event series (W238):
    * total = trend + seasonal + residual, with trend a centered 7-day
    * moving mean (edge frames shrink — rows, not range, so frames are
    * tie-free on the dense spine), the seasonal component the mean
    * DETRENDED value per day-of-week, and the residual what's left —
    * the anomaly-detection input that [[madAnomalies]]' raw-count
    * screen lacks (a Monday spike is seasonal there, anomalous here
    * only if it beats the Monday pattern). Numerics: the spine is
    * integer epoch-days, day-of-week is day mod 7 (no engine DOW
    * convention), and every component lives on the 1e-6 LONG grid —
    * trend quantizes an exact int-ratio, detrended values are then
    * exact longs whose per-weekday mean sums order-free — so both
    * engines decompose bit-identically. One count aggregate over raw
    * events; the decomposition itself is O(days) rows (windowed as one
    * series here; a per-series partition key at scale).
    */
  def stlDecompose(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // eager: spine bounds + the left join
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val wT = Window.orderBy("day").rowsBetween(-3, 3)
    val det = daily
      .select(col("day"), col("y"),
        floor(sum(col("y")).over(wT).cast("double") /
          count(lit(1)).over(wT) * lit(1e6) + lit(0.5)).cast("long")
          .as("trend_i"))
      .select(col("day"), col("y"), col("trend_i"),
        (col("y") * lit(1000000L) - col("trend_i")).as("det_i"),
        pmod(col("day"), lit(7L)).as("dow"))
    val seas = det.groupBy("dow")
      .agg(floor(sum(col("det_i")).cast("double") / count(lit(1)) +
        lit(0.5)).cast("long").as("seas_i"))
    det.join(broadcast(seas), "dow")
      .select(col("day"), col("y").as("total"),
        (col("trend_i").cast("double") / lit(1e6)).as("trend"),
        (col("seas_i").cast("double") / lit(1e6)).as("seasonal"),
        ((col("det_i") - col("seas_i")).cast("double") / lit(1e6))
          .as("residual"))
      .orderBy("day")
  }

  /** Markov removal-effect attribution (W236) — the data-driven
    * multi-touch model (Anderl et al. 2014): sessions become paths
    * start → channel… → {conv, null} (truncated at the first purchase,
    * which absorbs as `conv`; sessions without one absorb as `null`),
    * a first-order transition matrix is estimated from path counts,
    * and each channel's credit is its REMOVAL EFFECT — how much the
    * start→conv absorption probability drops when that channel's state
    * is deleted from the chain. Strictly more informative than
    * first/last-touch ([[attribution]]): a channel that only ever
    * forwards traffic into converting states still earns credit.
    *
    * Numerics: the absorption fixed point runs a FIXED `rounds` value
    * iterations (the chain contract, like PPR's 8) with probabilities
    * held on a 1e-12 LONG grid — each round's contribution
    * floor-quantizes the (9-dp transition) × (grid value) product to
    * an integer before a per-state LONG sum, so no float accumulation
    * order exists anywhere and both engines land bit-identical.
    * Removal is implemented as "the removed state's value is pinned to
    * 0" (transitions into it contribute nothing) — the exact algebraic
    * equivalent of deleting the state, with no second matrix build.
    *
    * Scale: path extraction is the sessionize window (one user-keyed
    * shuffle over raw events); everything after — the transition
    * matrix, the spine, all `channels + 1` chains — lives on
    * O(|channels|²) rows iterated jointly in one keyed frame, so chain
    * count never multiplies passes over the corpus.
    */
  def markovAttribution(s: SparkSession, dir: String,
                        rounds: Int = 20): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val epoch = unix_timestamp(col("ts"))
    val prev = lag(epoch, 1).over(w)
    val wS = Window.partitionBy("user_id", "session_seq")
      .orderBy("ts", "event_id")
    val seq = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("new_s",
        when(prev.isNull || (epoch - prev > 1800L), 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("prior_pur",
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).over(
          wS.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("prior_pur"), lit(0L)) === 0L)
      .withColumn("st", when(col("event_type") === "purchase", "conv")
        .otherwise(col("event_type")))
      .withColumn("rn", row_number().over(wS))
      .withColumn("nxt", lead(col("st"), 1).over(wS))
    val tr = seq.filter(col("rn") === 1)
        .select(lit("start").as("cur"), col("st").as("nxt"))
      .unionAll(seq.filter(col("nxt").isNotNull)
        .select(col("st").as("cur"), col("nxt")))
      .unionAll(seq.filter(col("nxt").isNull && col("st") =!= "conv")
        .select(col("st").as("cur"), lit("null").as("nxt")))
    val tc = tr.groupBy("cur", "nxt").agg(count(lit(1)).as("c"))
    val wCur = Window.partitionBy("cur")
    val tp = tc
      .select(col("cur"), col("nxt"),
        round(col("c").cast("double") / sum(col("c")).over(wCur), 9)
          .as("p"))
      .localCheckpoint() // read every round below
    // the chain itself is O(|event types|²) rows at ANY corpus scale —
    // collecting it is the literal-centroid pattern (kmeans_embed),
    // not a driver-side loop over data: every corpus-bound stage above
    // stays distributed, and 5 chains × 20 rounds of ≤36
    // multiply-adds replace 100 scheduler round-trips (measured 8.2s
    // of fixed per-round overhead at sf0.1, ~0 arithmetic)
    val trans = tp.collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    val states = trans.flatMap(t => Seq(t._1, t._2)).distinct.sorted
    val channels = states
      .filterNot(Set("start", "conv", "null")).sorted
    val grid = 1000000000000L // 1e-12 probability grid
    // value iteration on the LONG grid: p'(a) = Σ_b floor(P(a,b)·p(b)
    // + 0.5), conv pinned to 1, the removed channel pinned to 0 — the
    // same arithmetic the unrolled SQL oracle runs, term for term
    def absorb(removed: Option[String]): Long = {
      var p = states.map(st =>
        st -> (if (st == "conv") grid else 0L)).toMap
      for (_ <- 1 to rounds) {
        val upd = trans
          .filter { case (_, b, _) => !removed.contains(b) }
          .groupBy(_._1)
          .map { case (a, ts) =>
            a -> ts.sortBy(_._2).map { case (_, b, pr) =>
              math.floor(pr * p(b) + 0.5).toLong
            }.sum
          }
        p = states.map { st =>
          st -> (if (st == "conv") grid
                 else if (removed.contains(st)) 0L
                 else upd.getOrElse(st, 0L))
        }.toMap
      }
      p("start")
    }
    val pf = absorb(None)
    val effs = channels.map { c =>
      val eff = if (pf > 0)
        math.floor((1.0 - absorb(Some(c)).toDouble / pf) * 1e6 + 0.5)
          .toLong
      else 0L
      (c, eff)
    }
    val te = effs.map(_._2).sum
    val convProb = math.floor(pf.toDouble / 1e12 * 1e6 + 0.5) / 1e6
    val rows = effs.map { case (c, eff) =>
      (c, convProb, eff.toDouble / 1e6,
        if (te > 0) math.floor(eff.toDouble / te * 1e6 + 0.5) / 1e6
        else 0.0)
    }
    import s.implicits._
    rows.toSeq
      .toDF("channel", "conv_prob", "removal_effect", "attribution")
      .orderBy("channel")
  }

  /** Kaplan–Meier survival curve for time-to-purchase with right
    * censoring — the estimator behind every churn/retention study that
    * `time_to_convert` (uncensored means only) cannot give. Per user:
    * entry day = first event, death = first purchase on/after entry,
    * users who never purchase are CENSORED at the corpus's last
    * observed day instead of being dropped (dropping them is the
    * classic survivorship bias). One pass builds (duration, event)
    * per user; the curve itself is O(distinct durations): the risk set
    * n_t falls out of one cumulative window over duration counts
    * (n_t = N − #{durations < t}), no per-user resort. S(t) is the
    * exact-integer product recurrence s₆ ← ⌊s₆·(n−d)/n⌋ on the 1e6
    * grid (s₆(0) = 10⁶), folded over the death times in order — NO
    * transcendental anywhere, so the surfaced LONG is identical on
    * any engine/libm: the only double ops are one multiply and one
    * divide per step, both IEEE-correctly-rounded in the same order
    * on both sides (the r5 exp/ln chain was libm-version-sensitive
    * and hash-failed the driver's DuckDB; this surface is the VERDICT
    * r5 #1 restatement). `surv` = s₆/10⁶ is one exact division of the
    * surfaced integer. At 100 TB the per-user reduction is the only
    * corpus-bound stage; the fold runs over the day-span-bounded
    * curve (≤ a few hundred rows at any corpus size).
    */
  def kaplanMeier(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy("user_id").agg(
      to_date(min(col("ts"))).as("d0"),
      to_date(min(when(col("event_type") === "purchase", col("ts"))))
        .as("dconv"))
    val horizon = ev.agg(to_date(max(col("ts"))).as("dmax"))
    val durs = perUser.crossJoin(broadcast(horizon))
      .select(
        when(col("dconv").isNotNull, datediff(col("dconv"), col("d0")))
          .otherwise(datediff(col("dmax"), col("d0"))).as("t"),
        when(col("dconv").isNotNull, 1L).otherwise(0L).as("event"))
    val byT = durs.groupBy("t").agg(
      sum(col("event")).as("d"),
      sum(lit(1L) - col("event")).as("c"),
      count(lit(1)).as("k"))
    val n = durs.count()
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val deathRows = byT
      .withColumn("n_risk", lit(n) - coalesce(sum(col("k")).over(w), lit(0L)))
      .filter(col("d") > 0)
      .select(col("t").cast("long").as("t"), col("d"), col("c"),
        col("n_risk").as("n"))
    // exact-integer survival fold: s₆ ← ⌊s₆·(n−d)/n⌋, s₆(0)=10⁶. One
    // IEEE multiply + one IEEE divide per step — correctly rounded the
    // same on every engine; only d>0 rows fold (a d=0 factor is 1).
    val acc0 = array().cast(
      "array<struct<t:bigint,d:bigint,c:bigint,n:bigint,s6:bigint>>")
    deathRows
      .select(struct(col("t"), col("d"), col("c"), col("n")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(aggregate(col("es"), acc0, (acc, e) => {
        val prev = when(size(acc) === 0, lit(1000000L))
          .otherwise(element_at(acc, -1)("s6"))
        val s6 = floor(prev.cast("double") *
          (e("n") - e("d")).cast("double") / e("n").cast("double"))
          .cast("long")
        concat(acc, array(struct(e("t").as("t"), e("d").as("d"),
          e("c").as("c"), e("n").as("n"), s6.as("s6"))))
      }).as("out"))
      .select(explode(col("out")).as("o"))
      .select(col("o.t").as("t_day"), col("o.n").as("n_risk"),
        col("o.d").as("deaths"), col("o.c").as("censored"),
        col("o.s6").as("surv6"),
        (col("o.s6").cast("double") / lit(1e6)).as("surv"))
      .orderBy("t_day")
  }

  /** Holt double-exponential smoothing (level + trend) of the daily
    * revenue series with a 7-day-ahead forecast — the trend-aware
    * upgrade of [[emaSmooth]]'s flat EMA, and the forecaster that
    * `stl_decompose`'s diagnostic decomposition feeds. Daily totals
    * are exact: per-event values land on the 1e-6 LONG grid before the
    * day sum, so the series is merge-order-free at any executor count.
    * The recurrence (l_t = α·x_t + (1−α)(l+b); b_t = β(l_t−l) +
    * (1−β)b) is order-dependent, so the ~span-bounded series collapses
    * to ONE sorted array folded by a single `aggregate` lambda — the
    * [[emaSmooth]] shape with two-slot carried state — written in the
    * exact IEEE op order the oracle's recursive CTE replays. In-sample
    * rows surface the one-step-ahead fit l+b (horizon 0); rows T+1..T+7
    * extrapolate l_T + h·b_T. Corpus-bound work is one day-keyed agg;
    * the fold is O(days) regardless of event volume.
    */
  def holtForecast(s: SparkSession, dir: String, alpha: Double = 0.3,
                   beta: Double = 0.1, h: Int = 7): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg((sum(col("v6")).cast("double") / lit(1e6)).as("x"))
    val acc0 = array().cast(
      "array<struct<day:int,x:double,level:double,trend:double,fitted:double>>")
    val folded = daily
      .select(struct(col("day").cast("int").as("day"), col("x")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(aggregate(col("es"), acc0, (acc, e) => {
        val lst = element_at(acc, -1)
        val seeded = struct(e("day").as("day"), e("x").as("x"),
          e("x").as("level"), lit(0.0).as("trend"),
          e("x").as("fitted"))
        val second = struct(e("day").as("day"), e("x").as("x"),
          e("x").as("level"), (e("x") - lst("x")).as("trend"),
          lst("level").as("fitted"))
        val fit = lst("level") + lst("trend")
        val lvl = lit(alpha) * e("x") + lit(1 - alpha) * fit
        val stepped = struct(e("day").as("day"), e("x").as("x"),
          lvl.as("level"),
          (lit(beta) * (lvl - lst("level")) +
            lit(1 - beta) * lst("trend")).as("trend"),
          fit.as("fitted"))
        when(size(acc) === 0, array(seeded)).otherwise(concat(acc,
          array(when(size(acc) === 1, second).otherwise(stepped))))
      }).as("out"))
    val inSample = folded
      .select(explode(col("out")).as("o"))
      .select(col("o.day").cast("long").as("day"), lit(0L).as("horizon"),
        q(col("o.x"), 6).as("actual"), q(col("o.fitted"), 6).as("fitted"))
    val fc = folded
      .select(element_at(col("out"), -1).as("f"))
      .select(explode(sequence(lit(1), lit(h))).as("hz"), col("f"))
      .select((col("f.day") + col("hz")).cast("long").as("day"),
        col("hz").cast("long").as("horizon"),
        lit(null).cast("double").as("actual"),
        q(col("f.level") + col("hz") * col("f.trend"), 6).as("fitted"))
    inSample.unionAll(fc).orderBy("day", "horizon")
  }

  /** In-sample backtest of the [[holtForecast]] forecaster against the
    * two standard baselines — naive-1 (yesterday) and seasonal-7 (same
    * weekday last week): per-method MAE plus MASE (Hyndman's
    * scale-free mean-absolute-scaled-error, MAE/MAE_naive — MASE < 1
    * is the publishable "beats naive" bar). Holt errors come from the
    * operator's own 6-dp-grid fitted values; baseline errors are exact
    * 1e-6-grid LONG differences; every |error| floor-quantizes to an
    * integer BEFORE its mean, so the three averages are order-free
    * exact sums divided once. O(days) throughout after the one
    * day-keyed aggregation.
    */
  def forecastBacktest(s: SparkSession, dir: String): DataFrame = {
    val holt = holtForecast(s, dir).filter(col("horizon") === 0L)
      .withColumn("rn", row_number().over(Window.orderBy("day")))
      .filter(col("rn") >= 3)
      .select(floor(abs(col("actual") - col("fitted")) * lit(1e6)
        + lit(0.5)).cast("long").as("e6"))
      .agg(count(lit(1)).as("nh"), sum("e6").as("sh"))
    val daily = Tables.events(s, dir)
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg(sum("v6").as("x6"))
    val wd = Window.orderBy("day")
    val base = daily
      .withColumn("p1", lag(col("x6"), 1).over(wd))
      .withColumn("p7", lag(col("x6"), 7).over(wd))
      .agg(
        sum(when(col("p1").isNotNull, 1L)).as("n1"),
        sum(when(col("p1").isNotNull, abs(col("x6") - col("p1"))))
          .as("s1"),
        sum(when(col("p7").isNotNull, 1L)).as("n7"),
        sum(when(col("p7").isNotNull, abs(col("x6") - col("p7"))))
          .as("s7"),
        count(lit(1)).as("n_days"))
    val maeH = col("sh").cast("double") / col("nh") / lit(1e6)
    val mae1 = col("s1").cast("double") / col("n1") / lit(1e6)
    val mae7 = col("s7").cast("double") / col("n7") / lit(1e6)
    base.crossJoin(broadcast(holt))
      .select(col("n_days"),
        q(maeH, 6).as("mae_holt"),
        q(mae1, 6).as("mae_naive1"),
        q(mae7, 6).as("mae_seasonal7"),
        q(maeH / mae1, 6).as("mase_holt"),
        q(mae7 / mae1, 6).as("mase_seasonal7"))
  }

  /** HyperLogLog accuracy audit — the third leg of the sketch-audit
    * trio (Count-Min counts, Bloom membership, HLL cardinality): an
    * m=16-register HLL of distinct users per event type, surfaced next
    * to the exact distinct count and the relative error. The sketch is
    * fully oracle-restatable: registers are MAX leading-rank integers
    * over the replicable poly hash (top 4 bits route, 36-bit suffix
    * ranks via an exact comparison chain), the harmonic sum Σ2^(−M)
    * is a sum of exact powers of two spanning < 53 bits — EXACT in
    * double and order-free — and the standard small-range linear-
    * counting branch fires on deterministic integer conditions. The
    * register table is m rows per group at any scale; this is the
    * mergeable-sketch shape a 1000-executor rollup would ship.
    */
  def hllErrorAudit(s: SparkSession, dir: String): DataFrame = {
    val m = 16
    val pairs = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct().persist()
    CacheScope.register(pairs) // eager: exact count + sketch scan it
    // short decimal ids leave the raw poly fold with no high-bit
    // entropy — run FOUR (multiply, xorshift) scramble rounds (the
    // SimHash40 mixer, doubled: sequential ids survive two rounds as
    // a near-arithmetic progression, measured as a 5× rank bias);
    // every step stays in [0, 2^40)
    val h0 = element_at(
      polyHashArray(array(col("user_id").cast("string"))), 1)
    val h = (1 to 4).foldLeft(h0) { (acc, _) =>
      val hm = (acc * lit(8388593L)) % lit(1099511627776L)
      hm.bitwiseXOR(shiftright(hm, 20))
    }
    // LOW bits route (an affine orbit cycles them uniformly; the top
    // bits of structured ids cluster), HIGH 36 bits feed the rank
    val suffix = shiftright(h, 4)
    val bitlen = coalesce(
      ((35 to 0 by -1).map(k =>
        when(suffix >= lit(1L << k), lit(k + 1))) :+ lit(0)): _*)
    val ranks = pairs.select(col("event_type"),
      pmod(h, lit(16L)).as("bucket"),
      (lit(37) - bitlen).cast("long").as("rank"))
    val regs = ranks.groupBy("event_type", "bucket")
      .agg(max("rank").as("mj"))
    // dense m-register grid: empty buckets carry M=0
    val grid = pairs.select("event_type").distinct()
      .select(col("event_type"),
        explode(sequence(lit(0L), lit(m - 1L))).as("bucket"))
    val dense = grid.join(regs, Seq("event_type", "bucket"), "left")
      .na.fill(0L, Seq("mj"))
    val est = dense.groupBy("event_type")
      .agg(sum(pow(lit(2.0), -col("mj").cast("double"))).as("ssum"),
        sum(when(col("mj") === 0L, 1L).otherwise(0L)).as("v"))
      .select(col("event_type"), col("v"),
        (lit(0.673) * lit(256.0) / col("ssum")).as("e_raw"))
      .select(col("event_type"),
        when(col("e_raw") <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")).as("e"))
    val exact = pairs.groupBy("event_type")
      .agg(count(lit(1)).as("exact_distinct"))
    exact.join(est, "event_type")
      .select(col("event_type"), col("exact_distinct"),
        q(col("e"), 4).as("hll_est"),
        q((col("e") - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("rel_err"))
      .orderBy("event_type")
  }

  /** KMV (k-minimum-values) cardinality audit (W267) — the fourth
    * sketch audit next to Count-Min / Bloom / HLL, and the one whose
    * state MERGES by a plain set-union of k values (the property that
    * makes it the natural distinct-count sketch for map-side partial
    * aggregation): keep the k smallest distinct hash values; with the
    * hash uniform on [0,2⁴⁰), E[distinct] ≈ (k−1)·2⁴⁰/h₍ₖ₎. Same
    * 4-round scrambled poly hash as [[hllErrorAudit]] (short decimal
    * ids carry no high-bit entropy raw). Everything up to the final
    * division is exact-integer: distinct hashes, a per-type
    * row_number over the (collision-free by construction: DISTINCT h)
    * total order, the k-th value picked by rank. Sparse-range branch:
    * under k distinct hashes the sketch IS the exact set, estimate =
    * count. One distinct shuffle + one k-row-per-type window — at
    * 100 TB the distinct pre-aggregates map-side and the window sees
    * ≤k·types rows after an early h ≤ per-type-k'th prefilter would
    * apply (here types are few so the plain window is the same cost).
    */
  def kmvErrorAudit(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val pairs = Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct().persist()
    CacheScope.register(pairs) // eager: exact count + sketch scan it
    val h0 = element_at(
      polyHashArray(array(col("user_id").cast("string"))), 1)
    val h = (1 to 4).foldLeft(h0) { (acc, _) =>
      val hm = (acc * lit(8388593L)) % lit(1099511627776L)
      hm.bitwiseXOR(shiftright(hm, 20))
    }
    val hs = pairs.select(col("event_type"), h.as("h")).distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
    val kth = hs.select(col("event_type"), col("h"),
        row_number().over(w).as("rn"))
      .filter(col("rn") === k)
      .select(col("event_type"), col("h").as("hk"))
    val nh = hs.groupBy("event_type").agg(count(lit(1)).as("n_hashes"))
    val exact = pairs.groupBy("event_type")
      .agg(count(lit(1)).as("exact_distinct"))
    val est = when(col("hk").isNull, col("n_hashes").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1099511627776.0)
        / col("hk").cast("double"))
    exact.join(nh, "event_type").join(kth, Seq("event_type"), "left")
      .select(col("event_type"), col("exact_distinct"),
        q(est, 4).as("kmv_est"),
        q((est - col("exact_distinct")) / col("exact_distinct"), 6)
          .as("rel_err"))
      .orderBy("event_type")
  }

  /** CUSUM changepoint scan of the daily revenue series: C_t =
    * Σ_{i≤t}(x_i − x̄), the classic level-shift locator (argmax |C_t|
    * splits the series at the most likely mean change). Everything is
    * EXACT integer arithmetic: day totals on the 1e-6 LONG grid, and
    * the mean multiplied through — C6_t = n·cum_t − t·Σx — so the
    * argmax and its tie-break (earliest day) are LONG comparisons, no
    * float anywhere before the surfaced cusum value. One day-keyed agg
    * is the only corpus-bound stage; the scan itself is O(days). (At
    * extreme scale the 1e-6-grid day totals would ride DECIMAL(38)
    * like the Welch moments; LONG holds to ~10¹² value-mass per day.)
    */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg(sum("v6").as("x6"))
    val tot = daily.agg(count(lit(1)).as("n"), sum("x6").as("sx"))
    val wcum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val c = daily.crossJoin(broadcast(tot))
      .withColumn("t", row_number().over(Window.orderBy("day")))
      .withColumn("cum", sum("x6").over(wcum))
      .withColumn("c6", col("n") * col("cum") - col("t") * col("sx"))
    val mx = c.agg(max(abs(col("c6"))).as("mx"))
    val flagged = c.crossJoin(broadcast(mx))
    val firstHit = flagged.filter(abs(col("c6")) === col("mx"))
      .agg(min("day").as("cp_day"))
    flagged.crossJoin(broadcast(firstHit))
      .select(col("day").cast("long").as("day"),
        q(col("c6").cast("double") / (col("n") * lit(1e6)), 6).as("cusum"),
        (abs(col("c6")) === col("mx") && col("day") === col("cp_day"))
          .as("is_changepoint"))
      .orderBy("day")
  }

  /** Theil–Sen robust trend of the daily revenue series: the median of
    * all pairwise slopes (x_j − x_i)/(t_j − t_i), then the median
    * residual as intercept — the outlier-proof alternative to
    * `ols_trend`'s least squares (one wild day moves OLS, not the
    * median). Day totals are exact 1e-6-grid LONGs, so every pairwise
    * slope is a double over exact integers; the median picks by
    * row_number under a FULLY tie-broken order (slope, i, j), making
    * the selected elements — not just their values — engine-identical.
    * O(days²) pairs is calendar-bounded at any corpus size; the
    * corpus-bound stage is the one day-keyed aggregation.
    */
  def theilSen(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg(sum("v6").as("x6"))
      .withColumn("t", row_number().over(Window.orderBy("day")))
    val a = daily.select(col("t").as("ti"), col("x6").as("xi"))
    val b = daily.select(col("t").as("tj"), col("x6").as("xj"))
    val slopes = a.join(b, col("ti") < col("tj"))
      .select(col("ti"), col("tj"),
        ((col("xj") - col("xi")).cast("double") /
          (col("tj") - col("ti")) / lit(1e6)).as("sl"))
    val ws = Window.orderBy(col("sl"), col("ti"), col("tj"))
    val ranked = slopes.withColumn("rn", row_number().over(ws))
    val np = ranked.agg(count(lit(1)).as("np"))
    // `/` on integers is DOUBLE division in Spark SQL — floor() keeps
    // the median indices integral and matches the oracle's floor()
    val slope = ranked.crossJoin(broadcast(np))
      .filter(col("rn") === floor((col("np") + 1) / 2) ||
        col("rn") === floor((col("np") + 2) / 2))
      .agg(avg(col("sl")).as("slope"))
    val resid = daily.crossJoin(broadcast(slope))
      .select((col("x6").cast("double") / lit(1e6) -
        col("slope") * col("t")).as("r"), col("t"))
    val wr = Window.orderBy(col("r"), col("t"))
    val rr = resid.withColumn("rn", row_number().over(wr))
    val nn = rr.agg(count(lit(1)).as("nn"))
    val icept = rr.crossJoin(broadcast(nn))
      .filter(col("rn") === floor((col("nn") + 1) / 2) ||
        col("rn") === floor((col("nn") + 2) / 2))
      .agg(avg(col("r")).as("icept"))
    daily.agg(count(lit(1)).as("n_days"))
      .crossJoin(broadcast(np))
      .crossJoin(broadcast(slope))
      .crossJoin(broadcast(icept))
      .select(col("n_days"), col("np").as("n_pairs"),
        q(col("slope"), 6).as("slope"), q(col("icept"), 6).as("intercept"))
  }

  /** CUPED variance-reduced A/B readout (Deng et al. 2013) over the
    * event stream: per-user PRE-period covariate X (summed value in
    * the first half of the time range) and post-period metric Y
    * (second half), deterministic 50/50 arm assignment by the
    * replicable user-id hash, pooled θ = cov(X,Y)/var(X), and per arm
    * the raw vs CUPED-adjusted mean Ȳ − θ(X̄ − X̄_pool) — plus the
    * pooled variance-reduction factor ρ² that says how much smaller
    * the adjusted CI is. The experimentation readout every
    * training-data A/B (new filter, new dedup threshold) runs.
    *
    * Numerics: per-event values land on the 1e-6 LONG grid, per-user
    * X/Y are exact LONG sums, and every pooled moment (Σx, Σxy, …)
    * rides DECIMAL(38,0) — n·Σxy − ΣxΣy stays ~1e31 at sf0.1, far
    * under DECIMAL(38)/HUGEINT — so θ's numerator/denominator are
    * exact integers on both engines and divide once into identical
    * doubles. Cost: one user-keyed partial-agg shuffle (the
    * sessionize class), then O(1) arm/pooled rows; the time-range
    * bounds crossJoin back broadcast, never via a driver scalar.
    */
  def cupedAdjust(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("user_id"), unix_timestamp(col("ts")).as("t"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    val bounds = ev.agg(min("t").as("t0"), max("t").as("t1"))
    val mid = ((col("t0") + col("t1")) / lit(2.0)).cast("long")
    val perUser = ev.crossJoin(broadcast(bounds))
      .groupBy("user_id")
      .agg(sum(when(col("t") <= mid, col("vi")).otherwise(0L)).as("x"),
        sum(when(col("t") > mid, col("vi")).otherwise(0L)).as("y"))
      .localCheckpoint() // pooled + per-arm aggregates both read it
    val pooled = perUser.agg(
      count(lit(1)).cast(dec).as("n"),
      sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
      sum((col("x").cast(dec) * col("x")).cast(dec)).as("sxx"),
      sum((col("y").cast(dec) * col("y")).cast(dec)).as("syy"),
      sum((col("x").cast(dec) * col("y")).cast(dec)).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val den = (col("n") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    val varY = (col("n") * col("syy") - col("sy") * col("sy"))
      .cast("double")
    val stats = pooled.select(
      when(den > 0, num / den).otherwise(lit(0.0)).as("theta"),
      when(den > 0 && varY > 0, num * num / (den * varY))
        .otherwise(lit(0.0)).as("rho2"),
      (col("sx").cast("double") / col("n").cast("double") / lit(1e6))
        .as("gx"))
    val arms = perUser
      .select(
        when(pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L),
          lit(100L)) < 50, "a").otherwise("b").as("arm"),
        col("x"), col("y"))
      .groupBy("arm")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast(dec)).as("asx"),
        sum(col("y").cast(dec)).as("asy"))
    val meanX = col("asx").cast("double") /
      col("n_users").cast("double") / lit(1e6)
    val meanY = col("asy").cast("double") /
      col("n_users").cast("double") / lit(1e6)
    arms.crossJoin(broadcast(stats))
      .select(col("arm"), col("n_users"),
        q(meanY, 6).as("mean_y"),
        q(meanY - col("theta") * (meanX - col("gx")), 6).as("mean_y_adj"),
        q(col("theta"), 6).as("theta"),
        q(col("rho2"), 6).as("var_reduction"))
      .orderBy("arm")
  }

  /** Cold-start coverage audit — the train/serve out-of-distribution
    * gate: split the stream at the time midpoint (the [[cupedAdjust]]
    * convention), then measure how much of the serve period a model
    * trained on the first half has NEVER SEEN: new-user share among
    * post-period users, and the share of post-period EVENTS those new
    * users generate (the traffic a per-user model would cold-start
    * on). One anti-join-shaped left join between two user sets plus
    * exact conditional counts — the audit every per-entity model
    * (personalization, per-user quotas) runs before shipping.
    */
  def coldStartAudit(s: SparkSession, dir: String): DataFrame = {
    val ev = CacheScope.track(Tables.events(s, dir)
      .select(col("user_id"), unix_timestamp(col("ts")).as("t"))
      .persist()) // bounds + both period scans
    val bounds = ev.agg(min("t").as("t0"), max("t").as("t1"))
    val mid = ((col("t0") + col("t1")) / lit(2.0)).cast("long")
    val tagged = ev.crossJoin(broadcast(bounds))
      .select(col("user_id"),
        (col("t") <= mid).cast("long").as("isPre"))
    val perUser = tagged.groupBy("user_id")
      .agg(sum(col("isPre")).as("n_pre"),
        sum(lit(1L) - col("isPre")).as("n_post"))
    perUser.agg(
      sum(when(col("n_pre") > 0, 1L).otherwise(0L)).as("n_users_pre"),
      sum(when(col("n_post") > 0, 1L).otherwise(0L)).as("n_users_post"),
      sum(when(col("n_post") > 0 && col("n_pre") === 0, 1L)
        .otherwise(0L)).as("n_new_users"),
      sum(col("n_post")).as("n_post_events"),
      sum(when(col("n_pre") === 0, col("n_post")).otherwise(0L))
        .as("new_user_events"))
      .select(col("n_users_pre"), col("n_users_post"), col("n_new_users"),
        q(col("n_new_users").cast("double") / col("n_users_post"), 6)
          .as("new_user_share"),
        q(col("new_user_events").cast("double") / col("n_post_events"), 6)
          .as("cold_traffic_share"))
  }

  /** Trend/seasonality STRENGTH of the daily series (Hyndman's
    * tsfeatures summary of an STL fit): F_seasonal = max(0, 1 −
    * Var(R)/Var(S+R)) and F_trend = max(0, 1 − Var(R)/Var(T+R)) over
    * the same integer-grid decomposition [[stlDecompose]] surfaces —
    * the two numbers that say whether the calendar pattern is real
    * before anyone fits a seasonal forecaster. Components stay on
    * their exact LONG grids (S+R = det_i, T+R = y·1e6 − seas_i, R =
    * det_i − seas_i), variances ride DECIMAL(38) moments, and each
    * strength is one double chain.
    */
  def seasonalityStrength(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // spine bounds + the left join
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val wT = Window.orderBy("day").rowsBetween(-3, 3)
    val det = daily
      .select(col("day"), col("y"),
        floor(sum(col("y")).over(wT).cast("double") /
          count(lit(1)).over(wT) * lit(1e6) + lit(0.5)).cast("long")
          .as("trend_i"))
      .select(col("y"),
        (col("y") * lit(1000000L) - col("trend_i")).as("det_i"),
        pmod(col("day"), lit(7L)).as("dow"))
    val seas = det.groupBy("dow")
      .agg(floor(sum(col("det_i")).cast("double") / count(lit(1)) +
        lit(0.5)).cast("long").as("seas_i"))
    val comp = det.join(broadcast(seas), "dow")
      .select((col("det_i") - col("seas_i")).as("ri"),
        col("det_i").as("sri"),
        (col("y") * lit(1000000L) - col("seas_i")).as("tri"))
    def mom(c: String) = Seq(
      sum(col(c).cast(dec)).as(s"s1_$c"),
      sum((col(c).cast(dec) * col(c)).cast(dec)).as(s"s2_$c"))
    val aggs = Seq(count(lit(1)).cast(dec).as("n")) ++
      mom("ri") ++ mom("sri") ++ mom("tri")
    val m = comp.agg(aggs.head, aggs.tail: _*)
    def varNum(c: String) =
      (col("n") * col(s"s2_$c") - col(s"s1_$c") * col(s"s1_$c"))
        .cast("double")
    def strength(denom: String) =
      when(varNum(denom) > 0,
        greatest(lit(0.0), lit(1.0) - varNum("ri") / varNum(denom)))
        .otherwise(lit(0.0))
    m.select(col("n").cast("long").as("n_days"),
      q(strength("sri"), 6).as("seasonal_strength"),
      q(strength("tri"), 6).as("trend_strength"))
  }

  /** Peak concurrency of the event intervals ([ts, ts + value
    * seconds], the [[intervalUnion]] convention) at MINUTE
    * granularity: every interval scatters to the minutes it covers,
    * a minute-keyed count aggregates, and the max (earliest-minute
    * tiebreak) is the capacity-planning number. Minute bucketing is
    * the scale choice: the exact instantaneous sweep needs a GLOBAL
    * sort of all 2n boundaries, while this is one bounded explode
    * (duration-limited) + one partial-agg shuffle + TakeOrdered —
    * and at capacity-planning granularity the minute answer is the
    * one anybody uses.
    */
  def peakConcurrency(s: SparkSession, dir: String): DataFrame = {
    val ep = unix_timestamp(col("ts"))
    val dur = greatest(lit(0L),
      floor(coalesce(col("value"), lit(0.0)) + lit(0.5)).cast("long"))
    val mins = Tables.events(s, dir)
      .select(explode(sequence(floor(ep / lit(60L)).cast("long"),
        floor((ep + dur) / lit(60L)).cast("long"))).as("minute"))
      .groupBy("minute").agg(count(lit(1)).as("concurrent"))
      .persist()
    CacheScope.register(mins) // max + the argmax filter
    val mx = mins.agg(max("concurrent").as("mx"),
      count(lit(1)).as("n_active_minutes"))
    mins.crossJoin(broadcast(mx))
      .filter(col("concurrent") === col("mx"))
      .orderBy("minute").limit(1)
      .select((col("minute") * 60L).as("peak_epoch"),
        col("mx").as("peak_concurrent"), col("n_active_minutes"))
  }

  /** Maximum drawdown of the cumulative daily revenue series — the
    * worst peak-to-trough fall, the risk number every cumulative KPI
    * chart hides: cum_t over the dense day spine, running max, and
    * the largest (runmax − cum) with its peak/trough days (earliest
    * tie wins on exact integers). Pure LONG arithmetic end to end —
    * day totals on the 1e-6 grid, cumulative and running-max windows
    * over the calendar-bounded spine, integer argmax.
    */
  def maxDrawdown(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg(sum("v6").as("x6"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("x6"), lit(0L)).as("x6"))
    val wc = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, 0)
    val dd = daily
      .withColumn("cum", sum("x6").over(wc))
      .withColumn("runmax", max("cum").over(wc))
      .withColumn("dd6", col("runmax") - col("cum"))
    val mx = dd.agg(max("dd6").as("mx"))
    dd.crossJoin(broadcast(mx))
      .filter(col("dd6") === col("mx"))
      .orderBy("day").limit(1)
      .select(col("day").as("trough_day"),
        q(col("mx").cast("double") / lit(1e6), 6).as("max_drawdown"),
        q(col("runmax").cast("double") / lit(1e6), 6).as("peak_cum"),
        q(col("cum").cast("double") / lit(1e6), 6).as("trough_cum"))
  }

  /** Difference-in-differences readout over the hash-split arms and
    * the time-midpoint periods (the same split/period conventions as
    * [[cupedAdjust]]): per (arm, period) cell the exact-grid mean
    * event value, and DiD = (a_post − a_pre) − (b_post − b_pre) — the
    * estimator for "did the treated arm MOVE more", robust to fixed
    * arm-level and period-level offsets that a raw post-period
    * comparison absorbs as bias. One pass to 4 cells; each surfaced
    * number is one double chain over exact LONG/DECIMAL sums.
    */
  def diffInDiff(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("user_id"), unix_timestamp(col("ts")).as("t"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    val bounds = ev.agg(min("t").as("t0"), max("t").as("t1"))
    val mid = ((col("t0") + col("t1")) / lit(2.0)).cast("long")
    val cells = ev.crossJoin(broadcast(bounds))
      .select(
        when(Curation.pctHash(col("user_id")) < 50, "a").otherwise("b")
          .as("arm"),
        when(col("t") <= mid, "pre").otherwise("post").as("period"),
        col("vi"))
      .groupBy("arm", "period")
      .agg(count(lit(1)).as("n"),
        sum(col("vi").cast("decimal(38,0)")).as("sv"))
      .select(col("arm"), col("period"), col("n"),
        (col("sv").cast("double") / col("n").cast("double") / lit(1e6))
          .as("m"))
    val flat = cells.groupBy()
      .pivot(concat(col("arm"), lit("_"), col("period")),
        Seq("a_pre", "a_post", "b_pre", "b_post"))
      .agg(first(col("m")))
    cells
      .select(col("arm"), col("period"), col("n"), q(col("m"), 6)
        .as("mean_value"))
      .crossJoin(broadcast(flat.select(
        q((col("a_post") - col("a_pre")) -
          (col("b_post") - col("b_pre")), 6).as("did"))))
      .orderBy("arm", "period")
  }

  /** Markov entropy RATE of user behavior — how predictable the next
    * event type is given the current one: rate = Σ_s π(s)·H(next|s)
    * over the empirical transition matrix (the one
    * [[eventTransitions]] surfaces), with π the empirical state
    * distribution. The engagement-predictability number behind "can
    * we prefetch/cache the next step"; per-state conditional
    * entropies show WHICH states are the chaotic ones. Distinct from
    * [[sessionEntropy]]'s within-session type mix: this one is
    * sequential structure.
    *
    * Exactness: each ln(c_st/c_s) lands on the 1e-9 grid and is
    * weighted by the exact integer c_st BEFORE the order-free LONG
    * sums; conditional entropies and the rate divide exact integers
    * once. Cost: one user-keyed window for transitions, |types|²
    * rows after — corpus-free arithmetic from there.
    */
  def entropyRate(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type"), col("nxt"))
      .agg(count(lit(1)).as("c_st"))
    val bySrc = trans.groupBy("event_type").agg(sum("c_st").as("c_s"))
    val l9 = floor(log(col("c_st").cast("double") / col("c_s")) *
      lit(1e9) + lit(0.5)).cast("long")
    val terms = trans.join(bySrc, "event_type")
      .select(col("event_type"), col("c_s"), (col("c_st") * l9).as("t9"))
    val perState = terms.groupBy("event_type", "c_s")
      .agg(sum("t9").as("st9"))
      .select(col("event_type"), col("c_s").as("n_out"),
        q(-col("st9").cast("double") / col("c_s") / lit(1e9), 6)
          .as("cond_entropy"),
        col("st9"), col("c_s"))
    val rate = perState.agg(
      q(-sum(col("st9")).cast("double") / sum(col("c_s")) / lit(1e9), 6)
        .as("entropy_rate"))
    perState.crossJoin(broadcast(rate))
      .select(col("event_type"), col("n_out"), col("cond_entropy"),
        col("entropy_rate"))
      .orderBy("event_type")
  }

  /** A/B power analysis — the pre-experiment readout every platform
    * shows before a test launches: with the current hash split and the
    * per-user metric's pooled variance, the minimum detectable effect
    * at α=0.05 (two-sided) and 80% power is
    * (z₀.₉₇₅+z₀.₈)·σ·√(1/n_a+1/n_b). Companion to [[welchTtest]] /
    * [[permutationTest]] (those judge an observed gap; this says what
    * gap is even detectable). z constants are fixed literals
    * (1.959964, 0.841621), documented to 6 dp.
    *
    * Same exactness recipe as [[cupedAdjust]]: per-user 1e-6-grid
    * sums, pooled DECIMAL(38) moments, one double chain at the end.
    * One user-keyed partial-agg shuffle; everything after is O(1).
    */
  def abPower(s: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val perUser = Tables.events(s, dir).filter(col("value").isNotNull)
      .groupBy("user_id")
      .agg(sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
        .as("v"))
      .select(col("v"),
        when(Curation.pctHash(col("user_id")) < 50, 1L).otherwise(0L)
          .as("isA"))
    val m = perUser.agg(
      sum(col("isA")).as("na"),
      sum(lit(1L) - col("isA")).as("nb"),
      count(lit(1)).cast(dec).as("n"),
      sum(col("v").cast(dec)).as("sv"),
      sum((col("v").cast(dec) * col("v")).cast(dec)).as("sv2"))
    val mean = col("sv").cast("double") / col("n").cast("double") / lit(1e6)
    val sigma = sqrt(
      (col("n") * col("sv2") - col("sv") * col("sv")).cast("double") /
        (col("n") * (col("n") - lit(1))).cast("double")) / lit(1e6)
    val mde = lit(2.801585) * sigma *
      sqrt(lit(1.0) / col("na") + lit(1.0) / col("nb"))
    m.select(col("na"), col("nb"),
      q(mean, 6).as("mean_value"),
      q(sigma, 6).as("sigma"),
      q(mde, 6).as("mde_abs"),
      q(mde / mean, 6).as("mde_rel"))
  }

  /** Off-policy evaluation of a counterfactual action policy by
    * inverse-propensity scoring — the bandit-log readout (Horvitz–
    * Thompson / Li et al. 2011): treat events as logged (context =
    * user, action = event type, reward = value), estimate logging
    * propensities empirically from global action shares p̂(a) = c_a/n,
    * evaluate the deterministic target policy "play the user's modal
    * action" via the direct mean on matched events, IPS
    * Σ r·1[a=π(u)]/c_a, and the self-normalized SNIPS (the
    * variance-bounded estimator production systems actually report).
    *
    * Exactness: rewards on the 1e-6 grid; each IPS term floor-
    * quantizes r6·1e6/c_a (and 1e12/c_a for the SNIPS denominator) to
    * LONGs before order-free sums — the estimates are then single
    * double chains over exact integers. Cost: one user-keyed agg for
    * the modal action (rank window over user×action rows), one
    * broadcast of the action-count table, one pass for the sums.
    */
  def ipsEval(s: SparkSession, dir: String): DataFrame = {
    val ev = CacheScope.track(Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        floor(coalesce(col("value"), lit(0.0)) * lit(1e6) + lit(0.5))
          .cast("long").as("r6"))
      .persist()) // propensities, modal policy and the scoring pass
    val ca = ev.groupBy("event_type").agg(count(lit(1)).as("c_a"))
    val wMode = Window.partitionBy("user_id")
      .orderBy(col("cnt").desc, col("event_type"))
    val pi = ev.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(wMode))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("pi_a"))
    val n = ev.agg(count(lit(1)).as("n_events"))
    val scoredAgg = ev
      .join(pi.hint("shuffle_hash"), "user_id")
      .join(broadcast(ca), "event_type")
      .select(
        (col("event_type") === col("pi_a")).cast("long").as("m"),
        col("r6"), col("c_a"))
      .agg(sum(col("m")).as("n_matched"),
        sum(when(col("m") === 1, col("r6")).otherwise(0L)).as("sr6"),
        sum(when(col("m") === 1,
          floor(col("r6").cast("double") * lit(1e6) / col("c_a") +
            lit(0.5)).cast("long")).otherwise(0L)).as("sti"),
        sum(when(col("m") === 1,
          floor(lit(1e12) / col("c_a") + lit(0.5)).cast("long"))
          .otherwise(0L)).as("swi"))
    scoredAgg.crossJoin(broadcast(n))
      .select(col("n_events"), col("n_matched"),
        q(col("sr6").cast("double") / col("n_matched") / lit(1e6), 6)
          .as("direct_mean"),
        q(col("sti").cast("double") / lit(1e12), 6).as("ips"),
        // SNIPS = Σr·w/Σw: the 1e12 grids of numerator and
        // denominator cancel exactly
        q(col("sti").cast("double") / col("swi"), 6).as("snips"))
  }

  /** Session-gap sensitivity sweep — "how many sessions would each
    * cutoff produce" for a ladder of gap thresholds, from ONE pass
    * over the per-user gaps: a session starts wherever the preceding
    * gap exceeds the cutoff, so n_sessions(t) = n_users + #{gaps > t}
    * — no re-sessionization per threshold (the dedup_threshold_sweep
    * trick applied to time). The table that tunes the production gap
    * before anyone bakes 30 minutes into a pipeline.
    *
    * One user-keyed window computes gaps once; the ladder is a
    * crossJoin against 6 constant rows with conditional counts, all
    * exact integers. Mean events/session is the exact ratio
    * n_events / n_sessions.
    */
  def sessionGapSweep(s: SparkSession, dir: String,
                      minutes: Seq[Int] = Seq(5, 10, 15, 30, 60, 120))
      : DataFrame = {
    import s.implicits._
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val epoch = unix_timestamp(col("ts"))
    val gaps = CacheScope.track(Tables.events(s, dir)
      .withColumn("gap", epoch - lag(epoch, 1).over(w))
      .select(col("gap"))
      .persist()) // totals + the ladder both scan it
    val totals = gaps.agg(count(lit(1)).as("n_events"),
      sum(when(col("gap").isNull, 1L).otherwise(0L)).as("n_users"))
    val ladder = minutes.toDF("gap_minutes")
    gaps.filter(col("gap").isNotNull)
      .crossJoin(broadcast(ladder))
      .groupBy("gap_minutes")
      .agg(sum(when(col("gap") > col("gap_minutes") * lit(60L), 1L)
        .otherwise(0L)).as("n_breaks"))
      .crossJoin(broadcast(totals))
      .select(col("gap_minutes"),
        (col("n_users") + col("n_breaks")).as("n_sessions"),
        q(col("n_events").cast("double") /
          (col("n_users") + col("n_breaks")), 6).as("events_per_session"))
      .orderBy("gap_minutes")
  }

  /** KMV sketch SET OPERATIONS audit — the reason KMV is the sketch a
    * distributed engine ships: two sketches union by merging their
    * k-minimum value sets (an associative, order-free set union), and
    * intersection estimates ride the Jaccard share of the merged
    * sketch (Beyer et al. 2007): est∩ = (|K ∩ S_a ∩ S_b| / |K|) · est∪
    * with K the k smallest of the merged set. Per event-type PAIR this
    * reports exact vs estimated union and intersection of the user
    * sets — the audit that says whether sketch-level audience overlap
    * is trustworthy before anyone joins raw ID sets at 100 TB.
    *
    * Under k distinct hashes the merged sketch IS the union, so both
    * estimators fall back to exact counts (the same branch the
    * cardinality audit takes). Cost: one distinct pass builds per-type
    * hash sets, per-type top-k windows run over type-bounded rows, and
    * everything pairwise touches only sketch rows (≤ k per type) —
    * the corpus is scanned once. Exact truth needs the user-keyed
    * self-join; the SKETCH path never does, which is the point.
    */
  def kmvSetOps(s: SparkSession, dir: String, k: Int = 64): DataFrame = {
    val pairs = CacheScope.track(Tables.events(s, dir)
      .select(col("event_type"), col("user_id")).distinct().persist())
    val h0 = element_at(
      polyHashArray(array(col("user_id").cast("string"))), 1)
    val h = (1 to 4).foldLeft(h0) { (acc, _) =>
      val hm = (acc * lit(8388593L)) % lit(1099511627776L)
      hm.bitwiseXOR(shiftright(hm, 20))
    }
    val hs = pairs.select(col("event_type"), h.as("h")).distinct()
    val w = Window.partitionBy("event_type").orderBy("h")
    val sk = CacheScope.track(hs
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("event_type"), col("h")).persist())
    val tys = sk.select(col("event_type")).distinct()
    val tpairs = tys.select(col("event_type").as("ta"))
      .crossJoin(tys.select(col("event_type").as("tb")))
      .filter(col("ta") < col("tb"))
    val merged = tpairs
      .join(sk.select(col("event_type").as("ta"), col("h")), Seq("ta"))
      .select("ta", "tb", "h")
      .unionAll(tpairs
        .join(sk.select(col("event_type").as("tb"), col("h")), Seq("tb"))
        .select("ta", "tb", "h"))
      .distinct()
    val wm = Window.partitionBy("ta", "tb").orderBy("h")
    val mk = merged.withColumn("rn", row_number().over(wm))
      .filter(col("rn") <= k).select("ta", "tb", "h")
    val ann = mk
      .join(sk.select(col("event_type").as("ta"), col("h"),
        lit(1).as("ina")), Seq("ta", "h"), "left")
      .join(sk.select(col("event_type").as("tb"), col("h"),
        lit(1).as("inb")), Seq("tb", "h"), "left")
      .groupBy("ta", "tb")
      .agg(count(lit(1)).as("n_mk"), max("h").as("hk"),
        sum(when(col("ina") === 1 && col("inb") === 1, 1L)
          .otherwise(0L)).as("cb"))
    val estU = when(col("n_mk") < k, col("n_mk").cast("double"))
      .otherwise(lit((k - 1).toDouble) * lit(1099511627776.0) /
        col("hk").cast("double"))
    val ex = pairs.select(col("event_type").as("ta"), col("user_id"))
      .join(pairs.select(col("event_type").as("tb"), col("user_id")),
        "user_id")
      .filter(col("ta") < col("tb"))
      .groupBy("ta", "tb").agg(count(lit(1)).as("exact_inter"))
    val cnts = pairs.groupBy("event_type").agg(count(lit(1)).as("n"))
    tpairs
      .join(cnts.select(col("event_type").as("ta"), col("n").as("na")),
        "ta")
      .join(cnts.select(col("event_type").as("tb"), col("n").as("nb")),
        "tb")
      .join(ex, Seq("ta", "tb"), "left")
      .na.fill(0L, Seq("exact_inter"))
      .join(ann, Seq("ta", "tb"))
      .select(col("ta"), col("tb"),
        (col("na") + col("nb") - col("exact_inter")).as("exact_union"),
        col("exact_inter"),
        q(estU, 4).as("kmv_union"),
        q(col("cb").cast("double") / col("n_mk") * estU, 4)
          .as("kmv_inter"))
      .orderBy("ta", "tb")
  }

  /** Permutation test (Fisher randomization) for the A/B difference in
    * per-user mean value: permutation p = 0 is the OBSERVED hash
    * assignment (the same split [[cupedAdjust]] uses), p = 1..P−1 are
    * deterministic re-randomizations via a (user, p)-keyed replicable
    * hash, and the p-value is the share of permutations whose
    * |mean gap| matches or beats the observed one — the
    * distribution-free significance readout that needs no normality
    * assumption (the companion to [[welchTtest]]'s parametric t).
    *
    * Exactness: the comparison |Δ_p| ≥ |Δ_0| is the cross-multiplied
    * integer test |sa·nb − sb·na|·(na₀nb₀) ≥ |sa₀nb₀ − sb₀na₀|·(na·nb)
    * on DECIMAL(38)/HUGEINT (≤ ~1e27 at sf0.1) — no division ever
    * decides a count. Scale shape: the corpus-bound work is ONE
    * user-keyed partial-agg shuffle; the permutation layer explodes
    * only the per-USER table ×P and re-aggregates to P rows
    * (map-side combined), so the corpus is never scanned twice.
    */
  def permutationTest(s: SparkSession, dir: String,
                      perms: Int = 100): DataFrame = {
    val dec = "decimal(38,0)"
    val perUser = Tables.events(s, dir).filter(col("value").isNotNull)
      .groupBy("user_id")
      .agg(sum(floor(col("value") * lit(1e6) + lit(0.5)).cast("long"))
        .as("v"))
    // p=0 reduces to Curation.pctHash — the observed assignment
    val h = pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L) +
      col("p") * lit(2654435761L), lit(100L))
    val byP = perUser
      .select(col("user_id"), col("v"),
        explode(sequence(lit(0L), lit((perms - 1).toLong))).as("p"))
      .select(col("p"), when(h < 50, 1L).otherwise(0L).as("isA"), col("v"))
      .groupBy("p")
      .agg(sum(col("isA")).as("na"),
        sum(lit(1L) - col("isA")).as("nb"),
        sum(when(col("isA") === 1, col("v")).otherwise(0L).cast(dec))
          .as("sa"),
        sum(when(col("isA") === 0, col("v")).otherwise(0L).cast(dec))
          .as("sb"))
      .select(col("p"), col("na"), col("nb"),
        abs(col("sa") * col("nb").cast(dec) -
          col("sb") * col("na").cast(dec)).as("d"),
        (col("na").cast(dec) * col("nb").cast(dec)).as("nn"))
      .localCheckpoint() // P rows, read for the observed row + compare
    val obs = byP.filter(col("p") === 0)
      .select(col("d").as("d0"), col("nn").as("nn0"),
        (col("na") + col("nb")).as("n_users"))
    byP.crossJoin(broadcast(obs))
      .agg(max(col("n_users")).as("n_users"),
        sum(when(col("d") * col("nn0") >= col("d0") * col("nn"), 1L)
          .otherwise(0L)).as("n_ge"),
        max(col("d0").cast("double") / col("nn0").cast("double") /
          lit(1e6)).as("dobs"))
      .select(col("n_users"),
        q(col("dobs"), 6).as("diff_obs"),
        q(col("n_ge").cast("double") / lit(perms.toDouble), 6)
          .as("p_value"))
  }

  /** Exact Shapley-value conversion attribution (W301) — the
    * coalition-game credit split that position rules
    * ([[attribution]]) and removal effects ([[markovAttribution]])
    * both approximate. Characteristic function: v(S) = number of
    * converting users whose pre-conversion touched-channel set ⊆ S
    * (the user still converts when only the channels in S exist).
    * With C channels the game lives on 2^C coalitions, so the
    * corpus-bound work is ONE distributed aggregation — first
    * purchase per user, bitmask of channel types seen strictly
    * before it — and everything after runs on a ≤2^C-row table of
    * exact conversion counts (broadcast joins over generated
    * coalition spines; C is the event-type alphabet, never the data).
    * Shapley weights |S|!(C-|S|-1)!/C! are surfaced as exact integer
    * numerators over the common denominator C! (24·φ_c here), so the
    * whole computation is LONG arithmetic until one final division.
    * Channel bit order is alphabetical — a fixed public convention
    * both engines restate.
    */
  def shapleyAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // channels = the non-purchase event types, alphabetical bit order
    val channels = Seq("click", "error", "signup", "view")
    val nC = channels.size
    val bitOf = channels.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }.toMap
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("t"))
    val firstPurchase = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id").agg(min(col("t")).as("tp"))
    // touched mask: distinct channel types strictly before first buy
    val bitCol = channels.tail.foldLeft(
      when(col("event_type") === channels.head, lit(bitOf(channels.head)))) {
        (acc, c) => acc.when(col("event_type") === c, lit(bitOf(c)))
      }.otherwise(lit(0L))
    val masks = ev.join(firstPurchase, "user_id")
      .filter(col("t") < col("tp") && col("event_type") =!= "purchase")
      .select(col("user_id"), bitCol.as("bit"))
      .distinct()
      .groupBy("user_id").agg(sum(col("bit")).as("mask"))
    // conv(T): converting users with exact touched mask T. Users whose
    // pre-purchase window saw no channel sit at mask 0 (constant in
    // every marginal, so they cancel out of each φ_c).
    val conv = firstPurchase.join(masks, Seq("user_id"), "left")
      .select(coalesce(col("mask"), lit(0L)).as("mask"))
      .groupBy("mask").agg(count(lit(1)).as("conv"))
      .localCheckpoint() // ≤2^C rows; probed once per coalition spine
    // v(S) = Σ_{T ⊆ S} conv(T), over the dense coalition spine
    val coalitions = s.range(1L << nC).toDF("cs")
    val vOfS = coalitions.join(conv,
        (col("mask").bitwiseAND(col("cs"))) === col("mask"), "left")
      .groupBy("cs").agg(sum(coalesce(col("conv"), lit(0L))).as("v"))
      .localCheckpoint() // 2^C rows; probed twice per channel below
    // 24·φ_c = Σ_{S ⊆ C∖{c}} |S|!(3-|S|)!·[v(S∪{c}) − v(S)]
    val wnum = Seq(6L, 2L, 2L, 6L) // s!(C-1-s)! for s = 0..3, C = 4
    val wCol = wnum.zipWithIndex.tail.foldLeft(
      when(col("pc") === 0, lit(wnum.head))) { case (acc, (w, i)) =>
        acc.when(col("pc") === i, lit(w))
      }.otherwise(lit(0L))
    val chan = channels.map(c => (c, bitOf(c)))
      .toDF("channel", "cbit")
    val subsets = chan.crossJoin(coalitions)
      .filter((col("cs").bitwiseAND(col("cbit"))) === 0)
      .select(col("channel"), col("cbit"), col("cs"),
        ((col("cs").bitwiseAND(lit(1L))) +
          (shiftright(col("cs"), 1).bitwiseAND(lit(1L))) +
          (shiftright(col("cs"), 2).bitwiseAND(lit(1L))) +
          (shiftright(col("cs"), 3).bitwiseAND(lit(1L)))).as("pc"))
      .select(col("channel"), col("cs"),
        (col("cs") + col("cbit")).as("cs_with"), wCol.as("w"))
    val phi = subsets
      .join(vOfS.select(col("cs"), col("v").as("v_without")), "cs")
      .join(vOfS.select(col("cs").as("cs_with"), col("v").as("v_with")),
        "cs_with")
      .groupBy("channel")
      .agg(sum(col("w") * (col("v_with") - col("v_without")))
        .as("phi24"))
    val tot = phi.agg(sum(col("phi24")).as("tot24"))
    phi.crossJoin(broadcast(tot))
      .select(col("channel"), col("phi24"),
        q(col("phi24").cast("double") / lit(24.0), 6).as("phi"),
        when(col("tot24") > 0,
          q(col("phi24").cast("double") / col("tot24"), 6))
          .otherwise(lit(0.0)).as("share"))
      .orderBy("channel")
  }

  /** Benjamini–Hochberg FDR control over the [[welchTtest]] pair
    * screen (W303) — the multiple-testing step every "which segments
    * differ?" readout needs before anyone acts on 10 simultaneous
    * t-tests. p-values use the large-sample normal tail with the
    * Abramowitz–Stegun 7.1.26 erfc polynomial — a PURE closed form
    * both engines restate literally: p = 2(1−Φ(|t|)) =
    * (Σ aᵢkⁱ)·e^(−t²/2), k = 1/(1+0.3275911·|t|/√2). Determinism:
    * |t| is already on the 1e-6 grid; tiny p's would vanish on any
    * absolute grid, so the surfaced/compared statistic is −ln p =
    * t²/2 − ln(Σ aᵢkⁱ), floor-quantized to a 1e-6 LONG grid (ln of a
    * moderate operand — the repo's ln-grid recipe), and the BH step-up
    * p₍ᵢ₎ ≤ i·α/m runs entirely in that log space: reject ⟺ nlp ≥
    * ln(m/(i·α)), with the threshold quantized on the same grid.
    * All O(types²) rows; the only corpus-bound work is the one
    * sufficient-stats scan inside [[welchTtest]].
    */
  def fdrBh(s: SparkSession, dir: String, alpha: Double = 0.05)
      : DataFrame = {
    val t = welchTtest(s, dir)
      .select(col("type_a"), col("type_b"),
        abs(coalesce(col("t_stat"), lit(0.0))).as("at"))
    val x = col("at") / lit(1.4142135623730951) // |t|/√2
    val kk = lit(1.0) / (lit(1.0) + lit(0.3275911) * x)
    val poly = ((((lit(1.061405429) * kk + lit(-1.453152027)) * kk
      + lit(1.421413741)) * kk + lit(-0.284496736)) * kk
      + lit(0.254829592)) * kk
    val nlp = floor((x * x - log(poly)) * lit(1e6) + lit(0.5))
      .cast("long")
    val scored = t.select(col("type_a"), col("type_b"),
        col("at"), nlp.as("nlp_i"))
    // m = the size of the tested family (C(types,2)), from the data —
    // the same 10-row window that ranks the pairs counts them
    val wRank = Window.orderBy(col("nlp_i").desc,
      col("type_a"), col("type_b"))
    val wAll = Window.partitionBy()
    val thr = floor(log(col("m").cast("double")
      / (col("p_rank") * lit(alpha))) * lit(1e6) + lit(0.5))
      .cast("long")
    val ranked = scored
      .withColumn("p_rank", row_number().over(wRank).cast("long"))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("bh_ok",
        (col("nlp_i") >= thr).cast("long"))
    val kMax = ranked.agg(
      max(when(col("bh_ok") === 1, col("p_rank")).otherwise(0L))
        .as("k_max"))
    ranked.crossJoin(broadcast(kMax))
      .select(col("type_a"), col("type_b"),
        col("at").as("abs_t"),
        q(col("nlp_i").cast("double") / lit(1e6), 6).as("neg_log_p"),
        col("p_rank"), col("k_max"),
        (col("p_rank") <= col("k_max")).cast("long").as("reject"))
      .orderBy("p_rank")
  }

  /** Sequential-pattern support mining (W307) — the support of EVERY
    * length-3 ordered subsequence a→b→c over per-user event streams
    * (non-contiguous: any gaps allowed), the discovery generalization
    * of [[windowFunnel]]'s single fixed pattern and of
    * [[eventuallyFollows]]' pairs. Existence uses the greedy-earliest
    * chain (take the first a, the first b after it, then any c after
    * that), which is EXISTENCE-OPTIMAL — a user contains the
    * subsequence iff the greedy chain completes — so support counting
    * is three alphabet-bounded keyed aggregations, never a per-user
    * scan of |A|³ candidate walks:
    * f[a](u)      = min t of a               (|A|·U rows)
    * t2[a,b](u)   = min t of b strictly after f[a]   (|A|²·U rows)
    * supported    ⟺ last[c](u) > t2[a,b](u)          (|A|³·U probes)
    * |A| is the event-type alphabet (5 here) — the blow-up rides the
    * alphabet, the corpus only ever feeds partial-agg'd min/max.
    * Ties inside a timestamp second resolve by event_id (the log's
    * total order), exactly restatable in SQL. Top-k by (support DESC,
    * pattern) — exact integers end to end.
    */
  def seqPatterns(s: SparkSession, dir: String, k: Int = 20): DataFrame = {
    val ev = CacheScope.track(Tables.events(s, dir)
      .select(col("user_id").as("u"), col("event_type").as("ty"),
        // one strictly-increasing integer per event: second·2^20 + id
        // (ids are unique; seconds fit 2^43 — no collision, no ties)
        (unix_timestamp(col("ts")) * lit(1048576L) + col("event_id"))
          .as("t"))
      .persist()) // three aggregation passes read it
    val first = ev.groupBy("u", "ty").agg(min(col("t")).as("t1"))
      .select(col("u"), col("ty").as("a"), col("t1"))
    val last = ev.groupBy("u", "ty").agg(max(col("t")).as("tl"))
      .select(col("u"), col("ty").as("c"), col("tl"))
    // first b strictly after first a, per (user, a, b) — user-keyed
    // shuffle joins throughout (the per-type tables are U·|A| rows:
    // too big to broadcast at scale, co-partitioned on u for free)
    val t2 = ev.join(first, "u")
      .filter(col("t") > col("t1"))
      .groupBy(col("u"), col("a"), col("ty").as("b"))
      .agg(min(col("t")).as("t2"))
    // (u,a,b)×(u,c) rows are unique by construction — plain count
    val support = t2.join(last, "u")
      .filter(col("tl") > col("t2"))
      .groupBy("a", "b", "c")
      .agg(count(lit(1)).as("support"))
    support
      .orderBy(col("support").desc, col("a"), col("b"), col("c"))
      .limit(k)
  }

  /** Little's-law consistency audit (W314): L = λ·W, checked two
    * independent ways over the session process — the queueing sanity
    * gate for any capacity plan built on [[peakConcurrency]]. L_pred
    * = Σ session-seconds / span is the law's exact form (λ·W with n
    * cancelling); L_obs re-measures mean concurrency on the MINUTE
    * grid (each session marks its occupied minutes on the dense
    * minute spine — the peak_concurrency discretization). Their ratio
    * isolates pure discretization + edge error: a ratio far from 1
    * means minute-grid capacity numbers can't be trusted for these
    * session lengths. Sessions are the 30-minute-gap convention
    * ([[sessionize]]); every statistic is an exact-integer ratio.
    * One user-keyed window + one bounded minute explode (Σdur/60
    * rows); the audit itself is O(1) arithmetic.
    */
  def littlesLawAudit(s: SparkSession, dir: String,
                      gapSec: Long = 1800L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id").as("u"), unix_timestamp(col("ts")).as("t"),
        col("event_id").as("eid"))
    val w = Window.partitionBy("u").orderBy("t", "eid")
    val sess = ev
      .withColumn("newSess",
        when(col("t") - lag(col("t"), 1).over(w) > gapSec || lag(col("t"),
          1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("sid", sum(col("newSess")).over(
        Window.partitionBy("u").orderBy("t", "eid")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("u", "sid")
      .agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
      .localCheckpoint() // totals + the minute explode both read it
    val span = sess.agg(min(col("t0")).as("s0"), max(col("t1")).as("s1"),
      count(lit(1)).as("n_sessions"),
      sum(col("t1") - col("t0")).as("sum_dur"))
    // occupied minutes per session on the dense minute spine
    val occ = sess
      .select(explode(sequence(floor(col("t0") / 60).cast("long"),
        floor(col("t1") / 60).cast("long"))).as("minute"))
      .agg(count(lit(1)).as("occ_minutes"))
    span.crossJoin(broadcast(occ))
      .select(col("n_sessions"),
        q((col("s1") - col("s0")).cast("double") / lit(3600.0), 6)
          .as("span_hours"),
        q(col("n_sessions").cast("double") /
          ((col("s1") - col("s0")).cast("double") / lit(3600.0)), 6)
          .as("lambda_per_hour"),
        q(col("sum_dur").cast("double") / col("n_sessions") / lit(60.0),
          6).as("w_mean_minutes"),
        q(col("sum_dur").cast("double") / (col("s1") - col("s0")), 6)
          .as("l_pred"),
        q(col("occ_minutes").cast("double") /
          (floor(col("s1") / 60) - floor(col("s0") / 60) + 1), 6)
          .as("l_obs_minutes"),
        q(col("occ_minutes").cast("double") /
          (floor(col("s1") / 60) - floor(col("s0") / 60) + 1) /
          (col("sum_dur").cast("double") / (col("s1") - col("s0"))), 6)
          .as("ratio"))
  }

  /** Inter-arrival exponentiality screen (W315): per event type, the
    * KS distance between the empirical gap distribution and
    * Exp(λ̂ = 1/mean gap) — "is this stream Poisson, or bursty?",
    * the modeling gate before anyone assumes memorylessness
    * (capacity models, [[abPower]]-style duration math). Numerics:
    * gaps and their sum are exact integers; the fitted CDF value
    * 1−e^(−λ̂g) is quantized to a 1e-9 LONG immediately after the
    * single transcendental, and the KS sup runs entirely in scaled
    * integers (|i·1e9 − n·F9| over the rank spine), so both engines
    * take the max of identical LONGs. One per-type window for gaps +
    * one per-type rank window; at 100 TB the rank pass becomes an
    * equi-depth sketch ([[Relational.equiDepthHist]]) — documented
    * cut, same statistic.
    */
  def expGapFit(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("ty"), unix_timestamp(col("ts"))
        .as("t"), col("event_id").as("eid"))
    val w = Window.partitionBy("ty").orderBy("t", "eid")
    val gaps = ev
      .withColumn("g", col("t") - lag(col("t"), 1).over(w))
      .filter(col("g").isNotNull)
      .select(col("ty"), col("g"))
    val stats = gaps.groupBy("ty")
      .agg(count(lit(1)).as("n"), sum(col("g")).as("sg"))
    val lam = col("n").cast("double") / col("sg").cast("double")
    val ranked = gaps.join(stats, "ty")
      .withColumn("i", row_number().over(
        Window.partitionBy("ty").orderBy("g")).cast("long"))
      .withColumn("f9",
        floor((lit(1.0) - exp(-(lam * col("g")))) * lit(1e9) + lit(0.5))
          .cast("long"))
    ranked
      .groupBy("ty")
      .agg(max(col("n")).as("n_gaps"), max(col("sg")).as("sg"),
        max(greatest(abs(col("i") * lit(1000000000L) - col("n") * col("f9")),
          abs((col("i") - 1) * lit(1000000000L) - col("n") * col("f9"))))
          .as("d9"))
      .select(col("ty").as("event_type"), col("n_gaps"),
        q(col("n_gaps").cast("double") / col("sg").cast("double") *
          lit(3600.0), 6).as("lambda_per_hour"),
        q(col("d9").cast("double") / (col("n_gaps").cast("double") *
          lit(1e9)), 6).as("ks_stat"))
      .orderBy("event_type")
  }

  /** Holt–Winters additive seasonal smoothing (W324) — the weekly-
    * seasonal completion of [[holtForecast]]: state (level, trend,
    * seasonal[7]) with fit = l + b + s_dow, the forecaster that
    * [[seasonalityStrength]]'s F_S decides you need. Seasonals start
    * at zero and learn through γ (no special first-week seeding — a
    * simpler recurrence both engines restate verbatim); steps 1–2
    * seed level/trend exactly as Holt does. The day-bounded series
    * folds as ONE sorted array with the seasonal vector carried as a
    * 7-slot array in the fold state — the oracle's recursive CTE
    * carries the same LIST. In-sample rows surface the one-step-ahead
    * fit; rows T+1..T+7 extrapolate l + h·b + s[(day+h) mod 7].
    * Corpus-bound work: one day-keyed exact-grid aggregation.
    */
  def hwForecast(s: SparkSession, dir: String, alpha: Double = 0.3,
                 beta: Double = 0.1, gamma: Double = 0.2,
                 h: Int = 7): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg((sum(col("v6")).cast("double") / lit(1e6)).as("x"))
    val acc0 = array().cast(
      "array<struct<day:int,x:double,level:double,trend:double," +
        "fitted:double,seas:array<double>>>")
    val zeros = array((0 until 7).map(_ => lit(0.0)): _*)
    val folded = daily
      .select(struct(col("day").cast("int").as("day"), col("x")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(aggregate(col("es"), acc0, (acc, e) => {
        val lst = element_at(acc, -1)
        val dw = pmod(e("day"), lit(7))
        val sdw = element_at(lst("seas"), dw + 1)
        val seeded = struct(e("day").as("day"), e("x").as("x"),
          e("x").as("level"), lit(0.0).as("trend"),
          e("x").as("fitted"), zeros.as("seas"))
        val second = struct(e("day").as("day"), e("x").as("x"),
          e("x").as("level"), (e("x") - lst("x")).as("trend"),
          lst("level").as("fitted"), lst("seas").as("seas"))
        val fit = lst("level") + lst("trend") + sdw
        val lvl = lit(alpha) * (e("x") - sdw) +
          lit(1 - alpha) * (lst("level") + lst("trend"))
        val snew = transform(sequence(lit(0), lit(6)), i =>
          when(i === dw,
            lit(gamma) * (e("x") - lvl) + lit(1 - gamma) * sdw)
            .otherwise(element_at(lst("seas"), i + 1)))
        val stepped = struct(e("day").as("day"), e("x").as("x"),
          lvl.as("level"),
          (lit(beta) * (lvl - lst("level")) +
            lit(1 - beta) * lst("trend")).as("trend"),
          fit.as("fitted"), snew.as("seas"))
        when(size(acc) === 0, array(seeded)).otherwise(concat(acc,
          array(when(size(acc) === 1, second).otherwise(stepped))))
      }).as("out"))
    val inSample = folded
      .select(explode(col("out")).as("o"))
      .select(col("o.day").cast("long").as("day"), lit(0L).as("horizon"),
        q(col("o.x"), 6).as("actual"), q(col("o.fitted"), 6).as("fitted"))
    val fc = folded
      .select(element_at(col("out"), -1).as("f"))
      .select(explode(sequence(lit(1), lit(h))).as("hz"), col("f"))
      .select((col("f.day") + col("hz")).cast("long").as("day"),
        col("hz").cast("long").as("horizon"),
        lit(null).cast("double").as("actual"),
        q(col("f.level") + col("hz") * col("f.trend") +
          element_at(col("f.seas"),
            pmod(col("f.day") + col("hz"), lit(7)) + 1), 6).as("fitted"))
    inSample.unionAll(fc).orderBy("day", "horizon")
  }

  /** Kalman local-level filter of the daily revenue series (W539) —
    * the state-space counterpart of [[holtForecast]]'s fixed-gain
    * smoothing: a random-walk level observed under noise (x_t = l_t +
    * ε, l_t = l_{t−1} + η), filtered by the exact scalar Kalman
    * recursion. Unlike Holt/EMA the GAIN is itself state — it starts
    * at 1 (all trust in the first observation, seeded P₀ = R) and
    * relaxes monotonically to the steady-state Riccati fixed point, so
    * early days are tracked and later days smoothed, which no
    * constant-α smoother can do. Per step: P⁻ = P + Q; K = P⁻/(P⁻+R);
    * l ← l + K(x − l); P ← (1−K)·P⁻ — four IEEE-exact +,−,×,÷ per day
    * written in the precise op order the oracle's recursive CTE
    * replays, so both engines walk bit-identical doubles (the
    * [[hwForecast]] determinism contract). Surfaced: the one-step
    * prediction (prior mean), filtered level, gain, and posterior
    * variance, all 1e-6-quantized. Corpus-bound work is one day-keyed
    * exact-grid aggregation; the fold is O(days) at any event volume.
    */
  def kalmanFilter(s: SparkSession, dir: String, qVar: Double = 0.5,
                   rVar: Double = 2.0): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg((sum(col("v6")).cast("double") / lit(1e6)).as("x"))
    val acc0 = array().cast(
      "array<struct<day:int,x:double,pred:double,level:double," +
        "p:double,gain:double>>")
    val folded = daily
      .select(struct(col("day").cast("int").as("day"), col("x")).as("e"))
      .agg(sort_array(collect_list(col("e"))).as("es"))
      .select(aggregate(col("es"), acc0, (acc, e) => {
        val lst = element_at(acc, -1)
        val seeded = struct(e("day").as("day"), e("x").as("x"),
          e("x").as("pred"), e("x").as("level"),
          lit(rVar).as("p"), lit(1.0).as("gain"))
        val pp = lst("p") + lit(qVar)
        val k = pp / (pp + lit(rVar))
        val stepped = struct(e("day").as("day"), e("x").as("x"),
          lst("level").as("pred"),
          (lst("level") + k * (e("x") - lst("level"))).as("level"),
          ((lit(1.0) - k) * pp).as("p"), k.as("gain"))
        when(size(acc) === 0, array(seeded))
          .otherwise(concat(acc, array(stepped)))
      }).as("out"))
    folded
      .select(explode(col("out")).as("o"))
      .select(col("o.day").cast("long").as("day"),
        q(col("o.x"), 6).as("actual"), q(col("o.pred"), 6).as("pred"),
        q(col("o.level"), 6).as("filtered"),
        q(col("o.gain"), 6).as("gain"), q(col("o.p"), 6).as("p_var"))
      .orderBy("day")
  }

  /** O'Brien–Fleming group-sequential monitor (W325) — the "can we
    * stop the A/B test early?" readout: four interim looks at the
    * time-quartile cutoffs, each comparing the hash arms' cumulative
    * value means by a Welch z, against the OBF spending boundary
    * z·√(K/k) (z = 2.024 for K = 4 looks, two-sided α ≈ 0.05 — the
    * standard tabled constant). Naive repeated peeking at 1.96
    * inflates false positives ~3×; OBF is the classical fix. Exact
    * machinery: per-quartile sufficient stats (one scan), cumulated
    * over a 4-row window, then EVERYTHING decision-grade is integer:
    * the arm-mean gap `d6` = csa div na − csb div nb (exact integral
    * division of the DECIMAL sums — never a >2⁵³ int→double cast,
    * which is hugeint-conversion version-sensitive in some engines and
    * hash-failed the r5 surface on the driver's DuckDB, VERDICT r5
    * #1), the pooled-variance grid `vp12` = Σ Vₓ div (nₓ²(nₓ−1)) with
    * Vₓ = nₓ·Σx² − (Σx)² exact, and `crossed` by the cross-multiplied
    * integer test d6²·k·10⁶ ≥ 2024²·K·vp12 (2.024² = 4096576/10⁶
    * exactly) — no division, no sqrt in the decision. The surfaced
    * z = d6/√vp12 and boundary are derived doubles built ONLY from
    * the exact ≤2⁵³ integers via IEEE-correctly-rounded −,÷,√ — no
    * libm, deterministic on any engine. O(1) rows after one scan.
    */
  def obfSequential(s: SparkSession, dir: String,
                    looks: Int = 4): DataFrame = {
    val dec = "decimal(38,0)"
    val zobf = 2.024
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(unix_timestamp(col("ts")).as("t"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"),
        (pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L),
          lit(100L)) < 50).cast("long").as("isA"))
    val bounds = ev.agg(min("t").as("t0"), max("t").as("t1"))
    // quartile index 1..K; the last look takes the remainder
    val qk = least(
      floor((col("t") - col("t0")).cast("double") /
        ((col("t1") - col("t0") + 1).cast("double") / lit(looks)))
        .cast("long") + 1, lit(looks.toLong))
    val byQ = ev.crossJoin(broadcast(bounds))
      .select(qk.as("k"), col("vi"), col("isA"))
      .groupBy("k")
      .agg(sum(col("isA")).as("ka"),
        sum(lit(1L) - col("isA")).as("kb"),
        sum(when(col("isA") === 1, col("vi")).otherwise(0L).cast(dec))
          .as("sa"),
        sum(when(col("isA") === 0, col("vi")).otherwise(0L).cast(dec))
          .as("sb"),
        sum(when(col("isA") === 1, col("vi")).otherwise(0L).cast(dec) *
          when(col("isA") === 1, col("vi")).otherwise(0L).cast(dec))
          .as("sa2"),
        sum(when(col("isA") === 0, col("vi")).otherwise(0L).cast(dec) *
          when(col("isA") === 0, col("vi")).otherwise(0L).cast(dec))
          .as("sb2"))
    val w = Window.orderBy("k")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = byQ
      .select(col("k"),
        sum(col("ka")).over(w).as("na"), sum(col("kb")).over(w).as("nb"),
        sum(col("sa")).over(w).as("csa"), sum(col("sb")).over(w).as("csb"),
        sum(col("sa2")).over(w).as("csa2"),
        sum(col("sb2")).over(w).as("csb2"))
    // integer-reduce BEFORE any double: micro-unit means by exact
    // integral division; per-arm variance-of-mean on the 1e12 grid as
    // V = n·Σx²−(Σx)² (exact DECIMAL) div n²(n−1). The reduced LONGs
    // convert to double exactly (int64→double is hardware-rounded
    // identically everywhere), unlike the r5 HUGEINT-moment casts.
    val red = cum
      .withColumn("ma6", expr("csa div na"))
      .withColumn("mb6", expr("csb div nb"))
      .withColumn("va", col("na").cast(dec) * col("csa2") -
        col("csa") * col("csa"))
      .withColumn("vb", col("nb").cast(dec) * col("csb2") -
        col("csb") * col("csb"))
      .withColumn("pa12", expr(
        "va div (cast(na as decimal(38,0)) * na * (na - 1))"))
      .withColumn("pb12", expr(
        "vb div (cast(nb as decimal(38,0)) * nb * (nb - 1))"))
      .withColumn("d6", col("ma6") - col("mb6"))
      .withColumn("vp12", col("pa12") + col("pb12"))
    val zq = when(col("vp12") > 0,
      q(col("d6").cast("double") / sqrt(col("vp12").cast("double")), 6))
      .otherwise(lit(0.0))
    val bnd = q(lit(zobf) * sqrt(lit(looks.toDouble) /
      col("k").cast("double")), 6)
    // division-free decision: z² ≥ boundary² cross-multiplied onto
    // exact integers (2.024² = 4096576/1e6)
    val crossed = (col("vp12") > 0) &&
      (col("d6").cast(dec) * col("d6") * col("k") * lit(1000000L) >=
        lit(4096576L).cast(dec) * lit(looks.toLong) * col("vp12"))
    red.select(col("k").as("look"), col("na").as("n_a"),
        col("nb").as("n_b"), col("d6"), col("vp12"),
        zq.as("z"), bnd.as("boundary"),
        crossed.cast("long").as("crossed"))
      .orderBy("look")
  }

  /** Neyman-optimal stratified allocation (W332) — the sampling
    * design table: given a budget of `n` rows, allocate per stratum
    * ∝ N_h·σ_h (Neyman 1934) and surface it against proportional
    * allocation, plus the design effect (Var_prop/Var_neyman =
    * N·ΣN_hσ_h² / (ΣN_hσ_h)²) that says how much the σ-aware design
    * buys. The planning step in front of every [[Relational]]
    * stratified-sample job — high-variance strata (here: event types
    * with wild `value` spread) deserve more budget than their row
    * share. σ_h rides exact DECIMAL moments and one sqrt (correctly
    * rounded IEEE — no grid needed); the allocation weights quantize
    * to 1e-6 LONGs so their sum is order-free. One partial-agg scan.
    */
  def neymanAllocation(s: SparkSession, dir: String,
                       n: Long = 1000L): DataFrame = {
    val dec = "decimal(38,0)"
    val st = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("nh"),
        sum(col("vi").cast(dec)).as("sv"),
        sum(col("vi").cast(dec) * col("vi").cast(dec)).as("sv2"))
    val sd = sqrt((col("sv2").cast("double") -
      col("sv").cast("double") * col("sv").cast("double") /
        col("nh")) / col("nh")) / lit(1e6)
    val withW = st
      .withColumn("sd", sd)
      .withColumn("w6",
        floor(col("nh") * col("sd") * lit(1e6) + lit(0.5)).cast("long"))
      .localCheckpoint() // totals + the final table read it
    val tot = withW.agg(sum(col("nh")).as("nn"), sum(col("w6")).as("sw6"),
      sum(floor(col("nh") * col("sd") * col("sd") * lit(1e6) + lit(0.5))
        .cast("long")).as("svv6"))
    withW.crossJoin(broadcast(tot))
      .select(col("event_type"), col("nh").as("n_rows"),
        q(col("sd"), 6).as("sd"),
        floor(lit(n).cast("double") * col("w6") / col("sw6") + lit(0.5))
          .cast("long").as("n_neyman"),
        floor(lit(n).cast("double") * col("nh") / col("nn") + lit(0.5))
          .cast("long").as("n_proportional"),
        q(col("nn").cast("double") * col("svv6") /
          (col("sw6").cast("double") / lit(1e3) *
            (col("sw6").cast("double") / lit(1e3))), 6)
          .as("design_effect"))
      .orderBy("event_type")
  }

  /** Sample-ratio-mismatch guardrail (W334) — the first check every
    * experimentation platform runs before reading ANY metric: do the
    * arm sizes match the declared 50/50 split? A mismatched ratio
    * means assignment is broken (bot filtering, logging loss,
    * redirect bugs) and every downstream readout ([[cupedAdjust]],
    * [[obfSequential]], [[welchTtest]]) is invalid. One-cell χ² =
    * (n_a − n_b)²/(n_a + n_b) against the declared even split, on
    * exact USER counts (assignment is per-user — row counts would
    * double-weight heavy users); flagged at the 3.841 two-sided 5%
    * critical value, compared on quantized grids.
    */
  def abSrmCheck(s: SparkSession, dir: String): DataFrame = {
    val arms = Tables.events(s, dir)
      .select(col("user_id"),
        (pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L),
          lit(100L)) < 50).cast("long").as("isA"))
      .groupBy("user_id").agg(max(col("isA")).as("isA"))
      .agg(sum(col("isA")).as("na"),
        sum(lit(1L) - col("isA")).as("nb"))
    val d = col("na") - col("nb")
    val chi2 = d.cast("double") * d.cast("double") /
      (col("na") + col("nb")).cast("double")
    arms.select(col("na").as("n_a"), col("nb").as("n_b"),
      q(chi2, 6).as("chi2"),
      (q(chi2, 6) > lit(3.841)).cast("long").as("srm_flag"))
  }

  /** Mann–Kendall monotonic-trend test (W335) on the daily series —
    * the non-parametric answer to "is activity really growing?" that
    * [[Relational]]'s OLS trend can't give under heavy tails or
    * step changes: S = Σ_{i<j} sign(y_j − y_i) needs no linearity or
    * error model. S and the tie-corrected variance Var(S) =
    * [n(n−1)(2n+5) − Σt(t−1)(2t+5)]/18 are EXACT integers (the /18
    * stays rational until the final z), so the only double is the
    * normal z = (S ∓ 1)/√Var. The pair sum is span² over the
    * day-bounded series — the ts_motif cost class; the corpus pays
    * one day-keyed count.
    */
  def mannKendall(s: SparkSession, dir: String): DataFrame = {
    val daily = CacheScope.track(Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()) // pair join (both sides) + ties + n read it
    val sPairs = daily.select(col("day").as("d1"), col("y").as("y1"))
      .join(daily.select(col("day").as("d2"), col("y").as("y2")),
        col("d1") < col("d2"))
      .agg(sum(signum(col("y2") - col("y1")).cast("long")).as("s"),
        count(lit(1)).as("n_pairs"))
    val n = daily.agg(count(lit(1)).as("n"))
    val ties = daily.groupBy("y").agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum(col("t") * (col("t") - 1) *
        (lit(2L) * col("t") + 5)), lit(0L)).as("tsum"))
    val var18 = (col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)
      - col("tsum"))
    // continuity correction toward zero; z on the exact-int chain
    val sAdj = when(col("s") > 0, col("s") - 1)
      .when(col("s") < 0, col("s") + 1).otherwise(lit(0L))
    // an all-tied series has Var(S) = 0 exactly (S is 0 too): z ≔ 0
    val z = when(var18 > 0, q(sAdj.cast("double") /
      sqrt(var18.cast("double") / lit(18.0)), 6)).otherwise(lit(0.0))
    sPairs.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
      .select(col("n"), col("s"), z.as("z"),
        (abs(z) > lit(1.959964)).cast("long").as("trend_flag"))
  }

  /** Matrix-profile-style motif + discord discovery (W328) over the
    * daily event-count series: the closest pair of z-normalized
    * 7-day windows (the MOTIF — a repeated weekly shape) and the
    * window whose nearest neighbor is farthest (the DISCORD — the
    * most anomalous week, the subsequence upgrade of
    * [[madAnomalies]]' pointwise flags). Trivial matches (overlap:
    * |i−j| < 4) are excluded, the matrix-profile convention.
    * Numerics: window z-scores land on a 1e-6 LONG grid (means/vars
    * from exact integer sums; zero-variance windows z≡0, decided by
    * an exact integer comparison), so every pairwise distance is
    * EXACT LONG arithmetic and argmin/argmax tie-break on (dist, i,
    * j) bit-identically. The series is day-bounded, so the all-pairs
    * join is span²— a few thousand rows at a century of days; the
    * corpus-bound work is one day-keyed count.
    */
  def tsMotif(s: SparkSession, dir: String, w: Int = 7,
              excl: Int = 4): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    // windows: start s, exact integer values in offset order
    val win = daily
      .select(explode(sequence(lit(0), lit(w - 1))).as("o"), col("day"),
        col("y"))
      .select((col("day") - col("o")).as("st"), col("o"), col("y"))
      .groupBy("st")
      .agg(count(lit(1)).as("nw"),
        sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("syy"),
        sort_array(collect_list(struct(col("o"), col("y")))).as("vs"))
      .filter(col("nw") === w)
    // z on the 1e-6 grid; flat windows (w·Σy² == (Σy)², exact) → z≡0
    val mean = col("sy").cast("double") / lit(w.toDouble)
    val varw = (col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double") /
        lit(w.toDouble)) / lit(w.toDouble)
    val zq = CacheScope.track(win
      .select(col("st"),
        when(col("syy") * lit(w.toLong) === col("sy") * col("sy"),
          transform(col("vs"), _ => lit(0L)))
          .otherwise(transform(col("vs"), v =>
            floor((v("y") - mean) / sqrt(varw) * lit(1e6) + lit(0.5))
              .cast("long"))).as("z"))
      .persist()) // both sides of the all-pairs join
    val dist = aggregate(
      zip_with(col("za"), col("zb"), (a, b) => (a - b) * (a - b)),
      lit(0L), _ + _)
    val pd = zq.select(col("st").as("ia"), col("z").as("za"))
      .join(zq.select(col("st").as("ib"), col("z").as("zb")),
        abs(col("ia") - col("ib")) >= excl)
      .select(col("ia"), col("ib"), dist.as("d2"))
      .localCheckpoint() // motif argmin + discord argmax both scan it
    val motif = pd.filter(col("ia") < col("ib"))
      .orderBy(col("d2"), col("ia"), col("ib")).limit(1)
      .select(col("ia").as("motif_i"), col("ib").as("motif_j"),
        q(col("d2").cast("double") / lit(1e12), 6).as("motif_dist"))
    val nn = pd.groupBy("ia")
      .agg(min(struct(col("d2"), col("ib"))).as("m"))
      .select(col("ia"), col("m.d2").as("d2"), col("m.ib").as("ib"))
    val discord = nn
      .orderBy(col("d2").desc, col("ia")).limit(1)
      .select(col("ia").as("discord_i"), col("ib").as("discord_nn"),
        q(col("d2").cast("double") / lit(1e12), 6).as("discord_dist"))
    motif.crossJoin(discord)
  }

  /** Two-sample log-rank test (W321) — does time-to-purchase differ
    * between the hash arms? The censoring-correct significance test
    * on top of [[kaplanMeier]]'s curves (comparing mean durations
    * ignores censoring; comparing KM curves by eye ignores sampling
    * error — the log-rank statistic is the standard answer). At each
    * death time: observed arm-A deaths vs the hypergeometric
    * expectation d·n_A/n, variance d·n_A·n_B·(n−d)/(n²(n−1)); χ² =
    * (ΣO−ΣE)²/ΣV. Risk sets fall out of ONE cumulative window over
    * per-time arm counts (no per-user resort); E and V are quantized
    * to 1e-9 LONGs per death time so their sums are order-free, with
    * every input an exact integer count. One user-keyed reduction is
    * the only corpus-bound stage; the test runs on O(distinct
    * durations) rows.
    */
  def logrankTest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy("user_id").agg(
      to_date(min(col("ts"))).as("d0"),
      to_date(min(when(col("event_type") === "purchase", col("ts"))))
        .as("dconv"))
    val horizon = ev.agg(to_date(max(col("ts"))).as("dmax"))
    val durs = perUser.crossJoin(broadcast(horizon))
      .select(
        when(col("dconv").isNotNull, datediff(col("dconv"), col("d0")))
          .otherwise(datediff(col("dmax"), col("d0"))).as("t"),
        when(col("dconv").isNotNull, 1L).otherwise(0L).as("event"),
        (pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L),
          lit(100L)) < 50).cast("long").as("isA"))
    val byT = durs.groupBy("t").agg(
      sum(col("event") * col("isA")).as("d1"),
      sum(col("event") * (lit(1L) - col("isA"))).as("d2"),
      sum(col("isA")).as("k1"),
      sum(lit(1L) - col("isA")).as("k2"))
    val tot = byT.agg(sum(col("k1")).as("na"), sum(col("k2")).as("nb"))
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val risk = byT.crossJoin(broadcast(tot))
      .withColumn("n1", col("na") - coalesce(sum(col("k1")).over(w),
        lit(0L)))
      .withColumn("n2", col("nb") - coalesce(sum(col("k2")).over(w),
        lit(0L)))
      .withColumn("n", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .filter(col("d") > 0 && col("n") > 1)
    val e19 = floor(col("d").cast("double") * col("n1") / col("n")
      * lit(1e9) + lit(0.5)).cast("long")
    val v9 = floor(col("d").cast("double") * col("n1") * col("n2")
      * (col("n") - col("d")) /
      (col("n").cast("double") * col("n") * (col("n") - 1))
      * lit(1e9) + lit(0.5)).cast("long")
    val agg = risk.agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
      sum(col("d1")).as("obs_a"), sum(e19).as("e9"), sum(v9).as("vv9"))
    val diff = col("obs_a").cast("double") - col("e9").cast("double") /
      lit(1e9)
    agg.select(col("n_a"), col("n_b"), col("obs_a"),
      q(col("e9").cast("double") / lit(1e9), 6).as("expected_a"),
      when(col("vv9") > 0,
        q(diff * diff / (col("vv9").cast("double") / lit(1e9)), 6))
        .otherwise(lit(0.0)).as("chi2"))
  }

  /** Kendall tau-b rank correlation (W338) between the daily counts of
    * two event types — the tie-corrected, outlier-immune companion to
    * [[typeDailyCorr]]'s Pearson r and the pairwise-concordance dual of
    * [[mannKendall]]'s one-series trend S. Concordant/discordant/tied
    * pair counts are EXACT integers over the day-bounded pair join
    * (span² rows — the ts_motif cost class); tie corrections T_a, T_b
    * come from exact per-value group counts; the only double is the
    * final τ_b = (C−D)/√((n₀−T_a)(n₀−T_b)), floor-quantized at 1e-6.
    * Corpus-bound work is one day-keyed count per type.
    */
  def kendallTau(s: SparkSession, dir: String,
                 typeA: String = "click",
                 typeB: String = "purchase"): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
    def daily(t: String, out: String) =
      ev.filter(col("event_type") === t)
        .groupBy("day").agg(count(lit(1)).as(out))
    val joined = CacheScope.track(daily(typeA, "a")
      .join(daily(typeB, "b").withColumnRenamed("day", "day_b"),
        col("day") === col("day_b"), "full_outer")
      .select(coalesce(col("day"), col("day_b")).as("day"),
        coalesce(col("a"), lit(0L)).as("a"),
        coalesce(col("b"), lit(0L)).as("b"))
      .persist()) // pair join (both sides) + tie groups + n read it
    val sgA = signum(col("a2") - col("a1")).cast("long")
    val sgB = signum(col("b2") - col("b1")).cast("long")
    val pairs = joined.select(col("day").as("d1"), col("a").as("a1"),
        col("b").as("b1"))
      .join(joined.select(col("day").as("d2"), col("a").as("a2"),
        col("b").as("b2")), col("d1") < col("d2"))
      .agg(count(lit(1)).as("n0"),
        sum((sgA * sgB === 1).cast("long")).as("c"),
        sum((sgA * sgB === -1).cast("long")).as("d"))
    // t(t-1) is even, so /2 in double is exact (t < 9e7) before the
    // LONG cast — keeps t_a/t_b integer-typed end to end
    def tieSum(v: String) = joined.groupBy(col(v)).agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum((col("t") * (col("t") - 1) / 2).cast("long")),
        lit(0L)).as(s"t_$v"))
    val n = joined.agg(count(lit(1)).as("n_days"))
    val den = sqrt((col("n0") - col("t_a")).cast("double") *
      (col("n0") - col("t_b")).cast("double"))
    pairs.crossJoin(broadcast(tieSum("a"))).crossJoin(broadcast(tieSum("b")))
      .crossJoin(broadcast(n))
      .select(col("n_days"), col("c").as("concordant"),
        col("d").as("discordant"),
        when((col("n0") > col("t_a")) && (col("n0") > col("t_b")),
          q((col("c") - col("d")).cast("double") / den, 6))
          .otherwise(lit(0.0)).as("tau_b"))
  }

  /** Beta-binomial empirical-Bayes rate shrinkage (W341): per-user
    * purchase rates x/n pulled toward the population prior fitted by
    * method-of-moments — the fix for "a 1/1 user outranks a 95/100
    * user" that every small-denominator leaderboard needs (and the
    * same machinery a curation pipeline uses to rank sources by
    * defect rate). Prior: α = m·κ, β = (1−m)·κ with
    * κ = m(1−m)/v − 1 from the mean/variance of the 1e-9-grid rates;
    * posterior mean (α+x)/(α+β+n) per user.
    *
    * Determinism: each rate is floor-quantized to a 1e-9 LONG before
    * the moment sums (Σr, Σr² in LONG/DECIMAL — order-free), so m, v,
    * α, β are doubles computed from exact integers by one fixed
    * expression; per-user posteriors quantize at 1e-6 before the
    * (rate desc, user) top-k cut. Degenerate prior (zero variance or
    * κ ≤ 0 — decided on the EXACT integer v18) falls back to the raw
    * rate, flagged. One user-keyed aggregation is the corpus-bound
    * stage; moments and the k·1 prior are broadcast scalars.
    */
  def betaBinomialEb(s: SparkSession, dir: String, k: Int = 15): DataFrame = {
    val per = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        sum((col("event_type") === "purchase").cast("long")).as("x"))
      .withColumn("r9",
        floor(col("x").cast("double") / col("n") * lit(1e9) + lit(0.5))
          .cast("long"))
      .persist()
    CacheScope.register(per) // eager: moments + the scored cut read it
    val mo = per.agg(count(lit(1)).as("ku"), sum(col("r9")).as("s1"),
      sum(col("r9").cast("decimal(38,0)") * col("r9")).as("s2"))
    // v18 exact: ku·Σr² − (Σr)² in DECIMAL(38,0); prior validity is an
    // integer-exact decision, the double κ only feeds the posterior
    val v18x = (col("ku").cast("decimal(38,0)") * col("s2") -
      col("s1").cast("decimal(38,0)") * col("s1"))
    val m = col("s1").cast("double") / col("ku") / lit(1e9)
    val v = v18x.cast("double") / col("ku") / col("ku") / lit(1e18)
    val kap = m * (lit(1.0) - m) / v - lit(1.0)
    val prior = mo.select(col("ku"), (v18x > 0).as("hasVar"),
      when(v18x > 0, kap).otherwise(lit(0.0)).as("kap"),
      when(v18x > 0, m * kap).otherwise(lit(0.0)).as("alpha"),
      when(v18x > 0, (lit(1.0) - m) * kap).otherwise(lit(0.0)).as("beta"))
    val shrinkOk = col("hasVar") && col("kap") > 0
    per.crossJoin(broadcast(prior))
      .select(col("user_id"), col("n").as("n_events"), col("x").as("n_conv"),
        q(col("x").cast("double") / col("n"), 6).as("raw_rate"),
        when(shrinkOk,
          q((col("alpha") + col("x")) /
            (col("alpha") + col("beta") + col("n")), 6))
          .otherwise(q(col("x").cast("double") / col("n"), 6))
          .as("eb_rate"),
        shrinkOk.cast("long").as("shrunk"))
      .orderBy(col("eb_rate").desc, col("user_id"))
      .limit(k)
  }

  /** Partial autocorrelation of the daily series (W342), lags 1–3 by
    * the unrolled Durbin–Levinson recursion over the lag-correlogram —
    * the "is lag-2 structure real or just lag-1 twice?" diagnostic
    * that picks AR order where [[acfDaily]] alone cannot (an AR(1)
    * series has geometric ACF at ALL lags but PACF ≈ 0 past lag 1).
    * φ11 = r1; φ22 = (r2−r1²)/(1−r1²); φ33 from the order-2
    * prediction coefficients.
    *
    * Each lag's Pearson r lands on a 1e-9 LONG grid first, so the DL
    * arithmetic is one fixed double expression over exact integers —
    * engine-order-free; the 1−r1² ≠ 0 guard is decided on the EXACT
    * LONG 1e18−r9₁². Same cost shape as `acf_daily`: the corpus pays
    * one day-keyed count, the lag join is spine-sized.
    */
  def pacfDaily(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // eager: spine bounds + both join sides
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val lags = s.range(1, 4).select(col("id").cast("int").as("lag"))
    val st = daily.crossJoin(broadcast(lags))
      .select(col("lag"), (col("day") + col("lag")).as("day"),
        col("y").as("x"))
      .join(daily.select(col("day"), col("y")), Seq("day"))
      .groupBy("lag").agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val nD = col("n").cast("double")
    val num = nD * col("sxy") - col("sx") * col("sy")
    val den = sqrt(nD * col("sxx") - col("sx") * col("sx")) *
      sqrt(nD * col("syy") - col("sy") * col("sy"))
    val r9 = floor(num / den * lit(1e9) + lit(0.5)).cast("long")
    def rAt(l: Int) = max(when(col("lag") === l, r9)).as(s"r9_$l")
    val one = st.agg(rAt(1), rAt(2), rAt(3))
    def r(l: Int) = col(s"r9_$l").cast("double") / lit(1e9)
    val d2ok = lit(1000000000000000000L) - col("r9_1") * col("r9_1") =!= 0
    val phi22 = (r(2) - r(1) * r(1)) / (lit(1.0) - r(1) * r(1))
    val wide = one.select(q(r(1), 6).as("acf1"), q(r(2), 6).as("acf2"),
      q(r(3), 6).as("acf3"), q(r(1), 6).as("p1"),
      when(d2ok, q(phi22, 6)).otherwise(lit(0.0)).as("p2"),
      when(d2ok, phi22).otherwise(lit(0.0)).as("phi22x"),
      when(d2ok, r(1) - phi22 * r(1)).otherwise(r(1)).as("phi21x"),
      r(1).as("r1d"), r(2).as("r2d"), r(3).as("r3d"))
    val d3 = lit(1.0) - col("phi21x") * col("r1d") -
      col("phi22x") * col("r2d")
    val p3 = wide.select(col("acf1"), col("acf2"), col("acf3"),
      col("p1"), col("p2"),
      when(d3 =!= 0.0, q((col("r3d") - col("phi21x") * col("r2d") -
        col("phi22x") * col("r1d")) / d3, 6)).otherwise(lit(0.0)).as("p3"))
    p3.select(expr(
      "stack(3, 1L, acf1, p1, 2L, acf2, p2, 3L, acf3, p3)" +
        " AS (lag, acf, pacf)"))
      .orderBy("lag")
  }

  /** One-way ANOVA (W343) over `value` by event type — the k-group
    * generalization of [[welchTtest]]'s two-sample comparison: does any
    * event type's mean spend differ from the rest? Values land on the
    * 1e-6 grid, then every sum the F statistic needs is exact integer
    * arithmetic: per-group (n, Σv, Σv²) in DECIMAL(38,0), values
    * CENTERED on the integer grand-mean floor before squaring so the
    * between-group sum of squares is a sum of small deviation terms
    * rather than a catastrophic cancellation of near-equal huge ones.
    * The only cross-group reduction of non-integers — Σ_g (Σd_g)²/n_g —
    * is floor-quantized onto a coarse 1e6 integer grid per group (grid²
    * units; coarse keeps the LONG floor overflow-safe at any SF while
    * the induced error, ≤ k·1e-6 in value² units, sits at the output's
    * own 1e-6 resolution) and summed as LONGs, so group arrival order
    * cannot perturb low bits.
    * SST comes from global exact sums in one fixed expression;
    * SSW = SST − SSB. One row: k, N, ssb, ssw, f_stat (1e-6 grid).
    * Scale: two value-keyed aggregations; the k-row group table is a
    * broadcast scalar. Nothing corpus-bound ever sorts.
    */
  def anovaOneway(s: SparkSession, dir: String): DataFrame = {
    val vi = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    val tot = vi.agg(count(lit(1)).as("nn"),
      sum(col("vi").cast("decimal(38,0)")).as("sv"))
    // integer center: floor of the grand mean on the 1e-6 grid — the
    // shift keeps d, Σd, Σd² exact while shrinking them ~1e6-fold
    val c0 = tot.select(col("nn"),
      floor(col("sv").cast("double") / col("nn")).cast("long").as("c0"))
    val d = vi.crossJoin(broadcast(c0))
      .select(col("event_type"), col("nn"),
        (col("vi") - col("c0")).as("d"))
    val g = d.groupBy("event_type", "nn")
      .agg(count(lit(1)).as("n"),
        sum(col("d").cast("decimal(38,0)")).as("sd"),
        sum((col("d") * col("d")).cast("decimal(38,0)")).as("sd2"))
    // per-group rational term on the coarse integer grid, summed exactly
    val term6 = floor(col("sd").cast("double") * col("sd").cast("double")
      / col("n") / lit(1e6))
    val agg = g.groupBy("nn")
      .agg(count(lit(1)).as("k"), sum(col("n")).as("n_check"),
        sum(col("sd")).as("sdt"), sum(col("sd2")).as("sd2t"),
        sum(term6).as("b6"))
    val sst = col("sd2t").cast("double") -
      col("sdt").cast("double") * col("sdt").cast("double") / col("nn")
    val ssb = col("b6").cast("double") * lit(1e6) -
      col("sdt").cast("double") * col("sdt").cast("double") / col("nn")
    val ssw = sst - ssb
    agg.select(col("k").as("k_groups"), col("nn").as("n_total"),
      q(ssb / lit(1e12), 6).as("ss_between"),
      q(ssw / lit(1e12), 6).as("ss_within"),
      when(ssw > 0 && col("k") > 1 && col("nn") > col("k"),
        q((ssb / (col("k") - 1)) / (ssw / (col("nn") - col("k"))), 6))
        .otherwise(lit(0.0)).as("f_stat"))
  }

  /** Kruskal–Wallis rank test (W344) — [[anovaOneway]]'s distribution-
    * free sibling (and the k-group extension of a Mann–Whitney U):
    * ranks replace values, so a heavy-tailed spend column can't let a
    * few whales drive the statistic. Mid-ranks are kept EXACT as
    * 2·rank integers (cum-before·2 + t + 1 — always integral), the
    * per-group rank sums are exact DECIMAL, the one cross-group
    * rational reduction Σ R_g²/n_g is floor-truncated to unit integers
    * per group (ranks are N-bounded so the LONG floor is safe to
    * N ≈ 2×10⁶ groups-worth of N³; beyond that the rank spine needs
    * histogram compression anyway) and summed as LONGs, and the tie
    * correction Σ(t³−t) is pure integer. H then
    * divides exact terms once:
    * H = 12/(N(N+1))·ΣR²/n − 3(N+1), H_adj = H/(1−Σ(t³−t)/(N³−N)).
    * Scale: the rank spine is one aggregation per DISTINCT value (a
    * global ordered prefix-sum over the value histogram — value-
    * cardinality-bound, not row-bound), then one broadcast-joined
    * group aggregation.
    */
  def kruskalWallis(s: SparkSession, dir: String): DataFrame = {
    val vi = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    val hist = vi.groupBy("vi").agg(count(lit(1)).as("t"))
    val w = Window.orderBy("vi").rowsBetween(Window.unboundedPreceding, -1)
    // 2·midrank = 2·(#strictly-below) + t + 1: integral, tie-exact
    val ranked = hist.withColumn("below",
        coalesce(sum(col("t")).over(w), lit(0L)))
      .select(col("vi"), col("t"),
        (col("below") * 2 + col("t") + 1).as("r2"))
    val gv = vi.groupBy("event_type", "vi").agg(count(lit(1)).as("tg"))
    val rg = gv.join(ranked, "vi")
      .groupBy("event_type")
      .agg(sum((col("tg") * col("r2")).cast("decimal(38,0)")).as("r2g"),
        sum(col("tg")).as("n"))
    val term1 = floor(col("r2g").cast("double") / 2 *
      col("r2g").cast("double") / 2 / col("n"))
    val ties = hist.filter(col("t") > 1)
      .agg(coalesce(sum((col("t") * col("t") * col("t") - col("t"))
        .cast("decimal(38,0)")), lit(0).cast("decimal(38,0)")).as("tt"))
    val agg = rg.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(term1).as("b1"))
      .crossJoin(broadcast(ties))
    val nD = col("nn").cast("double")
    val h = lit(12.0) / (nD * (nD + 1)) *
      col("b1").cast("double") - lit(3.0) * (nD + 1)
    val corr = lit(1.0) - col("tt").cast("double") / (nD * nD * nD - nD)
    agg.select(col("k").as("k_groups"), col("nn").as("n_total"),
      q(h, 6).as("h_stat"),
      when(corr > 0, q(h / corr, 6)).otherwise(q(h, 6)).as("h_adj"))
  }

  /** Wald–Wolfowitz runs test (W345) on the daily event-count series:
    * is the sign of day-over-day change random, or does the series
    * streak (trend/cycle) more or less than chance? Complements
    * [[mannKendall]] (monotone trend) with a pure serial-dependence
    * probe. Zero-change days drop (standard practice); the statistic
    * is exact integers (runs R, n⁺, n⁻) until one final z expression:
    * z = (R − μ)/σ, μ = 2n⁺n⁻/n + 1,
    * σ² = 2n⁺n⁻(2n⁺n⁻ − n)/(n²(n−1)).
    * Scale: one day-keyed count, then a day-cardinality spine — the
    * same cost class as every daily-series op here.
    */
  def runsTest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val wd = Window.orderBy("day")
    val sg = daily
      .withColumn("sg", signum(col("c") - lag(col("c"), 1).over(wd))
        .cast("long"))
      .filter(col("sg").isNotNull && col("sg") =!= 0)
    val runs = sg
      .withColumn("brk",
        when(col("sg") === lag(col("sg"), 1).over(wd), 0L).otherwise(1L))
      .agg(sum(col("brk")).as("r"),
        sum(when(col("sg") === 1, 1L).otherwise(0L)).as("n_up"),
        sum(when(col("sg") === -1, 1L).otherwise(0L)).as("n_down"))
    val n1 = col("n_up").cast("double")
    val n2 = col("n_down").cast("double")
    val nT = n1 + n2
    val mu = lit(2.0) * n1 * n2 / nT + 1
    val s2 = lit(2.0) * n1 * n2 * (lit(2.0) * n1 * n2 - nT) /
      (nT * nT * (nT - 1))
    runs.select(col("n_up"), col("n_down"), col("r").as("runs"),
      when(col("n_up") > 0 && col("n_down") > 0 && nT > 1 && s2 > 0,
        q((col("r").cast("double") - mu) / sqrt(s2), 6))
        .otherwise(lit(0.0)).as("z"))
  }

  /** Page–Hinkley change detector (W346) on the daily event-count
    * series — the sequential drift monitor a feed-health pipeline runs
    * where [[cusumChangepoint]] locates a single retrospective break:
    * PH_t = Σ_{i≤t}(x_i − x̄_i − δ) against its running minimum, alarm
    * when the gap exceeds λ. The deviation is quantized to a 1e-9
    * integer grid per day BEFORE the cumulative sum (x̄_i = S_i/i is
    * rational, and neither engine guarantees left-to-right double
    * accumulation inside a window frame), so PH, its prefix minimum,
    * and the alarm comparison are all exact LONG arithmetic.
    * Output: days observed, max excursion (1e-6 grid), first alarm
    * day index (NULL-free: -1 when no alarm), alarm count.
    * Scale: day-cardinality spine after one day-keyed count.
    */
  def pageHinkley(s: SparkSession, dir: String,
                  delta: Double = 2.0, lambda: Double = 40.0): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("c"))
    val wd = Window.orderBy("day")
    val cum = daily
      .withColumn("i", row_number().over(wd).cast("long"))
      .withColumn("sc", sum(col("c")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
    val dev9 = floor((col("c").cast("double") -
      col("sc").cast("double") / col("i") - lit(delta)) * lit(1e9) +
      lit(0.5)).cast("long")
    val ph = cum.withColumn("d9", dev9)
      .withColumn("ph9", sum(col("d9")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("mn9", min(col("ph9")).over(
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("exc9", col("ph9") - col("mn9"))
    val lam9 = (lambda * 1e9).toLong
    ph.agg(count(lit(1)).as("n_days"),
      q(max(col("exc9")).cast("double") / lit(1e9), 6).as("max_excursion"),
      coalesce(min(when(col("exc9") > lam9, col("i"))), lit(-1L))
        .as("first_alarm_i"),
      sum(when(col("exc9") > lam9, 1L).otherwise(0L)).as("alarm_days"))
  }

  /** Two-sample Cramér–von Mises test (W354) between the value
    * distributions of two event types — the whole-distribution
    * companion to [[ksStatistic]]'s single-worst-gap view (CvM
    * integrates the squared ECDF gap, so it sees diffuse shifts KS
    * misses). Computational form on combined ranks (Anderson 1962):
    * U = n·Σᵢ(rᵢ−i)² + m·Σⱼ(sⱼ−j)²,
    * T = U/(nm(n+m)) − (4nm−1)/(6(n+m)).
    * Ranks come from one TOTAL order — (value-grid, type, event_id) —
    * so ties across samples break deterministically (documented: the
    * classic statistic assumes continuity; the fixed tiebreak makes
    * the discrete version exact and engine-order-free). Everything to
    * U is integer (squared rank gaps summed in DECIMAL); T divides
    * exact terms once. Scale: one global rank window over the
    * two-type subset, the sort-bound stage every rank test shares.
    */
  def cvmTest(s: SparkSession, dir: String,
              typeA: String = "click", typeB: String = "purchase")
  : DataFrame = {
    val vi = Tables.events(s, dir)
      .filter(col("value").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select(col("event_type"), col("event_id"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    val ord = Seq(col("vi"), col("event_type"), col("event_id"))
    val ranked = vi
      .withColumn("r", row_number().over(Window.orderBy(ord: _*))
        .cast("long"))
      .withColumn("i", row_number().over(
        Window.partitionBy("event_type").orderBy(ord: _*)).cast("long"))
    val g = ranked.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(((col("r") - col("i")) * (col("r") - col("i")))
          .cast("decimal(38,0)")).as("sq"))
    def side(sfx: String, t: String) = g.filter(col("event_type") === t)
      .select(col("n").as(s"n_$sfx"), col("sq").as(s"sq_$sfx"))
    val u = col("n_a").cast("decimal(38,0)") * col("sq_a") +
      col("n_b").cast("decimal(38,0)") * col("sq_b")
    val (na, nb) = (col("n_a").cast("double"), col("n_b").cast("double"))
    val t = u.cast("double") / (na * nb * (na + nb)) -
      (lit(4.0) * na * nb - 1) / (lit(6.0) * (na + nb))
    side("a", typeA).crossJoin(side("b", typeB))
      .select(col("n_a"), col("n_b"), q(t, 6).as("t_stat"))
  }

  /** Exact third/fourth standardized moments (W355) of value per event
    * type — the shape profile (skewness, excess kurtosis) that
    * [[Relational.statsAgg]]'s variance tier stops short of, and the
    * screen run before trusting any normal-theory test on a spend
    * column. Values land on a 1e-2 grid (coarse ON PURPOSE: the grid
    * bounds |d|⁴ under LONG per row at any value scale), are centered
    * on the per-group integer mean floor, and all four power sums
    * accumulate in DECIMAL(38,0) — the moment expansion
    * m₂ = Σd²/n − m₁², m₃ = Σd³/n − 3m₁Σd²/n + 2m₁³,
    * m₄ = Σd⁴/n − 4m₁Σd³/n + 6m₁²Σd²/n − 3m₁⁴
    * then runs per group as one fixed expression (skew uses
    * m₂·√m₂, never libm pow). Scale: two value-keyed aggregations
    * (mean pass, moment pass) with the k-row mean table broadcast.
    */
  def skewKurtosis(s: SparkSession, dir: String): DataFrame = {
    val vi = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("vi"))
    val c = vi.groupBy(col("event_type").as("et"))
      .agg(floor(sum(col("vi").cast("decimal(38,0)")).cast("double") /
        count(lit(1))).cast("long").as("c0"))
    val d = vi.join(broadcast(c), col("event_type") === col("et"))
      .select(col("event_type"), col("c0"), (col("vi") - col("c0")).as("d"))
    val g = d.groupBy("event_type", "c0")
      .agg(count(lit(1)).as("n"),
        sum(col("d").cast("decimal(38,0)")).as("s1"),
        sum((col("d") * col("d")).cast("decimal(38,0)")).as("s2"),
        sum((col("d") * col("d") * col("d")).cast("decimal(38,0)"))
          .as("s3"),
        sum((col("d") * col("d") * col("d") * col("d"))
          .cast("decimal(38,0)")).as("s4"))
    val n = col("n").cast("double")
    val m1 = col("s1").cast("double") / n
    val m2 = col("s2").cast("double") / n - m1 * m1
    val m3 = col("s3").cast("double") / n -
      lit(3.0) * m1 * (col("s2").cast("double") / n) +
      lit(2.0) * m1 * m1 * m1
    val m4 = col("s4").cast("double") / n -
      lit(4.0) * m1 * (col("s3").cast("double") / n) +
      lit(6.0) * m1 * m1 * (col("s2").cast("double") / n) -
      lit(3.0) * m1 * m1 * m1 * m1
    g.select(col("event_type"), col("n"),
        q((col("c0").cast("double") + m1) / 100, 6).as("mean"),
        when(m2 > 0, q(m3 / (m2 * sqrt(m2)), 6)).otherwise(lit(0.0))
          .as("skewness"),
        when(m2 > 0, q(m4 / (m2 * m2) - 3, 6)).otherwise(lit(0.0))
          .as("kurtosis_excess"))
      .orderBy("event_type")
  }

  /** Ljung–Box whiteness test (W357) on the daily event-count series:
    * are the residual autocorrelations jointly zero, or does the
    * series still carry structure a forecast should have absorbed?
    * The classic post-fit diagnostic ([[acfDaily]] eyeballs single
    * lags; this tests them JOINTLY). The trick that keeps it exact:
    * with z_t = n·y_t − Σy (integers), every classic autocorrelation
    * is ρ_k = Σ z_t·z_{t+k} / Σ z_t² — the n² in numerator and
    * denominator cancels, so ρ_k is a ratio of two exact DECIMAL
    * sums, no float mean ever subtracted. Each Q term
    * ρ_k²/(n−k) lands on a 1e-12 LONG grid before the cross-lag
    * cumulative sum; Q_h = n(n+2)·Σ_{k≤h}. One row per lag with its
    * ρ and the cumulative Q. Scale: day-spine-bound after one
    * day-keyed count; the lag fan-out is a broadcast of h rows.
    */
  def ljungBox(s: SparkSession, dir: String, maxLag: Int = 7): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // eager: bounds + spine + totals read it
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val tot = dense.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val z = dense.crossJoin(broadcast(tot))
      .select(col("day"), col("n"),
        (col("n") * col("y") - col("sy")).as("z"))
      .persist()
    CacheScope.register(z) // eager: A_0 + both sides of the lag join
    val a0 = z.agg(sum((col("z") * col("z")).cast("decimal(38,0)"))
      .as("a0"), max(col("n")).as("n"))
    val lags = s.range(1, maxLag + 1).select(col("id").cast("int").as("lag"))
    val ak = z.crossJoin(broadcast(lags))
      .select(col("lag"), (col("day") + col("lag")).as("day"),
        col("z").as("z1"))
      .join(z.select(col("day"), col("z").as("z2")), Seq("day"))
      .groupBy("lag")
      .agg(sum((col("z1") * col("z2")).cast("decimal(38,0)")).as("ak"))
    val rho = col("ak").cast("double") / col("a0").cast("double")
    val t12 = floor(rho * rho / (col("n") - col("lag")) * lit(1e12))
    val n = col("n").cast("double")
    val cum = ak.crossJoin(broadcast(a0))
      .withColumn("t12", t12)
      .withColumn("c12", sum(col("t12")).over(
        Window.orderBy("lag").rowsBetween(Window.unboundedPreceding, 0)))
    cum.select(col("lag"), q(rho, 6).as("rho"),
        q(n * (n + 2) * (col("c12").cast("double") / lit(1e12)), 6)
          .as("q_stat"))
      .orderBy("lag")
  }

  /** Periodogram over candidate periods 2..`maxP` days (W358): DFT
    * power of the MEAN-REMOVED daily series at each period, top-3 by
    * power — the "is there a weekly cycle, or a 3-day one?" probe that
    * [[acfDaily]] answers only for lags you already suspected. Two
    * determinism guards: (a) the series is centered with the same
    * exact-integer z_t = n·y_t − Σy trick as [[ljungBox]] (no float
    * mean), and (b) the phase angle is reduced to 2π·((t mod p)/p)
    * BEFORE cos/sin — small arguments keep libm argument-reduction out
    * of play — and each z·cos / z·sin term lands on a 1e-6 LONG grid
    * before the per-period sums. Power = (C² + S²)/n² surfaces on the
    * 1e-6 grid. Scale: day-spine × (maxP−1) broadcast fan-out, two
    * keyed sums.
    */
  def periodogramTopk(s: SparkSession, dir: String, maxP: Int = 14,
                      k: Int = 3): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0)
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"),
        coalesce(col("y"), lit(0L)).as("y"))
    val tot = dense.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val z = dense.crossJoin(broadcast(tot))
      .select(col("t"), col("n"),
        (col("n") * col("y") - col("sy")).as("z"))
    val ps = s.range(2, maxP + 1).select(col("id").cast("int").as("p"))
    val ang = lit(2.0 * math.Pi) *
      (pmod(col("t"), col("p")).cast("double") / col("p"))
    val terms = z.crossJoin(broadcast(ps))
      .select(col("p"), col("n"),
        floor(col("z") * cos(ang) * lit(1e6) + lit(0.5)).cast("long")
          .as("c6"),
        floor(col("z") * sin(ang) * lit(1e6) + lit(0.5)).cast("long")
          .as("s6"))
    val cS = col("cs").cast("double") / lit(1e6)
    val sS = col("ss").cast("double") / lit(1e6)
    val nD = col("n").cast("double")
    terms.groupBy("p", "n")
      .agg(sum(col("c6")).as("cs"), sum(col("s6")).as("ss"))
      .select(col("p").as("period"),
        q((cS * cS + sS * sS) / (nD * nD), 6).as("power"))
      .orderBy(col("power").desc, col("period"))
      .limit(k)
  }

  /** Rescaled-range Hurst exponent (W365) of the daily series: is the
    * process mean-reverting (H<0.5), a random walk (H≈0.5), or
    * long-range persistent (H>0.5)? — the memory diagnostic the
    * ACF/periodogram pair can't answer about SCALING of fluctuations.
    * Per block of size m the whole R/S collapses to integers: with
    * z_t = m·y_t − Σ_block y, R/S = (max−min of cumsum z)/√(m·Σy²−
    * (Σy)²) — the m's cancel, so R and the variance radicand are
    * exact LONGs and each block contributes one quantized 1e-9 ratio.
    * H is then the slope of (ln m, ln R̄/S̄) by the repo's HUGEINT-
    * exact OLS recipe (heaps_law, hill_tail_index). One row per block
    * size with its mean R/S, H broadcast onto each. Scale: day-spine
    * bound; the block cumsum windows partition by (m, block).
    */
  def hurstRs(s: SparkSession, dir: String,
              ms: Seq[Int] = Seq(5, 10, 15)): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0)
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"),
        coalesce(col("y"), lit(0L)).as("y"))
    val msDf = s.range(1)
      .select(explode(array(ms.map(m => lit(m.toLong)): _*)).as("m"))
    val base = dense.crossJoin(broadcast(msDf))
      .withColumn("blk", floor(col("t") / col("m")).cast("long"))
    // full blocks only: a ragged tail block would bias R/S low
    val nDays = dense.agg(count(lit(1)).as("nn"))
    val full = base.crossJoin(broadcast(nDays))
      .filter(col("blk") < floor(col("nn") / col("m")).cast("long"))
    val bs = full.groupBy("m", "blk")
      .agg(sum(col("y")).as("sy"),
        sum(col("y") * col("y")).as("sy2"))
    val z = full.join(bs, Seq("m", "blk"))
      .select(col("m"), col("blk"), col("t"),
        (col("m") * col("y") - col("sy")).as("z"),
        (col("m") * col("sy2") - col("sy") * col("sy")).as("d2"))
    val cum = z.withColumn("cz", sum(col("z")).over(
      Window.partitionBy("m", "blk").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val perBlock = cum.groupBy("m", "blk", "d2")
      .agg((max(col("cz")) - min(col("cz"))).as("rz"))
      .filter(col("d2") > 0)
      .select(col("m"),
        floor(col("rz").cast("double") / sqrt(col("d2")) * lit(1e9) +
          lit(0.5)).cast("long").as("rs9"))
    val perM = perBlock.groupBy("m")
      .agg(count(lit(1)).as("n_blocks"), sum(col("rs9")).as("srs9"))
      .select(col("m"), col("n_blocks"),
        (col("srs9").cast("double") / col("n_blocks") / lit(1e9))
          .as("rs_mean"))
    val pts = perM.select(col("m"), col("n_blocks"), col("rs_mean"),
      floor(log(col("m").cast("double")) * lit(1e9) + lit(0.5))
        .cast("long").as("lx"),
      floor(log(col("rs_mean")) * lit(1e9) + lit(0.5)).cast("long")
        .as("ly"))
    val fit = pts.agg(count(lit(1)).cast("decimal(38,0)").as("kk"),
      sum(col("lx").cast("decimal(38,0)")).as("sx"),
      sum(col("ly").cast("decimal(38,0)")).as("sy"),
      sum(col("lx").cast("decimal(38,0)") * col("ly")).as("sxy"),
      sum(col("lx").cast("decimal(38,0)") * col("lx")).as("sxx"))
    val num = (col("kk") * col("sxy") - col("sx") * col("sy"))
      .cast("double")
    val den = (col("kk") * col("sxx") - col("sx") * col("sx"))
      .cast("double")
    pts.crossJoin(broadcast(fit))
      .select(col("m"), col("n_blocks"), q(col("rs_mean"), 6).as("rs_mean"),
        when(den =!= 0.0, q(num / den, 6)).otherwise(lit(0.0)).as("hurst"))
      .orderBy("m")
  }

  /** OLS influence diagnostics (W366) for the daily-count trend fit:
    * which single days are DRIVING the slope [[olsTrend]] reports?
    * Leverage collapses to exact integers via the same z-trick as
    * [[ljungBox]]: with dt = n·t − Σt, h_t = 1/n + dt²/Σdt² (the n²'s
    * cancel), so only the residual e_t = y − (a + b·t) is a double —
    * from the exact-integer slope/intercept ratios — and each e²
    * lands on a 1e-6 LONG grid before the σ̂² sum. Cook's distance
    * D = e²·h/(p·σ̂²·(1−h)²) with p=2. Top-`k` by (D, day). Scale:
    * day-spine bound, two passes (fit scalars broadcast, then the
    * per-day screen).
    */
  def olsInfluence(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0)
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(dense) // eager: fit + residual pass read it
    val tot = dense.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
      sum(col("y")).as("sy"),
      sum(col("t") * col("t")).as("stt"),
      sum(col("t") * col("y")).as("sty"))
    val b = (col("n") * col("sty") - col("st") * col("sy"))
      .cast("double") /
      (col("n") * col("stt") - col("st") * col("st")).cast("double")
    val a = (col("sy").cast("double") - b * col("st")) / col("n")
    val e = col("y").cast("double") - (a + b * col("t"))
    val dt = col("n") * col("t") - col("st")
    val sdd = col("n") * (col("n") * col("stt") - col("st") * col("st"))
    val h = lit(1.0) / col("n") +
      (col("dt2")).cast("double") / col("sdd").cast("double")
    val rows0 = dense.crossJoin(broadcast(tot))
      .select(col("t"), col("y"), col("n"), e.as("e"),
        (dt * dt).as("dt2"), sdd.as("sdd"),
        floor(e * e * lit(1e6) + lit(0.5)).cast("long").as("e6"))
    val s2 = rows0.agg(max(col("n")).as("nx"), sum(col("e6")).as("se6"))
      .select((col("se6").cast("double") / lit(1e6) / (col("nx") - 2))
        .as("sig2"))
    val d = col("e") * col("e") * h /
      (lit(2.0) * col("sig2") * (lit(1.0) - h) * (lit(1.0) - h))
    rows0.crossJoin(broadcast(s2))
      .select(col("t").as("day_index"), col("y"),
        q(col("e"), 6).as("residual"), q(h, 6).as("leverage"),
        q(d, 6).as("cooks_d"))
      .orderBy(col("cooks_d").desc, col("day_index"))
      .limit(k)
  }

  /** Yule–Walker AR(2) fit + one-step forecast (W370) on the day-
    * densified daily count series — the autoregressive answer that
    * [[acfDaily]] only diagnoses and [[holtForecast]]'s exponential
    * smoothing can't give (Holt tracks level/trend; AR(2) captures the
    * oscillatory/mean-reverting dynamics the ACF actually shows). The
    * whole fit is THREE exact integer scalars: with z_t = n·y_t − Σy
    * (the n-scaled centering that never leaves the integers), a =
    * Σ z_t z_{t+1}, b = Σ z_t z_{t+2}, c = Σ z_t² give the Yule–Walker
    * solution φ₁ = a(c−b)/(c²−a²), φ₂ = (bc−a²)/(c²−a²) — each ONE
    * division of exact DECIMAL(38,0) terms (z ~ n·y keeps c² ≈ 1e24
    * far inside 38 digits). Forecast ŷ = (Σy + φ₁z_n + φ₂z_{n−1})/n
    * combines them in one fixed-order scalar expression. Scale: a
    * day-keyed agg then two lag-1/lag-2 self-joins on the day spine —
    * day-cardinality, not row-cardinality.
    */
  def ar2Forecast(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // eager: spine bounds + 3 join sides
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(daily)
    val tot = daily.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
      max(col("day")).as("dmax"))
    val z = daily.crossJoin(broadcast(tot))
      .select(col("day"), col("n"), col("sy"), col("dmax"),
        (col("n") * col("y") - col("sy")).as("z"))
    def lagged(k: Int) = z.select((col("day") - k).as("day"),
      col("z").as(s"z$k"))
    val st = z
      .join(lagged(1), Seq("day"), "left")
      .join(lagged(2), Seq("day"), "left")
      .groupBy("n", "sy", "dmax")
      .agg(
        sum((col("z") * coalesce(col("z1"), lit(0L)))
          .cast("decimal(38,0)")).as("a"),
        sum((col("z") * coalesce(col("z2"), lit(0L)))
          .cast("decimal(38,0)")).as("b"),
        sum((col("z") * col("z")).cast("decimal(38,0)")).as("c"),
        max(when(col("day") === col("dmax"), col("z"))).as("zn"),
        max(when(col("day") === col("dmax") - 1, col("z"))).as("zn1"))
    val den = (col("c") * col("c") - col("a") * col("a"))
    val phi1 = (col("a") * (col("c") - col("b"))).cast("double") /
      den.cast("double")
    val phi2 = (col("b") * col("c") - col("a") * col("a"))
      .cast("double") / den.cast("double")
    val nD = col("n").cast("double")
    val yhat = (col("sy").cast("double") + phi1 * col("zn") +
      phi2 * col("zn1")) / nD
    st.select(col("n").as("n_days"),
      q(col("sy").cast("double") / nD, 6).as("mean_daily"),
      when(den.cast("double") > 0, q(phi1, 6)).otherwise(lit(0.0))
        .as("phi1"),
      when(den.cast("double") > 0, q(phi2, 6)).otherwise(lit(0.0))
        .as("phi2"),
      when(den.cast("double") > 0, q(yhat, 4))
        .otherwise(q(col("sy").cast("double") / nD, 4)).as("forecast"))
  }

  /** Tukey-fence outlier audit (W373) per event type — the boxplot
    * screen (x < Q1 − 1.5·IQR or x > Q3 + 1.5·IQR) every metrics
    * pipeline runs before trusting a mean, and the rule-based cousin
    * of [[madAnomalies]]' robust z. Values land on the 1e-2 integer
    * grid; Q1/Q3 are exact lower-quartile picks by cross-multiplied
    * cumulative threshold (4·cum ≥ n / 4·cum ≥ 3n — the
    * [[Relational.weightedMedian]] rule); the fences stay integral on
    * a doubled grid (2·fence_lo = 5Q1 − 3Q3, 2·fence_hi = 5Q3 − 3Q1),
    * so the outlier predicate 2·v < 5Q1−3Q3 compares exact LONGs —
    * no 1.5·IQR double ever exists. Scale: per-(type, cents)
    * histogram agg, then type-cardinality reductions.
    */
  def tukeyOutliers(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(1e2) + lit(0.5)).cast("long").as("v2"))
      .groupBy("event_type", "v2").agg(count(lit(1)).as("w"))
      .persist()
    CacheScope.register(hist) // quartile pick + outlier count read it
    val tot = hist.groupBy(col("event_type").as("et"))
      .agg(sum(col("w")).as("nt"))
    val qs = hist
      .withColumn("cw", sum(col("w")).over(
        Window.partitionBy("event_type").orderBy("v2")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .join(broadcast(tot), col("event_type") === col("et"))
      .groupBy("event_type")
      .agg(max(col("nt")).as("n"),
        min(when(col("cw") * 4 >= col("nt"), col("v2"))).as("q1"),
        min(when(col("cw") * 4 >= col("nt") * 3, col("v2"))).as("q3"))
    hist.join(broadcast(qs), "event_type")
      .groupBy(col("event_type"), col("n"), col("q1"), col("q3"))
      .agg(
        sum(when(col("v2") * 2 < col("q1") * 5 - col("q3") * 3,
          col("w")).otherwise(0L)).as("n_low"),
        sum(when(col("v2") * 2 > col("q3") * 5 - col("q1") * 3,
          col("w")).otherwise(0L)).as("n_high"))
      .select(col("event_type"), col("n").as("n_values"),
        q(col("q1").cast("double") / 100, 2).as("q1"),
        q(col("q3").cast("double") / 100, 2).as("q3"),
        col("n_low"), col("n_high"),
        q((col("n_low") + col("n_high")).cast("double") /
          col("n").cast("double"), 6).as("outlier_share"))
      .orderBy("event_type")
  }

  /** Mann–Whitney U rank-sum test + Cliff's delta (W376): do two
    * event types' `value` distributions differ in LOCATION, without
    * the normality Welch assumes, and with an assumption-free effect
    * size (Cliff's δ = P(X>Y) − P(X<Y)) next to the p-proxy? The
    * rank machinery never ranks ROWS: values land on the 1e-6 grid,
    * the test runs over the (value → per-group count) table, and
    * midranks come from the cumulative-count identity — a tie group
    * of t rows starting after c others contributes ca·(2c + t + 1)/2
    * to R₁. Keeping the DOUBLED sum makes every quantity an exact
    * integer: 2U₁ = Σca·(2c+t+1) − n₁(n₁+1). The tie-corrected normal
    * z and δ = 2U₁/(n₁n₂) − 1 each divide exact integers once.
    * Scale: one value-keyed agg, then a window + final agg over
    * DISTINCT values (grid-bounded, ≪ rows at any SF) — the only
    * global order is over that bounded table.
    */
  def mannWhitney(s: SparkSession, dir: String,
                  typeA: String = "click", typeB: String = "purchase")
  : DataFrame = {
    val vi = Tables.events(s, dir)
      .filter(col("value").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    val byV = vi.groupBy("vi").agg(
      count(lit(1)).as("ct"),
      sum(when(col("event_type") === typeA, lit(1L))
        .otherwise(lit(0L))).as("ca"))
    val cb = coalesce(sum(col("ct")).over(
      Window.orderBy("vi").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val agg = byV
      .select(col("ct"), col("ca"), cb.as("cb"))
      .agg(sum(col("ca")).as("na"), sum(col("ct")).as("ntot"),
        sum((col("ca") * (lit(2L) * col("cb") + col("ct") + lit(1L)))
          .cast("decimal(38,0)")).as("r2"),
        sum((col("ct") * col("ct") * col("ct") - col("ct"))
          .cast("decimal(38,0)")).as("tie"))
    val na = col("na").cast("double")
    val nb = (col("ntot") - col("na")).cast("double")
    val nn = col("ntot").cast("double")
    val u2 = col("r2") - (col("na") * (col("na") + lit(1L)))
      .cast("decimal(38,0)")
    val u = u2.cast("double") / lit(2.0)
    val sigma2 = na * nb / lit(12.0) *
      ((nn + 1) - col("tie").cast("double") / (nn * (nn - 1)))
    agg.select(col("na").as("n_a"),
      (col("ntot") - col("na")).as("n_b"),
      u2.cast("long").as("u2_stat"),
      q((u - na * nb / 2) / sqrt(sigma2), 6).as("z_stat"),
      q(lit(2.0) * u / (na * nb) - 1, 6).as("cliffs_delta"))
  }

  /** Jarque–Bera normality screen (W377) per event type: the
    * one-number gate (JB = n/6·(S² + K²/4), p = exp(−JB/2) from the
    * χ²₂ survival function — closed form, no special functions) run
    * before any of the normal-theory tests on this board
    * ([[welchTtest]], the z in [[mannWhitney]]) are trusted. S and K
    * come from the exact-moment recipe of [[skewKurtosis]] — 1e-2
    * grid, integer-mean centering, DECIMAL power sums, the m₂/m₃/m₄
    * expansion as one fixed expression — so both engines compute JB
    * from identical sufficient statistics. Scale: two value-keyed
    * aggregations with a broadcast k-row mean table.
    */
  def jarqueBera(s: SparkSession, dir: String): DataFrame = {
    val vi = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("vi"))
    val c = vi.groupBy(col("event_type").as("et"))
      .agg(floor(sum(col("vi").cast("decimal(38,0)")).cast("double") /
        count(lit(1))).cast("long").as("c0"))
    val d = vi.join(broadcast(c), col("event_type") === col("et"))
      .select(col("event_type"), (col("vi") - col("c0")).as("d"))
    val g = d.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("d").cast("decimal(38,0)")).as("s1"),
        sum((col("d") * col("d")).cast("decimal(38,0)")).as("s2"),
        sum((col("d") * col("d") * col("d")).cast("decimal(38,0)"))
          .as("s3"),
        sum((col("d") * col("d") * col("d") * col("d"))
          .cast("decimal(38,0)")).as("s4"))
    val n = col("n").cast("double")
    // identical evaluation order to [[skewKurtosis]]/its oracle: the
    // raw moments r_k = s_k/n are materialized FIRST, then the central
    // expansion — regrouping (3·m1·s2)/n vs 3·m1·(s2/n) is a last-ulp
    // difference that would break the cross-engine hash
    val m1 = col("s1").cast("double") / n
    val r2 = col("s2").cast("double") / n
    val r3 = col("s3").cast("double") / n
    val r4 = col("s4").cast("double") / n
    val m2 = r2 - m1 * m1
    val m3 = r3 - lit(3.0) * m1 * r2 + lit(2.0) * m1 * m1 * m1
    val m4 = r4 - lit(4.0) * m1 * r3 + lit(6.0) * m1 * m1 * r2 -
      lit(3.0) * m1 * m1 * m1 * m1
    val sk = m3 / (m2 * sqrt(m2))
    val ku = m4 / (m2 * m2) - lit(3.0)
    val jb = n / 6 * (sk * sk + ku * ku / 4)
    g.select(col("event_type"), col("n"),
        q(jb, 4).as("jb_stat"), q(exp(-jb / 2), 9).as("p_approx"))
      .orderBy("event_type")
  }

  /** Székely's two-sample energy distance (W379): 2E|X−Y| − E|X−X'|
    * − E|Y−Y'| between two event types' `value` distributions — the
    * metric two-sample test that is zero IFF the distributions match
    * (KS sees only the max CDF gap; this integrates ALL of it). No
    * pair enumeration anywhere: in 1-D every expectation is a CDF
    * integral (E|X−Y| = ∫ F_A(1−F_B) + F_B(1−F_A)), so one window
    * pass over the DISTINCT grid values with per-group cumulative
    * counts and the gap to the next value yields all three integrals
    * as exact cross-multiplied integer sums (cum·(n−cum)·gap in
    * DECIMAL); each divides once by its n²-scale denominator and the
    * 1e6 grid. Scale: value-keyed agg + a grid-bounded window, same
    * shape as [[mannWhitney]] — never the O(n²) kernel sum.
    */
  def energyDistance(s: SparkSession, dir: String,
                     typeA: String = "click", typeB: String = "purchase")
  : DataFrame = {
    val vi = Tables.events(s, dir)
      .filter(col("value").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    val byV = vi.groupBy("vi").agg(
      sum(when(col("event_type") === typeA, lit(1L)).otherwise(lit(0L)))
        .as("ca"),
      sum(when(col("event_type") === typeB, lit(1L)).otherwise(lit(0L)))
        .as("cbn"))
    val w = Window.orderBy("vi")
    val run = byV
      .withColumn("cum_a", sum(col("ca")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_b", sum(col("cbn")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("gap", lead(col("vi"), 1).over(w) - col("vi"))
      .filter(col("gap").isNotNull)
    val tot = byV.agg(sum(col("ca")).as("n_a"), sum(col("cbn")).as("n_b"))
    val sums = run.crossJoin(broadcast(tot))
      .agg(first(col("n_a")).as("n_a"), first(col("n_b")).as("n_b"),
        sum((col("gap") * (col("cum_a") * (col("n_b") - col("cum_b")) +
          col("cum_b") * (col("n_a") - col("cum_a"))))
          .cast("decimal(38,0)")).as("ixy"),
        sum((col("gap") * col("cum_a") * (col("n_a") - col("cum_a")))
          .cast("decimal(38,0)")).as("ixx"),
        sum((col("gap") * col("cum_b") * (col("n_b") - col("cum_b")))
          .cast("decimal(38,0)")).as("iyy"))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val exy = col("ixy").cast("double") / (na * nb * lit(1e6))
    val exx = lit(2.0) * col("ixx").cast("double") / (na * na * lit(1e6))
    val eyy = lit(2.0) * col("iyy").cast("double") / (nb * nb * lit(1e6))
    sums.select(col("n_a"), col("n_b"), q(exy, 6).as("e_xy"),
      q(lit(2.0) * exy - exx - eyy, 6).as("e_dist"))
  }

  /** Lead–lag cross-correlation (W380) between the daily click and
    * purchase count series at lags −3..+3 — the "does engagement
    * LEAD conversion" probe run before any attribution model, and
    * the lag picker for [[diffInDiff]]-style designs. Mirrors
    * [[acfDaily]]'s recipe exactly: densified day spine (missing
    * days are real zeros — dropping them fabricates correlation),
    * one broadcast lag spine, per-lag Pearson from exact integer
    * sufficient statistics, one quantized division per lag. Negative
    * lags mean clicks lead. Scale: two day-keyed aggs + a
    * |days|×|lags| join — day-bounded, never row-bounded.
    */
  def crossCorrDaily(s: SparkSession, dir: String,
                     typeA: String = "click", typeB: String = "purchase",
                     maxLag: Int = 3): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .filter(col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(
        sum(when(col("event_type") === typeA, lit(1L)).otherwise(lit(0L)))
          .as("xa"),
        sum(when(col("event_type") === typeB, lit(1L)).otherwise(lit(0L)))
          .as("xb"))
      .persist()
    CacheScope.register(daily0) // eager: spine bounds + both join sides
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val daily = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("xa"), lit(0L)).as("xa"),
        coalesce(col("xb"), lit(0L)).as("xb"))
    val lags = s.range(-maxLag, maxLag + 1L)
      .select(col("id").cast("int").as("lag"))
    val pairs = daily.select(col("day"), col("xa").as("x"))
      .crossJoin(broadcast(lags))
      .select(col("lag"), (col("day") + col("lag")).as("day"), col("x"))
      .join(daily.select(col("day"), col("xb").as("y")), Seq("day"))
    val st = pairs.groupBy("lag").agg(
      count(lit(1)).as("n"),
      sum("x").as("sx"), sum("y").as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("y") * col("y")).as("syy"),
      sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val num = n * col("sxy") - col("sx") * col("sy")
    val den = sqrt(n * col("sxx") - col("sx") * col("sx")) *
      sqrt(n * col("syy") - col("sy") * col("sy"))
    // thin edge lags (or a constant series) have a zero-variance side:
    // surface 0.0, not NaN — the caller reads "no linear signal"
    st.select(col("lag"), col("n").as("n_pairs"),
        when(den > 0, q(num / den, 6)).otherwise(lit(0.0)).as("ccf"))
      .orderBy("lag")
  }

  /** Theil's uncertainty coefficient U(type|hour) (W381): what
    * FRACTION of event-type entropy does knowing the hour remove?
    * The normalized, asymmetric cousin of [[mutualInformation]] —
    * U = I(T;H)/H(T) ∈ [0,1] reads as "% of type uncertainty
    * explained by time-of-day", comparable across tables where raw
    * nats are not. Both I and H(T) reuse the MI determinism recipe:
    * every per-cell/per-type term is quantized to a 1e-6 integer
    * grid BEFORE its sum, so accumulation order cannot perturb bits,
    * and the final ratio divides the two grid sums once. Scale:
    * three keyed aggs over a (types × 24)-bounded joint table.
    */
  def theilU(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type").as("t"), hour(col("ts")).as("h"))
      .persist()
    CacheScope.register(ev) // eager: joint + both marginals read it
    val joint = ev.groupBy("t", "h").agg(count(lit(1)).as("njh"))
    val mt = ev.groupBy("t").agg(count(lit(1)).as("nt"))
    val mh = ev.groupBy("h").agg(count(lit(1)).as("nh"))
    val tot = ev.count()
    val mi = joint.join(broadcast(mt), "t").join(broadcast(mh), "h")
      .select(((col("njh").cast("double") / lit(tot.toDouble)) *
        log((col("njh").cast("double") * lit(tot.toDouble)) /
          (col("nt").cast("double") * col("nh").cast("double"))))
        .as("term"))
      .select(floor(col("term") * lit(1e6) + lit(0.5)).cast("long")
        .as("ti"))
      .agg(sum(col("ti")).as("mi6"))
    val ht = mt
      .select((-(col("nt").cast("double") / lit(tot.toDouble)) *
        log(col("nt").cast("double") / lit(tot.toDouble))).as("term"))
      .select(floor(col("term") * lit(1e6) + lit(0.5)).cast("long")
        .as("ti"))
      .agg(sum(col("ti")).as("ht6"))
    mi.crossJoin(ht).select(
      q(col("mi6").cast("double") / lit(1e6), 6).as("mi_nats"),
      q(col("ht6").cast("double") / lit(1e6), 6).as("h_type"),
      q(col("mi6").cast("double") / col("ht6").cast("double"), 6)
        .as("theil_u"))
  }

  /** Standardized effect sizes (W382) for the click-vs-purchase value
    * gap: Cohen's d (pooled sd), Hedges' g (small-sample J
    * correction, the meta-analysis standard), Glass's Δ (control-sd
    * only, for when variances differ — which [[brownForsythe]]
    * tests). The report a significance-only readout ([[welchTtest]])
    * always needs next to it: at 100 TB everything is "significant";
    * the effect size is what decides if anyone should care. All
    * sufficient statistics are exact 1e-6-grid DECIMAL sums; the
    * mean gap cross-multiplies to one exact rational before its
    * single division, and the three denominators are sqrt's of
    * exact-rational variances — a fixed expression both engines run
    * identically. Scale: one conditional aggregation, no join.
    */
  def effectSizes(s: SparkSession, dir: String,
                  typeA: String = "click", typeB: String = "purchase")
  : DataFrame = {
    val vi = Tables.events(s, dir)
      .filter(col("value").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select((col("event_type") === typeA).as("isa"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"))
    def side(p: org.apache.spark.sql.Column) = struct(
      sum(when(p, lit(1L)).otherwise(lit(0L))).as("n"),
      sum(when(p, col("vi")).otherwise(lit(0L)).cast("decimal(38,0)"))
        .as("s1"),
      sum(when(p, col("vi") * col("vi")).otherwise(lit(0L))
        .cast("decimal(38,0)")).as("s2"))
    val g = vi.agg(side(col("isa")).as("a"), side(!col("isa")).as("b"))
    def n(c: String) = col(s"$c.n").cast("double")
    def va(c: String) = (n(c) * col(s"$c.s2").cast("double") -
      col(s"$c.s1").cast("double") * col(s"$c.s1").cast("double")) /
      (n(c) * (n(c) - 1)) / lit(1e12)
    val gap = (col("a.s1").cast("double") * n("b") -
      col("b.s1").cast("double") * n("a")) / (n("a") * n("b")) / lit(1e6)
    val sp = sqrt(((n("a") - 1) * va("a") + (n("b") - 1) * va("b")) /
      (n("a") + n("b") - 2))
    val jf = lit(1.0) - lit(3.0) / (lit(4.0) * (n("a") + n("b")) - 9)
    g.select(col("a.n").as("n_a"), col("b.n").as("n_b"),
      q(gap / sp, 6).as("cohens_d"),
      q(jf * gap / sp, 6).as("hedges_g"),
      q(gap / sqrt(va("b")), 6).as("glass_delta"))
  }

  /** The trailing-`w` slice of the dense daily count series,
    * re-indexed t = 1..n ascending — the shared head of the batch-U
    * forecasters. Truncating to a fixed tail is what makes the
    * dyadic-weight trick exact: with α = ½ every SES weight is
    * 2^(e)/2^n, a ratio of REPRESENTABLE powers of two (via bit
    * shifts, never libm pow), and the dropped history carries weight
    * < 2^−w — below every surfaced grid. Windows here order DAYS
    * (spine-bounded), never rows.
    */
  /** 2^e as an exact LONG via a bit shift (e ≤ 62) — the dyadic-
    * weight primitive: ratios of these are exactly-representable
    * powers of two in both engines, with no libm pow anywhere.
    */
  private def pow2(e: org.apache.spark.sql.Column) =
    call_function("shiftleft", lit(1L), e.cast("int"))

  private def dailyTail(s: SparkSession, dir: String, w: Int)
  : DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0) // eager: spine bounds + the join read it
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    dense
      .withColumn("rd", row_number().over(Window.orderBy(col("day").desc)))
      .filter(col("rd") <= w)
      .withColumn("t", row_number().over(Window.orderBy(col("day")))
        .cast("long"))
      .select(col("day"), col("t"), col("y"))
  }

  /** Theta-method one-step forecast (W384, Assimakopoulos &
    * Nikolopoulos): average of the theta-0 line (the OLS trend
    * extrapolated to t = n+1) and an SES over the theta-2 line
    * z_t = 2y_t − trend(t) — the M3-winning "double the curvature,
    * smooth it, average with the trend" decomposition, next to the
    * pure-smoothing [[holtForecast]]. The trend fit is the repo's
    * exact-integer OLS (cross-multiplied LONG numerator/denominator,
    * one division each); the SES uses α = ½ over the trailing 48
    * days, so every weight is a bit-shift ratio 2^e/2^48 — exact in
    * both engines, no libm pow — and each weighted term is quantized
    * to a 1e-9 integer before the order-insensitive sum. Scale:
    * day-spine-bounded; one agg + one 48-row weighted reduction.
    */
  def thetaForecast(s: SparkSession, dir: String, w: Int = 48)
  : DataFrame = {
    val tail = dailyTail(s, dir, w).persist()
    CacheScope.register(tail) // eager: trend fit + SES both read it
    val st = tail.agg(count(lit(1)).as("n"),
      sum(col("t")).as("stt"), sum(col("y")).as("sy"),
      sum(col("t") * col("t")).as("st2"),
      sum(col("t") * col("y")).as("sty"))
    val nD = col("n").cast("double")
    val bHat = (nD * col("sty") - col("st").cast("double") * col("sy")) /
      (nD * col("st2") - col("st").cast("double") *
        col("st").cast("double"))
    val fit = st.select(col("n"), col("stt").as("st"), col("sy"),
        col("st2"), col("sty"))
      .select(col("n"), bHat.as("b"),
        ((col("sy").cast("double") - bHat * col("st").cast("double")) /
          col("n").cast("double")).as("a"))
    // SES(alpha=1/2) over z_t = 2y - (a + b t): weight(t) = 2^e/2^n
    // with e = max(t-1, 1) (the t=1 term keeps the init weight)
    val terms = tail.crossJoin(broadcast(fit))
      .select(col("n"), col("a"), col("b"),
        ((lit(2.0) * col("y") - (col("a") + col("b") * col("t"))) *
          (pow2(greatest(col("t") - 1, lit(1L))).cast("double") /
           pow2(col("n")).cast("double")))
          .as("term"))
      .select(col("n"), col("a"), col("b"),
        floor(col("term") * lit(1e9) + lit(0.5)).cast("long").as("t9"))
    terms.groupBy("n", "a", "b").agg(sum(col("t9")).as("ses9"))
      .select(col("n").as("n_days"), q(col("b"), 6).as("slope"),
        q(col("ses9").cast("double") / lit(1e9), 6).as("ses_theta2"),
        q((col("ses9").cast("double") / lit(1e9) +
          (col("a") + col("b") * (col("n") + 1).cast("double"))) / 2, 4)
          .as("forecast"))
  }

  /** Croston's method (W385) for intermittent demand: SES the
    * nonzero demand SIZES and the inter-demand INTERVALS separately
    * (both α = ½, dyadic bit-shift weights over the trailing 48
    * occurrences — the [[thetaForecast]] trick), then forecast
    * demand-per-day as their ratio. THE standard for sparse series
    * where plain SES chases zeros toward zero and a mean smears the
    * burst structure — at 100 TB this is per-SKU/per-shard demand
    * with mostly-empty days. Demand days come from the daily spine
    * of 'error' events; sequences are day-ordered, per-term 1e-9
    * quantized, summed as integers. Scale: day-bounded windows only.
    */
  def crostonForecast(s: SparkSession, dir: String,
                      eventType: String = "error", w: Int = 48)
  : DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type") === eventType)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("z"))
      .withColumn("p",
        col("day") - lag(col("day"), 1).over(Window.orderBy("day")))
      .persist()
    CacheScope.register(daily) // eager: both SES branches read it
    def ses(src: DataFrame, valueCol: String): DataFrame = {
      val tail = src
        .withColumn("rd",
          row_number().over(Window.orderBy(col("day").desc)))
        .filter(col("rd") <= w)
        .withColumn("t", row_number().over(Window.orderBy(col("day")))
          .cast("long"))
      val n1 = tail.agg(count(lit(1)).as("n"))
      tail.crossJoin(broadcast(n1))
        .select(col("n"),
          (col(valueCol).cast("double") *
            (pow2(greatest(col("t") - 1, lit(1L))).cast("double") /
             pow2(col("n")).cast("double")))
            .as("term"))
        .select(col("n"),
          floor(col("term") * lit(1e9) + lit(0.5)).cast("long").as("t9"))
        .groupBy("n").agg(sum(col("t9")).as("s9"))
        .select(col("n"),
          (col("s9").cast("double") / lit(1e9)).as("ses"))
    }
    val zs = ses(daily, "z")
      .select(col("n").as("n_demands"), col("ses").as("zs"))
    val ps = ses(daily.filter(col("p").isNotNull), "p")
      .select(col("n").as("n_gaps"), col("ses").as("psv"))
    zs.crossJoin(ps).select(col("n_demands"), col("n_gaps"),
      q(col("zs"), 6).as("z_ses"), q(col("psv"), 6).as("p_ses"),
      q(col("zs") / col("psv"), 6).as("croston"))
  }

  /** Spectral entropy (W386) of the daily series over the candidate-
    * period band p = 2..14: how CONCENTRATED is the periodogram? —
    * one number ([[periodogramTopk]] surfaces the top peaks; this
    * scores whether there IS a peak: H→0 pure cycle, H→1 white
    * noise). Reuses the periodogram's exact recipe (centered z =
    * n·y−Σy, per-term 1e-6-quantized cos/sin sums), pins each power
    * to its 1e-6 integer, normalizes by the integer total, and
    * accumulates −π·ln π on a per-term 1e-9 grid — every sum
    * order-insensitive. Flat series (all powers 0) surface H = 0
    * with a flag. Scale: day-spine × 13 periods.
    */
  def spectralEntropy(s: SparkSession, dir: String, maxP: Int = 14)
  : DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0)
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(col("d0"), explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"),
        coalesce(col("y"), lit(0L)).as("y"))
    val tot = dense.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val z = dense.crossJoin(broadcast(tot))
      .select(col("t"), col("n"),
        (col("n") * col("y") - col("sy")).as("z"))
    val ps = s.range(2, maxP + 1).select(col("id").cast("int").as("p"))
    val ang = lit(2.0 * math.Pi) *
      (pmod(col("t"), col("p")).cast("double") / col("p"))
    val pows = z.crossJoin(broadcast(ps))
      .select(col("p"), col("n"),
        floor(col("z") * cos(ang) * lit(1e6) + lit(0.5)).cast("long")
          .as("c6"),
        floor(col("z") * sin(ang) * lit(1e6) + lit(0.5)).cast("long")
          .as("s6"))
      .groupBy("p", "n")
      .agg(sum(col("c6")).as("cs"), sum(col("s6")).as("ss"))
      .select(col("p"),
        floor((col("cs").cast("double") / lit(1e6) *
            (col("cs").cast("double") / lit(1e6)) +
          col("ss").cast("double") / lit(1e6) *
            (col("ss").cast("double") / lit(1e6))) /
          (col("n").cast("double") * col("n").cast("double")) *
          lit(1e6) + lit(0.5)).cast("long").as("p6"))
    val total = pows.agg(sum(col("p6")).as("tp6"), count(lit(1)).as("k"))
    val h9 = pows.crossJoin(broadcast(total))
      .filter(col("p6") > 0)
      .select((-(col("p6").cast("double") / col("tp6").cast("double")) *
        log(col("p6").cast("double") / col("tp6").cast("double")))
        .as("term"))
      .select(floor(col("term") * lit(1e9) + lit(0.5)).cast("long")
        .as("t9"))
      .agg(coalesce(sum(col("t9")), lit(0L)).as("h9"))
    h9.crossJoin(total).select(col("k").as("n_periods"),
      (col("tp6") > 0).cast("long").as("defined"),
      q(col("h9").cast("double") / lit(1e9), 6).as("h_nats"),
      q(col("h9").cast("double") / lit(1e9) /
        log(col("k").cast("double")), 6).as("h_norm"))
  }

  /** Sample entropy SampEn(m=2, r = ⌊0.2σ⌋) (W387) of the daily
    * series — the regularity statistic: how much does knowing a
    * length-2 template's match predict the NEXT point matching too?
    * Low SampEn = structured/periodic, high = irregular; the
    * complexity axis the spectral tier ([[spectralEntropy]]) reads
    * in frequency space, read here in state space, self-match-free
    * (Richman & Moorman's fix to ApEn's bias). Template pairs come
    * from ONE i<j self-join over (y_t, y_{t+1}, y_{t+2}) lead
    * windows with exact-integer |Δ|≤r bands — O(D²) in DAYS (spine-
    * bounded, never rows), with r from the exact centered variance.
    * A and B are exact counts; −ln(A/B) divides them once.
    */
  def sampleEntropy(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0)
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val st = dense.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy"))
    val rr = st.select(col("n"),
      greatest(lit(1L), floor(lit(0.2) *
        sqrt((col("n") * col("syy") - col("sy") * col("sy"))
          .cast("double")) / col("n").cast("double")).cast("long"))
        .as("r"))
    val w = Window.orderBy("day")
    val tpl = dense
      .withColumn("t", row_number().over(w).cast("long"))
      .withColumn("y1", lead(col("y"), 1).over(w))
      .withColumn("y2", lead(col("y"), 2).over(w))
      .filter(col("y2").isNotNull) // t <= n-2: same index range for A and B
      .select(col("t"), col("y"), col("y1"), col("y2"))
    val a = tpl.select(col("t").as("i"), col("y").as("x0"),
      col("y1").as("x1"), col("y2").as("x2"))
    val b = tpl.select(col("t").as("j"), col("y").as("z0"),
      col("y1").as("z1"), col("y2").as("z2"))
    val pairs = a.crossJoin(broadcast(rr)).join(b,
      col("i") < col("j") &&
        abs(col("x0") - col("z0")) <= col("r") &&
        abs(col("x1") - col("z1")) <= col("r"))
      .select(col("n"), col("r"),
        (abs(col("x2") - col("z2")) <= col("r")).cast("long").as("m3"))
    pairs.groupBy("n", "r")
      .agg(count(lit(1)).as("b_pairs"), sum(col("m3")).as("a_pairs"))
      .select(col("n").as("n_days"), col("r"), col("b_pairs"),
        col("a_pairs"),
        (col("a_pairs") > 0).cast("long").as("defined"),
        when(col("a_pairs") > 0,
          q(-log(col("a_pairs").cast("double") /
            col("b_pairs").cast("double")), 6))
          .otherwise(lit(0.0)).as("sampen"))
  }

  /** Dickey–Fuller unit-root screen (W388) on the daily series:
    * regress Δy_t on y_{t−1} (with constant) and read γ's t-statistic
    * against the −2.86 large-n 5% critical value — "is this series a
    * random walk (γ≈0) or mean-reverting (γ≪0)?", the stationarity
    * gate every forecaster upstream ([[ar2Forecast]],
    * [[thetaForecast]]) silently assumes. γ's numerator/denominator
    * are exact integer cross-products; SSE and the standard error
    * run as one fixed double expression from the same exact sums, so
    * both engines agree bit-for-bit after the output grid. Scale:
    * one day-spine aggregation — no iteration, no matrix solve.
    */
  def adfTest(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
      .persist()
    CacheScope.register(daily0)
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val w = Window.orderBy("day")
    val reg = dense
      .withColumn("x", lag(col("y"), 1).over(w))
      .filter(col("x").isNotNull)
      .select(col("x"), (col("y") - col("x")).as("dy"))
    val g = reg.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("dy")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("dy")).as("sxy"),
      sum(col("dy") * col("dy")).as("syy"))
    val n = col("n").cast("double")
    val aN = n * col("sxy") - col("sx").cast("double") *
      col("sy").cast("double")
    val bD = n * col("sxx") - col("sx").cast("double") *
      col("sx").cast("double")
    val gamma = aN / bD
    val sxxc = bD / n
    val sxyc = aN / n
    val syyc = (n * col("syy") - col("sy").cast("double") *
      col("sy").cast("double")) / n
    val sse = syyc - gamma * sxyc
    val tStat = gamma / sqrt(sse / (n - 2) / sxxc)
    g.select(col("n").as("n_obs"), q(gamma, 6).as("gamma"),
      q(tStat, 4).as("t_stat"),
      (q(tStat, 4) < lit(-2.86)).cast("long").as("stationary_flag"))
  }

  /** Wald's SPRT conversion monitor (W389): per day, the cumulative
    * log-likelihood ratio of "purchase share = p₁" vs "= p₀" with
    * the classic (α, β) = (.05, .05) accept boundaries ±ln 19 — the
    * always-valid sequential decision rule next to
    * [[obfSequential]]'s group-sequential spending. The per-day
    * increment k·ln(p₁/p₀) + (n−k)·ln((1−p₁)/(1−p₀)) uses ratio
    * literals computed ONCE on the driver and injected into both
    * engines verbatim (no cross-libm ln), is quantized to a 1e-9
    * integer per day, and the running LLR is an integer window sum —
    * decisions compare integers. Scale: one day-keyed agg + a
    * day-ordered cumulative window.
    */
  def sprtMonitor(s: SparkSession, dir: String,
                  p0: Double = 0.20, p1: Double = 0.25): DataFrame = {
    val l1 = math.log(p1 / p0)
    val l0 = math.log((1 - p1) / (1 - p0))
    val up = math.floor(math.log(19.0) * 1e9 + 0.5).toLong
    val daily = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        (col("event_type") === "purchase").cast("long").as("k"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"), sum(col("k")).as("k"))
    val term = col("k").cast("double") * lit(l1) +
      (col("n") - col("k")).cast("double") * lit(l0)
    val run = daily
      .select(col("day"), col("n"), col("k"),
        floor(term * lit(1e9) + lit(0.5)).cast("long").as("t9"))
      .withColumn("llr9", sum(col("t9")).over(Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)))
    run.select(col("day"), col("n"), col("k"),
        q(col("llr9").cast("double") / lit(1e9), 6).as("llr"),
        when(col("llr9") >= up, lit("accept_h1"))
          .when(col("llr9") <= -up, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
      .orderBy("day")
  }

  /** EWMA control chart (W390, λ = ½, L = 3) over the daily count
    * series: smoothed level z_t, time-varying ±3σ_z limits, and
    * out-of-band flags — the small-shift change detector between
    * [[cusumChangepoint]] (cumulative) and [[pageHinkley]]
    * (sequential). λ = ½ makes the recursion closed-form EXACT:
    * z_t = μ/2^t + (Σ y_i·2^i)/2^(t+1), where the weighted prefix
    * sum is an exact DECIMAL window cumsum and every 2-power is a
    * bit shift (never libm pow) — the trailing-60-day cap bounds the
    * shift at 61 bits. σ_z folds (1 − ¼^t) with ¼^t = (½^t)², again
    * shift-exact; flags compare 1e-9-quantized integers. Scale:
    * day-bounded window over the trailing slice.
    */
  def ewmaChart(s: SparkSession, dir: String, w: Int = 60): DataFrame = {
    val tail = dailyTail(s, dir, w).persist()
    CacheScope.register(tail) // eager: stats + the chart read it
    val st = tail.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val base = st.select(
      (col("sy").cast("double") / nD).as("mu"),
      (sqrt((col("n") * col("syy") - col("sy") * col("sy"))
        .cast("double")) / nD).as("sigma"))
    val cum = tail
      .withColumn("w2", col("y").cast("decimal(38,0)") *
        pow2(col("t")).cast("decimal(38,0)"))
      .withColumn("cum", sum(col("w2")).over(Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val half = pow2(lit(61L) - col("t")).cast("double") /
      pow2(lit(61L)).cast("double")
    val z = col("mu") * half + col("cum").cast("double") /
      pow2(col("t") + 1).cast("double")
    val sz = col("sigma") * sqrt((lit(1.0) - half * half) / 3)
    val dev9 = floor(abs(z - col("mu")) * lit(1e9) + lit(0.5))
      .cast("long")
    val lim9 = floor(lit(3.0) * sz * lit(1e9) + lit(0.5)).cast("long")
    cum.crossJoin(broadcast(base))
      .select(col("day"), col("y"), q(z, 6).as("ewma"),
        q(col("mu") + lit(3.0) * sz, 6).as("ucl"),
        q(col("mu") - lit(3.0) * sz, 6).as("lcl"),
        (dev9 > lim9).cast("long").as("oob"))
      .orderBy("day")
  }

  /** Reciprocity of the event-type transition digraph (W396): build
    * per-user consecutive-event transitions a→b (a ≠ b), aggregate
    * to a weighted digraph, and measure how SYMMETRIC the flow is —
    * unweighted (share of directed edges with a reverse edge) and
    * weighted (Squartini–Garlaschelli W↔/W = Σ min(w_ab, w_ba)/Σw).
    * The process-mining symmetry check next to
    * [[eventuallyFollows]]: click→purchase without purchase→click is
    * a funnel; high reciprocity is oscillation (error↔retry loops).
    * One lag window per user, one edge-keyed agg, one self-join on
    * the REVERSED key; every statistic an exact integer, two final
    * divisions. Scale: user-partitioned windows, edge table bounded
    * by (types)².
    */
  def reciprocity(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("b"))
      .withColumn("a", lag(col("b"), 1).over(w))
      .filter(col("a").isNotNull && col("a") =!= col("b"))
    val edges = trans.groupBy("a", "b").agg(count(lit(1)).as("wab"))
      .persist()
    CacheScope.register(edges) // eager: both sides of the reverse join
    val joined = edges.join(
      edges.select(col("a").as("b2"), col("b").as("a2"),
        col("wab").as("wba")),
      col("a") === col("a2") && col("b") === col("b2"), "left")
      .select(col("wab"), coalesce(col("wba"), lit(0L)).as("wba"))
    joined.agg(count(lit(1)).as("n_edges"),
        sum((col("wba") > 0).cast("long")).as("n_recip"),
        sum(col("wab")).as("w_total"),
        sum(least(col("wab"), col("wba"))).as("w_recip"))
      .select(col("n_edges"), col("n_recip"),
        q(col("n_recip").cast("double") / col("n_edges").cast("double"),
          6).as("recip"),
        col("w_total"), col("w_recip"),
        q(col("w_recip").cast("double") / col("w_total").cast("double"),
          6).as("w_ratio"))
  }

  /** Gumbel extreme-value fit (W400) by the method of moments over
    * DAILY BLOCK MAXIMA of `value`, with 30-day and 365-day return
    * levels — "how big a value should we provision for once a
    * month / once a year?", the tail question [[hillTailIndex]]
    * answers for power laws and this answers for the light-tailed
    * max-domain (Fisher–Tippett type I). β = s·√6/π, μ = m − γ_E·β;
    * return level x_T = μ + β·y_T with y_T = −ln(−ln(1−1/T)). Every
    * constant (√6/π, Euler–Mascheroni, both y_T) is computed ONCE on
    * the driver and injected into both engines; m and s come from
    * exact 1e-6-grid DECIMAL sums over the day-keyed maxima. Scale:
    * one day-keyed max + one moment aggregation.
    */
  def evtGumbel(s: SparkSession, dir: String): DataFrame = {
    val c = math.sqrt(6.0) / math.Pi
    val eg = 0.5772156649015329 // Euler-Mascheroni, driver literal
    def yT(t: Double) = -math.log(-math.log(1 - 1.0 / t))
    val mx = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg(max(col("v6")).as("m6"))
    val g = mx.agg(count(lit(1)).as("n"),
      sum(col("m6").cast("decimal(38,0)")).as("s1"),
      sum((col("m6") * col("m6")).cast("decimal(38,0)")).as("s2"))
    val n = col("n").cast("double")
    val mean = col("s1").cast("double") / n / lit(1e6)
    val sd = sqrt((n * col("s2").cast("double") -
      col("s1").cast("double") * col("s1").cast("double")) /
      (n * (n - 1))) / lit(1e6)
    val beta = sd * lit(c)
    val mu = mean - lit(eg) * beta
    g.select(col("n").as("n_days"), q(mu, 6).as("mu"),
      q(beta, 6).as("beta"),
      q(mu + beta * lit(yT(30)), 4).as("rl_30d"),
      q(mu + beta * lit(yT(365)), 4).as("rl_365d"))
  }

  /** 1-D DBSCAN over per-user event timelines (W401, ε = 30 min,
    * minPts = 3): core points from a RANGE-frame neighbor count,
    * clusters as maximal core chains with inter-core gaps ≤ ε,
    * border points within ε of a core, the rest noise — the
    * density-based generalization of [[sessionize]] (a gap split
    * calls two half-sessions separated by 31 idle minutes two
    * sessions even if each is a single stray click; DBSCAN demands
    * local density before it mints a cluster at all). In 1-D every
    * DBSCAN primitive is a WINDOW: the ε-neighborhood is a RANGE
    * frame, the nearest core on each side is a running max/min — no
    * pair join anywhere, exact integer seconds throughout. Scale:
    * user-partitioned windows only.
    */
  def dbscan1d(s: SparkSession, dir: String, epsSec: Long = 1800,
               minPts: Int = 3): DataFrame = {
    val pts = Tables.events(s, dir)
      .select(col("user_id").as("u"), unix_timestamp(col("ts")).as("ep"))
    val wr = Window.partitionBy("u").orderBy("ep")
      .rangeBetween(-epsSec, epsSec)
    // RANGE frames (not ROWS): duplicate timestamps are peers — a
    // ROWS boundary would include ties in engine-dependent order
    val wPrev = Window.partitionBy("u").orderBy("ep")
      .rangeBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy("u").orderBy(col("ep").desc)
      .rangeBetween(Window.unboundedPreceding, 0)
    val flagged = pts
      .withColumn("core", count(lit(1)).over(wr) >= minPts)
      .withColumn("pc", max(when(col("core"), col("ep"))).over(wPrev))
      .withColumn("nc", min(when(col("core"), col("ep"))).over(wNext))
    val classified = flagged.select(col("u"), col("ep"), col("core"),
      when(col("core"), lit("core"))
        .when((col("pc").isNotNull && col("ep") - col("pc") <= epsSec) ||
              (col("nc").isNotNull && col("nc") - col("ep") <= epsSec),
          lit("border"))
        .otherwise(lit("noise")).as("role"))
    // clusters: runs of core points whose consecutive gaps <= eps
    val cores = classified.filter(col("core"))
      .withColumn("gap", col("ep") - lag(col("ep"), 1).over(
        Window.partitionBy("u").orderBy("ep")))
      .select(when(col("gap").isNull || col("gap") > epsSec, lit(1L))
        .otherwise(lit(0L)).as("newc"))
    val nClusters = cores.agg(coalesce(sum(col("newc")), lit(0L))
      .as("n_clusters"))
    classified.groupBy()
      .agg(count(lit(1)).as("n_points"),
        sum((col("role") === "core").cast("long")).as("n_core"),
        sum((col("role") === "border").cast("long")).as("n_border"),
        sum((col("role") === "noise").cast("long")).as("n_noise"))
      .crossJoin(broadcast(nClusters))
  }

  /** Nelson–Aalen cumulative hazard (W402) over the signup→purchase
    * durations of [[kaplanMeier]]: H(t) = Σ d_i/n_i — the estimator of
    * choice when hazards (not survival curves) are the modeling target
    * and the small-risk-set tail makes KM's product unstable.
    * Identical risk-set machinery to KM (exact counts from one
    * cumulative window); each hazard increment d/n is pinned to a 1e-9
    * integer before the cumulative sum, so H accumulates exactly and
    * the surfaced `hc9` LONG + its one-division `cum_hazard` are
    * engine-proof. The r5 surface also emitted exp(−H)
    * (Fleming–Harrington survival) — a data-dependent libm call that
    * hash-failed the driver's DuckDB (VERDICT r5 #1); hazard-only is
    * the environment-proof restatement (S_FH is one driver-side exp
    * away for any consumer).
    */
  def nelsonAalen(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy("user_id").agg(
      to_date(min(col("ts"))).as("d0"),
      to_date(min(when(col("event_type") === "purchase", col("ts"))))
        .as("dconv"))
    val horizon = ev.agg(to_date(max(col("ts"))).as("dmax"))
    val durs = perUser.crossJoin(broadcast(horizon))
      .select(
        when(col("dconv").isNotNull, datediff(col("dconv"), col("d0")))
          .otherwise(datediff(col("dmax"), col("d0"))).as("t"),
        when(col("dconv").isNotNull, 1L).otherwise(0L).as("event"))
    val byT = durs.groupBy("t").agg(
      sum(col("event")).as("d"), count(lit(1)).as("k"))
    val n = durs.count()
    val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byT
      .withColumn("n_risk", lit(n) - coalesce(sum(col("k")).over(w),
        lit(0L)))
      .withColumn("h9", floor(col("d").cast("double") /
        col("n_risk").cast("double") * lit(1e9) + lit(0.5)).cast("long"))
      .withColumn("hc9", sum(col("h9")).over(cum))
      .filter(col("d") > 0)
      .select(col("t").cast("long").as("t_day"), col("n_risk"),
        col("d").as("deaths"), col("hc9"),
        q(col("hc9").cast("double") / lit(1e9), 6).as("cum_hazard"))
      .orderBy("t_day")
  }

  /** Index-of-dispersion test (W403) per event type: is the daily
    * count series Poisson (VMR ≈ 1), overdispersed (bursty — the
    * usual truth for user traffic), or underdispersed (rate-limited/
    * regular)? χ² = (n−1)s²/x̄ against the Wilson–Hilferty 95%
    * critical value — the one-number screen run before ANY Poisson
    * assumption (capacity models, [[abPower]]-style rate tests) is
    * trusted. Sufficient statistics are exact per-(type, day) count
    * sums; the statistic and the WH cube are fixed closed-form
    * expressions with driver-injected z₀.₉₅. Scale: one (type, day)
    * agg + one type agg.
    */
  def dispersionTest(s: SparkSession, dir: String): DataFrame = {
    val z95 = 1.6448536269514722 // driver literal in both engines
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("y"))
    val g = daily.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"))
    val n = col("n").cast("double")
    val mean = col("sy").cast("double") / n
    val s2 = (n * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")) / (n * (n - 1))
    val chi2 = (n - 1) * s2 / mean
    val k = n - 1
    val aa = lit(1.0) - lit(2.0) / (lit(9.0) * k) +
      lit(z95) * sqrt(lit(2.0) / (lit(9.0) * k))
    val crit = k * aa * (aa * aa)
    g.select(col("event_type"), col("n").as("n_days"),
        q(mean, 6).as("mean"), q(s2 / mean, 6).as("vmr"),
        q(chi2, 4).as("chi2"),
        (q(chi2, 4) > q(crit, 4)).cast("long").as("overdispersed"))
      .orderBy("event_type")
  }

  /** Allan variance of the daily count series (W408) at block sizes
    * τ ∈ {1, 2, 4}: AVAR(τ) = Σ(s_{b+1}−s_b)²/(2(M−1)τ²) over
    * complete τ-day block sums — the drift-vs-noise separator
    * ([[acfDaily]] sees correlation; Allan deviation's SLOPE across
    * τ classifies the noise type: white flattens as 1/τ, random
    * walk grows). Every block sum and successive difference is an
    * exact integer from one div-keyed aggregation + a lag window
    * over blocks; the statistic divides once per τ. Scale: day-
    * spine-bounded; three block aggs.
    */
  def allanVariance(s: SparkSession, dir: String,
                    taus: Seq[Int] = Seq(1, 2, 4)): DataFrame = {
    val tail = dailyTail(s, dir, Int.MaxValue).persist()
    CacheScope.register(tail) // eager: one block agg per tau
    val perTau = taus.map { tau =>
      val blocks = tail
        .select((((col("t") - 1) / tau).cast("long")).as("b"), col("y"))
        .groupBy("b").agg(sum(col("y")).as("sb"),
          count(lit(1)).as("cnt"))
        .filter(col("cnt") === tau)
      val diffs = blocks
        .withColumn("d", col("sb") - lag(col("sb"), 1).over(
          Window.orderBy("b")))
        .filter(col("d").isNotNull)
      diffs.agg(count(lit(1)).as("m1"),
          sum((col("d") * col("d")).cast("decimal(38,0)")).as("sd2"))
        // a tau with < 2 complete blocks has no diffs: drop the row
        // (the oracle's GROUP BY vanishes; a global agg would not)
        .filter(col("m1") > 0)
        .select(lit(tau.toLong).as("tau"),
          (col("m1") + 1).as("m_blocks"),
          q(col("sd2").cast("double") /
            (lit(2.0) * col("m1") * lit((tau * tau).toDouble)), 6)
            .as("avar"))
    }
    perTau.reduce(_ unionAll _)
      .select(col("tau"), col("m_blocks"), col("avar"),
        q(sqrt(col("avar")), 6).as("adev"))
      .orderBy("tau")
  }

  /** Turning-point randomness test (W409) on the daily series: count
    * strict local extrema; under iid, E[T] = 2(n−2)/3 and
    * Var = (16n−29)/90, so z = (T−E)/√V screens for serial
    * dependence — the cheapest iid check next to [[runsTest]] (signs
    * vs median) and [[ljungBox]] (full ACF): turning points catch
    * smooth trends/cycles that leave the median-run structure
    * intact. T is an exact count from one lag/lead window; ties
    * (plateaus) are not extrema by the strict inequalities. Scale:
    * one day-spine window + one agg.
    */
  def turningPoints(s: SparkSession, dir: String): DataFrame = {
    val tail = dailyTail(s, dir, Int.MaxValue)
    val w = Window.orderBy("t")
    val marked = tail
      .withColumn("yp", lag(col("y"), 1).over(w))
      .withColumn("yn", lead(col("y"), 1).over(w))
      .filter(col("yp").isNotNull && col("yn").isNotNull)
      .select(((col("yp") < col("y") && col("y") > col("yn")) ||
        (col("yp") > col("y") && col("y") < col("yn")))
        .cast("long").as("tp"))
    val g = marked.agg((count(lit(1)) + 2).as("n"),
      sum(col("tp")).as("t"))
    val n = col("n").cast("double")
    val e = lit(2.0) * (n - 2) / 3
    val v = (lit(16.0) * n - 29) / 90
    val z = (col("t").cast("double") - e) / sqrt(v)
    g.select(col("n").as("n_days"), col("t").as("turning_points"),
      q(e, 6).as("expected"), q(z, 6).as("z_stat"),
      (abs(q(z, 6)) > lit(1.96)).cast("long").as("nonrandom_flag"))
  }

  /** Delete-one-day jackknife SE (W410) for the revenue-per-event
    * RATIO estimator R = ΣY/ΣX — the survey-sampling answer to "the
    * mean of daily ratios is biased and the ratio of sums has no
    * textbook SE": each leave-one-out replicate R₍ᵢ₎ =
    * (SY−yᵢ)/(SX−xᵢ) is closed-form from the exact totals (no
    * resampling pass), pinned to a 1e-9 integer, and the jackknife
    * variance (n−1)/n·Σ(R₍ᵢ₎−R̄)² collapses to the cross-multiplied
    * integer identity (nΣR9²−(ΣR9)²)/n². One day-keyed agg + one
    * replicate agg; the ±1.96·SE interval surfaces alongside.
    */
  def jackknifeRatio(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg(count(lit(1)).as("x"), sum(col("v6")).as("y6"))
      .persist()
    CacheScope.register(daily) // eager: totals + replicates read it
    val tot = daily.agg(sum(col("x")).as("sx"), sum(col("y6")).as("sy6"),
      count(lit(1)).as("n"))
    val reps = daily.crossJoin(broadcast(tot))
      .select(col("sx"), col("sy6"), col("n"),
        floor((col("sy6") - col("y6")).cast("double") /
          (col("sx") - col("x")).cast("double") / lit(1e6) * lit(1e9) +
          lit(0.5)).cast("long").as("r9"))
    val g = reps.groupBy("sx", "sy6", "n").agg(
      sum(col("r9").cast("decimal(38,0)")).as("sr"),
      // replicate squares pass Int64 for ratios > ~3: promote first
      sum(col("r9").cast("decimal(38,0)") *
        col("r9").cast("decimal(38,0)")).as("sr2"))
    val n = col("n").cast("double")
    val varJ = (n - 1) / n *
      ((n * col("sr2").cast("double") -
        col("sr").cast("double") * col("sr").cast("double")) / (n * n)) /
      lit(1e18)
    val ratio = col("sy6").cast("double") / col("sx").cast("double") /
      lit(1e6)
    g.select(col("n").as("n_days"), q(ratio, 6).as("ratio"),
      q(sqrt(varJ), 6).as("jk_se"),
      q(ratio - lit(1.96) * sqrt(varJ), 6).as("ci_lo"),
      q(ratio + lit(1.96) * sqrt(varJ), 6).as("ci_hi"))
  }

  /** Empirical variogram (W411) of the daily series at lags 1..7:
    * γ(h) = Σ(y_{t+h}−y_t)²/(2N_h) — the geostatistics view of
    * temporal structure ([[acfDaily]] normalizes by global variance;
    * the variogram keeps the data's units, stays defined under
    * trend, and its sill/nugget shape diagnoses smoothness). One
    * broadcast lag spine + one self-join on the dense day spine,
    * exact integer squared differences, one division per lag.
    */
  def variogram(s: SparkSession, dir: String, maxLag: Int = 7)
  : DataFrame = {
    val tail = dailyTail(s, dir, Int.MaxValue).persist()
    CacheScope.register(tail) // eager: both join sides read it
    val lags = s.range(1, maxLag + 1).select(col("id").cast("int").as("lag"))
    val pairs = tail.select(col("t"), col("y").as("ya"))
      .crossJoin(broadcast(lags))
      .select(col("lag"), (col("t") + col("lag")).as("t"), col("ya"))
      .join(tail.select(col("t"), col("y").as("yb")), Seq("t"))
    pairs.groupBy("lag").agg(count(lit(1)).as("n_pairs"),
        sum((col("yb") - col("ya")) * (col("yb") - col("ya"))).as("ss"))
      .select(col("lag"), col("n_pairs"),
        q(col("ss").cast("double") /
          (lit(2.0) * col("n_pairs").cast("double")), 6).as("gamma"))
      .orderBy("lag")
  }

  /** Post-stratified conversion estimate (W412): reweight the
    * purchase share to a UNIFORM hour-of-day target instead of the
    * observed traffic mix — the survey-methods fix for "our metric
    * moved because the TRAFFIC MIX moved" ([[Curation.ipfRaking]]
    * generalizes to multiple margins; this is the one-margin
    * textbook estimator whose gap vs the raw share IS the mix-shift
    * readout). Per-stratum rates are exact rationals quantized to
    * 1e-9 integers before the equal-weight average; one hour-keyed
    * aggregation total.
    */
  def postStratify(s: SparkSession, dir: String): DataFrame = {
    val byH = Tables.events(s, dir)
      .select(hour(col("ts")).as("h"),
        (col("event_type") === "purchase").cast("long").as("k"))
      .groupBy("h").agg(count(lit(1)).as("n"), sum(col("k")).as("k"))
    val g = byH.agg(count(lit(1)).as("n_strata"),
      sum(col("n")).as("nn"), sum(col("k")).as("kk"),
      sum(floor(col("k").cast("double") / col("n").cast("double") *
        lit(1e9) + lit(0.5)).cast("long")).as("sp9"))
    val raw = col("kk").cast("double") / col("nn").cast("double")
    val post = col("sp9").cast("double") / lit(1e9) /
      col("n_strata").cast("double")
    g.select(col("n_strata"), col("nn").as("n_events"),
      q(raw, 6).as("p_raw"), q(post, 6).as("p_post"),
      q(post - raw, 6).as("mix_shift"))
  }

  /** Permutation entropy (W418, Bandt–Pompe, m = 3) of the daily
    * series: the Shannon entropy of consecutive-triple ORDINAL
    * patterns, normalized by ln 6 — the complexity axis read in
    * order space ([[sampleEntropy]] reads amplitude space; ordinal
    * patterns are amplitude-free, so a monotone rescale of the
    * series cannot change the answer). Ties break toward temporal
    * order (the standard stable convention), so each triple maps to
    * one of 6 exact pattern ids via three integer comparisons; the
    * entropy accumulates −p·ln p on the 1e-9 per-term grid. Scale:
    * one day-spine window + a ≤6-row aggregation.
    */
  def permutationEntropy(s: SparkSession, dir: String): DataFrame = {
    val tail = dailyTail(s, dir, Int.MaxValue)
    val w = Window.orderBy("t")
    val pats = tail
      .withColumn("y1", lead(col("y"), 1).over(w))
      .withColumn("y2", lead(col("y"), 2).over(w))
      .filter(col("y2").isNotNull)
      .select(((col("y") <= col("y1")).cast("long") * 4 +
        (col("y") <= col("y2")).cast("long") * 2 +
        (col("y1") <= col("y2")).cast("long")).as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("c"))
      .persist()
    CacheScope.register(pats) // eager: total + the term agg read it
    val tot = pats.agg(sum(col("c")).as("nn"),
      count(lit(1)).as("n_patterns"))
    val h9 = pats.crossJoin(broadcast(tot))
      .select((-(col("c").cast("double") / col("nn").cast("double")) *
        log(col("c").cast("double") / col("nn").cast("double")))
        .as("term"))
      .select(floor(col("term") * lit(1e9) + lit(0.5)).cast("long")
        .as("t9"))
      .agg(coalesce(sum(col("t9")), lit(0L)).as("h9"))
    h9.crossJoin(tot).select(col("nn").as("n_triples"),
      col("n_patterns"),
      q(col("h9").cast("double") / lit(1e9), 6).as("h_nats"),
      q(col("h9").cast("double") / lit(1e9) / lit(math.log(6.0)), 6)
        .as("h_norm"))
  }

  /** Per-type exact quantile gap (W419): q50/q90 of the click vs
    * purchase value distributions and their differences — the
    * quantile-level effect readout that [[effectSizes]]' mean-based
    * d cannot see (a treatment that moves the tail but not the
    * median has d ≈ 0 and a large Δq90). Quantiles use the repo's
    * cross-multiplied cumulative rule on the exact 1e-6 value grid;
    * the gaps subtract two grid values. Scale: one value-keyed agg
    * per type + a 2-row quantile spine.
    */
  def quantileGap(s: SparkSession, dir: String,
                  typeA: String = "click", typeB: String = "purchase")
  : DataFrame = {
    val vi = Tables.events(s, dir)
      .filter(col("value").isNotNull &&
        col("event_type").isin(typeA, typeB))
      .select(col("event_type"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("event_type", "v6").agg(count(lit(1)).as("cnt"))
      .persist()
    CacheScope.register(vi) // eager: totals + both quantile picks
    val tot = vi.groupBy(col("event_type").as("et"))
      .agg(sum(col("cnt")).as("n"))
    val cum = vi.withColumn("cum", sum(col("cnt")).over(
      Window.partitionBy("event_type").orderBy("v6")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val qs = s.range(0, 2).select(
      element_at(array(lit(50), lit(90)), (col("id") + 1).cast("int"))
        .as("q_pct"))
    val picks = cum.join(broadcast(tot), col("event_type") === col("et"))
      .crossJoin(broadcast(qs))
      .filter(col("cum") * 100 >= col("q_pct") * col("n"))
      .groupBy("event_type", "q_pct").agg(min(col("v6")).as("v6"))
    val qa = picks.filter(col("event_type") === typeA)
      .select(col("q_pct"), col("v6").as("va"))
    val qb = picks.filter(col("event_type") === typeB)
      .select(col("q_pct"), col("v6").as("vb"))
    qa.join(qb, "q_pct")
      .select(col("q_pct"), q(col("va").cast("double") / lit(1e6), 6)
        .as("q_a"),
        q(col("vb").cast("double") / lit(1e6), 6).as("q_b"),
        q((col("va") - col("vb")).cast("double") / lit(1e6), 6)
          .as("gap"))
      .orderBy("q_pct")
  }

  /** KPSS level-stationarity test (W422, fixed Bartlett lag L=5) on
    * the dense daily event-count series — the null-REVERSED
    * complement of [[adfTest]]: ADF's null is "unit root", KPSS's
    * null is "stationary", so running both brackets the series from
    * both sides (agree = confident, disagree = inspect). Demeaned
    * residuals cross-multiply to exact integers e'_t = n·y_t − Σy;
    * the partial sums S'_t, their squares, and every Bartlett-
    * weighted lag product γ'_j = Σ e'_t e'_{t−j} stay exact DECIMAL
    * (weights 1 − j/(L+1) fold over the common denominator L+1), and
    * η = (L+1)·ΣS'² / (n · lr') divides ONCE at the end. A constant
    * series (lr' ≤ 0 exactly) surfaces η = 0. Scale: one day-keyed
    * agg + an O(L)-lag window over the day spine — no iteration.
    */
  def kpssTest(s: SparkSession, dir: String, lag: Int = 5): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val st = dense.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val w = Window.orderBy("day")
    val e = dense.crossJoin(broadcast(st))
      .select(col("day"), col("n"),
        (col("y") * col("n") - col("sy")).as("e"))
      .withColumn("sp", sum(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
    val prodCols = (0 to lag).map(j =>
      (col("e").cast("decimal(38,0)") *
        org.apache.spark.sql.functions.lag(col("e"), j).over(w))
        .as(s"p$j"))
    val prods = e.select(Seq(col("n"),
      (col("sp").cast("decimal(38,0)") * col("sp")).as("sp2")) ++
      prodCols: _*)
    val aggs = prods.groupBy("n").agg(sum(col("sp2")).as("ssq"),
      (0 to lag).map(j => sum(col(s"p$j")).as(s"g$j")): _*)
    // lr' numerator over denominator L+1: (L+1)γ0 + Σ 2(L+1−j)γj
    val lrn = (1 to lag).foldLeft(
      col("g0") * lit(lag + 1): org.apache.spark.sql.Column)(
      (acc, j) => acc + col(s"g$j") * lit(2 * (lag + 1 - j)))
    val eta = when(lrn > 0,
      q(col("ssq").cast("double") * lit((lag + 1).toDouble) /
        (col("n").cast("double") * lrn.cast("double")), 6))
      .otherwise(lit(0.0))
    aggs.select(col("n").as("n_obs"), eta.as("eta"),
      (eta > lit(0.463)).cast("long").as("nonstationary_flag"))
  }

  /** Engle–Granger two-step cointegration screen (W423) between the
    * daily `view` and `click` count series: OLS click ~ view, then a
    * Dickey–Fuller regression on the residuals — "do these two series
    * share a common stochastic trend, or does their gap wander?",
    * the pair test [[adfTest]] and [[kpssTest]] can't answer alone.
    * The residual is never materialized as a double: R_t =
    * bden·(n·y_t − Σy) − bnum·(n·x_t − Σx) = n·bden·u_t is an exact
    * DECIMAL integer, and both DF ratios (γ and its t) are built from
    * exact sums of R — the n·bden scale cancels in every ratio.
    * Degenerate x (bden = 0 exactly) surfaces zeros. Scale: one
    * day-keyed agg, one O(1)-lag window, one moment agg.
    */
  def engleGranger(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        (col("event_type") === "view").cast("long").as("isv"))
      .groupBy("day")
      .agg(sum(col("isv")).as("x"),
        sum(lit(1L) - col("isv")).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(dense) // eager: the OLS agg + residual pass
    val g = dense.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"))
    val ols = g.select(col("n"), col("sx"), col("sy"),
      (col("n") * col("sxy") - col("sx") * col("sy")).as("bnum"),
      (col("n") * col("sxx") - col("sx") * col("sx")).as("bden"))
    val w = Window.orderBy("day")
    val res = dense.crossJoin(broadcast(ols))
      .select(col("day"), col("n"), col("bnum"), col("bden"),
        (col("bden").cast("decimal(38,0)") *
          (col("y") * col("n") - col("sy")) -
          col("bnum").cast("decimal(38,0)") *
            (col("x") * col("n") - col("sx"))).as("r"))
      .withColumn("rl", org.apache.spark.sql.functions.lag(col("r"), 1)
        .over(w))
      .filter(col("rl").isNotNull)
      .select(col("n"), col("bnum"), col("bden"), col("rl"),
        (col("r") - col("rl")).as("dr"))
    val df = res.groupBy("n", "bnum", "bden")
      .agg(count(lit(1)).as("m"),
        sum(col("rl") * col("dr")).as("srd"),
        sum(col("rl") * col("rl")).as("srr"),
        sum(col("dr") * col("dr")).as("sdd"))
    // safe denominators: ANSI div-by-zero fires even inside untaken
    // CASE branches once subexpression elimination hoists the divide
    val srrS = when(col("srr") === 0, lit(1)).otherwise(col("srr"))
      .cast("double")
    val bdenS = when(col("bden") === 0, lit(1)).otherwise(col("bden"))
      .cast("double")
    val gam = col("srd").cast("double") / srrS
    val sse = col("sdd").cast("double") -
      gam * col("srd").cast("double")
    val t = gam / sqrt(sse / (col("m").cast("double") - 1) / srrS)
    val okB = col("bden") =!= 0
    val ok = okB && col("srr") =!= 0
    df.select(col("n").as("n_days"),
      when(okB, q(col("bnum").cast("double") / bdenS, 6))
        .otherwise(lit(0.0)).as("beta"),
      when(ok, q(gam, 6)).otherwise(lit(0.0)).as("rho_gamma"),
      when(ok, q(t, 4)).otherwise(lit(0.0)).as("eg_t"),
      when(ok && q(t, 4) < lit(-3.37), lit(1L)).otherwise(lit(0L))
        .as("cointegrated_flag"))
  }

  /** Delta-method ratio-metric readout (W424) for the user-split A/B
    * frame (arm = user_id % 2): revenue-per-event as a RATIO OF
    * TOTALS Σx/Σy with its linearization standard error
    * se² = (v_x − 2R·c_xy + R²·v_y) / (n·ȳ²) — the correct CI for
    * ratio metrics, where naive per-user averaging is biased and
    * per-event variance ignores user clustering. Per-user totals
    * land on the exact cent grid; all five second moments are exact
    * DECIMAL sums, the variance folds them in ONE fixed double
    * expression, and the two-arm z divides once. Scale: one
    * user-keyed partial agg + one arm-keyed moment agg.
    */
  def deltaMethodRatio(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .select((col("user_id") % 2).cast("long").as("arm"),
        col("user_id"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long")
          .as("cents"))
      .groupBy("arm", "user_id")
      .agg(sum(col("cents")).as("x"), count(lit(1)).as("y"))
    val m = perUser.groupBy("arm")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
    val nD = col("n").cast("double")
    val r = col("sx").cast("double") / col("sy").cast("double")
    val vx = (nD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")) / (nD * nD)
    val cxy = (nD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")) / (nD * nD)
    val vy = (nD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")) / (nD * nD)
    val muY = col("sy").cast("double") / nD
    val se = sqrt(greatest(lit(0.0),
      (vx - lit(2.0) * r * cxy + r * r * vy) / (nD * muY * muY)))
    val arms = m.select(col("arm"), col("n"),
      (r / lit(100.0)).as("ratio"), (se / lit(100.0)).as("se"))
    arms.agg(
      sum(when(col("arm") === 0, col("n"))).as("n0"),
      sum(when(col("arm") === 1, col("n"))).as("n1"),
      max(when(col("arm") === 0, col("ratio"))).as("r0"),
      max(when(col("arm") === 1, col("ratio"))).as("r1"),
      max(when(col("arm") === 0, col("se"))).as("e0"),
      max(when(col("arm") === 1, col("se"))).as("e1"))
      .select(col("n0"), col("n1"), q(col("r0"), 6).as("ratio_0"),
        q(col("r1"), 6).as("ratio_1"),
        q(col("e0"), 6).as("se_0"), q(col("e1"), 6).as("se_1"), {
          // zero pooled se (identical users per arm): z := 0, and the
          // divide runs on a safe denominator (ANSI + subexpr hoist)
          val den2 = col("e0") * col("e0") + col("e1") * col("e1")
          when(den2 > 0, q((col("r1") - col("r0")) /
            sqrt(when(den2 > 0, den2).otherwise(lit(1.0))), 4))
            .otherwise(lit(0.0)).as("z_diff")
        })
  }

  /** Lag-1 Granger-causality screen (W425): does yesterday's `view`
    * count improve today's `purchase` forecast beyond yesterday's
    * purchases alone? Unrestricted OLS p_t ~ 1 + p_{t−1} + v_{t−1}
    * is solved by CRAMER'S RULE on the 3×3 normal equations — every
    * determinant is exact DECIMAL arithmetic over exact integer
    * cross-moments, so β̂, the restricted/unrestricted SSEs, and the
    * F-ratio all come from ONE fixed double expression per value
    * (the [[adfTest]] recipe, one rank higher). The flag compares
    * F against 3.84, the asymptotic χ²(1) 5% point for a single
    * restriction. Scale: one day-keyed agg + one O(1)-lag window +
    * one 9-moment agg — no iteration, no matrix library.
    */
  def grangerCausality(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        (col("event_type") === "view").cast("long").as("isv"))
      .groupBy("day")
      .agg(sum(col("isv")).as("v"), sum(lit(1L) - col("isv")).as("p"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("v"), lit(0L)).as("v"),
        coalesce(col("p"), lit(0L)).as("p"))
    val w = Window.orderBy("day")
    val rows = dense
      .withColumn("pl", org.apache.spark.sql.functions.lag(col("p"), 1)
        .over(w))
      .withColumn("vl", org.apache.spark.sql.functions.lag(col("v"), 1)
        .over(w))
      .filter(col("pl").isNotNull)
      .select(col("p").as("yt"), col("pl").as("yl"), col("vl").as("xl"))
    val g = rows.agg(count(lit(1)).as("n"),
      sum(col("yt")).as("st"), sum(col("yl")).as("sl"),
      sum(col("xl")).as("sx"),
      sum(col("yt") * col("yt")).as("stt"),
      sum(col("yt") * col("yl")).as("stl"),
      sum(col("yt") * col("xl")).as("stx"),
      sum(col("yl") * col("yl")).as("sll"),
      sum(col("yl") * col("xl")).as("slx"),
      sum(col("xl") * col("xl")).as("sxx"))
    def d38(c: org.apache.spark.sql.Column) = c.cast("decimal(38,0)")
    // 3x3 determinants over M = [[n,sl,sx],[sl,sll,slx],[sx,slx,sxx]]
    val det = d38(col("n")) * (d38(col("sll")) * col("sxx") -
        d38(col("slx")) * col("slx")) -
      d38(col("sl")) * (d38(col("sl")) * col("sxx") -
        d38(col("slx")) * col("sx")) +
      d38(col("sx")) * (d38(col("sl")) * col("slx") -
        d38(col("sll")) * col("sx"))
    val detA = d38(col("st")) * (d38(col("sll")) * col("sxx") -
        d38(col("slx")) * col("slx")) -
      d38(col("sl")) * (d38(col("stl")) * col("sxx") -
        d38(col("slx")) * col("stx")) +
      d38(col("sx")) * (d38(col("stl")) * col("slx") -
        d38(col("sll")) * col("stx"))
    val detB = d38(col("n")) * (d38(col("stl")) * col("sxx") -
        d38(col("stx")) * col("slx")) -
      d38(col("st")) * (d38(col("sl")) * col("sxx") -
        d38(col("slx")) * col("sx")) +
      d38(col("sx")) * (d38(col("sl")) * col("stx") -
        d38(col("stl")) * col("sx"))
    val detC = d38(col("n")) * (d38(col("sll")) * col("stx") -
        d38(col("slx")) * col("stl")) -
      d38(col("sl")) * (d38(col("sl")) * col("stx") -
        d38(col("stl")) * col("sx")) +
      d38(col("st")) * (d38(col("sl")) * col("slx") -
        d38(col("sll")) * col("sx"))
    val nD = col("n").cast("double")
    // SSE_u·det is exact: det·Σy² − (detA·Σy + detB·Σy·yl + detC·Σy·xl)
    val sseuNum = det * col("stt") -
      (detA * col("st") + detB * col("stl") + detC * col("stx"))
    // safe denominators: ANSI div-by-zero fires even inside untaken
    // CASE branches once subexpression elimination hoists the divide
    val detS = when(det === 0, lit(1)).otherwise(det).cast("double")
    val sseu = sseuNum.cast("double") / detS
    // restricted y_t ~ 1 + y_{t−1}: centered sums stay exact via ×n
    val ncyy = d38(col("n")) * col("stt") - d38(col("st")) * col("st")
    val ncyl = d38(col("n")) * col("stl") - d38(col("st")) * col("sl")
    val ncll = d38(col("n")) * col("sll") - d38(col("sl")) * col("sl")
    val ncllS = when(ncll === 0, lit(1)).otherwise(ncll).cast("double")
    val sser = (ncyy.cast("double") -
      ncyl.cast("double") * ncyl.cast("double") / ncllS) / nD
    val sseuS = when(sseuNum === 0, lit(1.0)).otherwise(sseu)
    val f = (sser - sseu) * (nD - 3) / sseuS
    val ok = det =!= 0 && ncll =!= 0 && sseuNum =!= 0
    g.select(col("n").as("n_obs"),
      when(ok, q(detB.cast("double") / detS, 6))
        .otherwise(lit(0.0)).as("b_ylag"),
      when(ok, q(detC.cast("double") / detS, 6))
        .otherwise(lit(0.0)).as("c_xlag"),
      when(ok, q(f, 4)).otherwise(lit(0.0)).as("f_stat"),
      when(ok && q(f, 4) > lit(3.84), lit(1L)).otherwise(lit(0L))
        .as("causal_flag"))
  }

  /** Seasonal Mann–Kendall trend test (W431, Hirsch–Slack): the MK
    * sign statistic computed WITHIN each hour-of-day season over the
    * dense day×hour count grid, then S and Var(S) summed across the
    * 24 seasons — the trend test that survives strong diurnal cycles,
    * where plain [[mannKendall]] on raw hourly data would read the
    * cycle itself as trend. Per-season tie correction
    * Σt(t−1)(2t+5) on exact integer counts, continuity-corrected z
    * from the exact-int chain, all-tied seasons contribute 0/0
    * exactly. Scale: one (day,hour)-keyed agg; the pair join is
    * seasons × span² — day-bounded, never corpus-bounded.
    */
  def seasonalMannKendall(s: SparkSession, dir: String): DataFrame = {
    val cell = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        hour(col("ts")).as("hr"))
      .groupBy("day", "hr").agg(count(lit(1)).as("y"))
    val bounds = cell.agg(min("day").as("d0"), max("day").as("d1"))
    val grid = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .crossJoin(s.range(0, 24).select(col("id").cast("int").as("hr")))
      .join(cell, Seq("day", "hr"), "left")
      .select(col("day"), col("hr"), coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(grid) // eager: pair join (both sides) + ties
    val sPairs = grid.select(col("hr"), col("day").as("d1"),
        col("y").as("y1"))
      .join(grid.select(col("hr"), col("day").as("d2"),
        col("y").as("y2")), Seq("hr"))
      .filter(col("d1") < col("d2"))
      .agg(sum(signum(col("y2") - col("y1")).cast("long")).as("s"))
    val nDays = grid.groupBy("hr").agg(count(lit(1)).as("n"))
      .agg(max(col("n")).as("n")) // identical across seasons (dense)
    val ties = grid.groupBy("hr", "y").agg(count(lit(1)).as("t"))
      .filter(col("t") > 1)
      .agg(coalesce(sum(col("t") * (col("t") - 1) *
        (lit(2L) * col("t") + 5)), lit(0L)).as("tsum"))
    val var18 = (lit(24L) * col("n") * (col("n") - 1) *
      (lit(2L) * col("n") + 5) - col("tsum"))
    val sAdj = when(col("s") > 0, col("s") - 1)
      .when(col("s") < 0, col("s") + 1).otherwise(lit(0L))
    val z = when(var18 > 0, q(sAdj.cast("double") /
      sqrt(var18.cast("double") / lit(18.0)), 6)).otherwise(lit(0.0))
    sPairs.crossJoin(broadcast(nDays)).crossJoin(broadcast(ties))
      .select(col("n").as("n_days"), lit(24L).as("n_seasons"),
        col("s"), z.as("z"),
        (abs(z) > lit(1.959964)).cast("long").as("trend_flag"))
  }

  /** Durbin–Watson first-order autocorrelation screen (W432) on the
    * dense daily count series: DW = ΣΔ²/Σ(y−ȳ)², cross-multiplied to
    * the single exact division n·ΣΔ² / (n·Σy² − S²) — the one-number
    * residual-independence check (DW ≈ 2(1−ρ̂₁)) run before trusting
    * any OLS-on-time readout ([[olsTrend]], [[adfTest]]'s regression).
    * A constant series (denominator 0 exactly) surfaces the no-
    * evidence value 2.0. The <1.5 / >2.5 heuristic bands are
    * surfaced as flags (exact n-dependent critical values need t
    * tables; the bands are the standard screen). Scale: one day-keyed
    * agg + one O(1)-lag window.
    */
  def durbinWatson(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val w = Window.orderBy("day")
    val withLag = dense
      .withColumn("yl", org.apache.spark.sql.functions.lag(col("y"), 1)
        .over(w))
    val g = withLag.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
      sum(col("y") * col("y")).as("syy"),
      sum(when(col("yl").isNotNull,
        (col("y") - col("yl")) * (col("y") - col("yl")))).as("sdd"))
    val den = col("n") * col("syy") - col("sy") * col("sy")
    val dw = when(den > 0, q(col("n").cast("double") *
      col("sdd").cast("double") / den.cast("double"), 6))
      .otherwise(lit(2.0))
    g.select(col("n").as("n_obs"), dw.as("dw"),
      (dw < lit(1.5)).cast("long").as("pos_autocorr_flag"),
      (dw > lit(2.5)).cast("long").as("neg_autocorr_flag"))
  }

  /** Chow structural-break test (W434) at the series midpoint: fit
    * y ~ a + b·t on the whole dense daily series and on each half,
    * F = ((SSE_p − SSE₁ − SSE₂)/2) / ((SSE₁+SSE₂)/(n−4)) — "did the
    * trend line CHANGE mid-window?", the regression-level upgrade of
    * [[cusumChangepoint]]'s mean-shift scan. Each SSE is the closed
    * form (n·Σy²−S²−(nΣty−StSy)²/(nΣt²−St²))/n over EXACT integer
    * moments, computed per segment in one conditional-sum pass and
    * pooled by adding the two segment rows (raw moments are
    * additive). Flag vs 3.00, the asymptotic χ²₂/2 point. Scale: one
    * day-keyed agg + one 2-row combine.
    */
  def chowTest(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense2 = bounds
      .select(col("d0"), col("d1"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"),
        coalesce(col("y"), lit(0L)).as("y"),
        floor((col("d1") - col("d0") + 1) / lit(2.0)).cast("long")
          .as("m"))
    val segs = dense2
      .select(when(col("t") < col("m"), lit(0L)).otherwise(lit(1L))
        .as("seg"), col("t"), col("y"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
        sum(col("y")).as("sy"),
        sum(col("t") * col("t")).as("stt"),
        sum(col("t") * col("y")).as("sty"),
        sum(col("y") * col("y")).as("syy"))
    def sse(n: org.apache.spark.sql.Column, st: org.apache.spark.sql.Column,
            sy: org.apache.spark.sql.Column, stt: org.apache.spark.sql.Column,
            sty: org.apache.spark.sql.Column, syy: org.apache.spark.sql.Column)
        : org.apache.spark.sql.Column = {
      val nD = n.cast("double")
      val sxxc = nD * stt.cast("double") -
        st.cast("double") * st.cast("double")
      val sxyc = nD * sty.cast("double") -
        st.cast("double") * sy.cast("double")
      val syyc = nD * syy.cast("double") -
        sy.cast("double") * sy.cast("double")
      val sxxcS = when(sxxc === 0.0, lit(1.0)).otherwise(sxxc)
      (syyc - sxyc * sxyc / sxxcS) / nD
    }
    val perSeg = segs.select(col("seg"), col("n"),
      sse(col("n"), col("st"), col("sy"), col("stt"), col("sty"),
        col("syy")).as("ssei"),
      col("st"), col("sy"), col("stt"), col("sty"), col("syy"))
    val g = perSeg.agg(sum(col("n")).as("n"),
      sum(col("ssei")).as("sse12"),
      sum(col("st")).as("st"), sum(col("sy")).as("sy"),
      sum(col("stt")).as("stt"), sum(col("sty")).as("sty"),
      sum(col("syy")).as("syy"),
      min(col("n")).as("nmin"))
    val sseP = sse(col("n"), col("st"), col("sy"), col("stt"),
      col("sty"), col("syy"))
    val sse12S = when(col("sse12") <= 0.0, lit(1.0))
      .otherwise(col("sse12"))
    val f = (sseP - col("sse12")) / lit(2.0) /
      (sse12S / (col("n").cast("double") - 4))
    val ok = col("nmin") >= 3 && col("sse12") > 0.0
    g.select(col("n").as("n_obs"),
      when(ok, q(f, 4)).otherwise(lit(0.0)).as("f_stat"),
      when(ok && q(f, 4) > lit(3.0), lit(1L)).otherwise(lit(0L))
        .as("break_flag"))
  }

  /** Wilcoxon signed-rank test (W435) on the paired daily (view,
    * click) counts: are the two series' levels systematically offset,
    * beyond what sign flips explain? Zero differences drop (the
    * standard convention), |d| midranks are carried in HALF-UNITS
    * (2·rank + ties − 1) so the rank total is the exact integer
    * n(n+1) and the tie-robust variance Var(W⁺) = Σr²/4 folds into
    * z = 2·(ΣposR₂ − n(n+1)/2)/√(Σr₂²) — one sqrt, one division,
    * everything else exact integers. The k=2-paired sibling of
    * [[Relational.friedmanTest]] (months×flags) and the paired
    * counterpart of [[mannWhitney]] (independent samples). Scale:
    * one day-keyed agg; the rank window runs over the day spine.
    */
  def wilcoxonSignedRank(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        (col("event_type") === "view").cast("long").as("isv"))
      .groupBy("day")
      .agg(sum(col("isv")).as("x"), sum(lit(1L) - col("isv")).as("y"))
      .select((col("x") - col("y")).as("d"))
      .filter(col("d") =!= 0)
    val w = Window.orderBy(abs(col("d")))
    val ranked = daily
      .withColumn("rk", rank().over(w))
      .withColumn("te", count(lit(1)).over(
        Window.partitionBy(abs(col("d")))))
      .select(col("d"), (col("rk") * 2 + col("te") - 1).cast("long")
        .as("r2"))
    val g = ranked.agg(count(lit(1)).as("n"),
      sum(when(col("d") > 0, col("r2")).otherwise(lit(0L))).as("wp2"),
      sum(col("r2") * col("r2")).as("s22"))
    val num2 = col("wp2").cast("double") -
      col("n").cast("double") * (col("n").cast("double") + 1) / 2
    val s22S = when(col("s22") === 0, lit(1L)).otherwise(col("s22"))
    val z = when(col("s22") > 0,
      q(lit(2.0) * num2 / sqrt(s22S.cast("double")), 6))
      .otherwise(lit(0.0))
    g.select(col("n").as("n_pairs"), col("wp2"), z.as("z"),
      (abs(z) > lit(1.959964)).cast("long").as("shift_flag"))
  }

  /** Restricted mean survival time (W442): the area under the
    * [[kaplanMeier]] curve up to the observation horizon τ — "the
    * average event-free days a user banks in the first τ days", the
    * single-number summary clinicians reach for when hazards aren't
    * proportional and a median doesn't exist (KM never dropping below
    * 0.5). Rides kaplanMeier's exact integer chain DIRECTLY — the
    * surfaced `surv6` LONG, not the derived double (ADVICE r5: the
    * old post-transcendental 6-dp surv was the same engine-sensitive
    * pattern that hash-failed KM itself) — then integrates the step
    * function with one lead window:
    * RMST = t₁ + Σ S(tᵢ)·(t_{i+1}−tᵢ) + S(t_m)·(τ−t_m), every term an
    * exact s₆·gap integer product; the only double op is the final
    * exact division by 10⁶.
    * Scale: the kaplanMeier cost class — one user-keyed agg + an
    * event-time window.
    */
  def rmst(s: SparkSession, dir: String): DataFrame = {
    val km = kaplanMeier(s, dir)
      .select(col("t_day"), col("surv6"))
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy("user_id").agg(
      to_date(min(col("ts"))).as("d0"),
      to_date(min(when(col("event_type") === "purchase", col("ts"))))
        .as("dconv"))
    val horizon = ev.agg(to_date(max(col("ts"))).as("dmax"))
    val tau = perUser.crossJoin(broadcast(horizon))
      .select(
        when(col("dconv").isNotNull, datediff(col("dconv"), col("d0")))
          .otherwise(datediff(col("dmax"), col("d0"))).as("t"))
      .agg(max(col("t")).cast("long").as("tau"),
        count(lit(1)).as("n_users"))
    val w = Window.orderBy("t_day")
    // area = t₁·1 + Σᵢ (t_{i+1} − tᵢ)·S(tᵢ), with t_{m+1} = τ. Each
    // term is the exact integer product gap·s₆ — KM's surfaced LONG,
    // no float recovery — so the sum is merge-order-free and
    // engine-proof.
    val steps = km.crossJoin(broadcast(tau))
      .withColumn("tnext", coalesce(
        org.apache.spark.sql.functions.lead(col("t_day"), 1).over(w),
        col("tau")))
      .select(col("tau"), col("n_users"), col("t_day"),
        ((col("tnext") - col("t_day")) * col("surv6")).as("a6"))
    steps
      .agg(max(col("tau")).as("tau"), max(col("n_users")).as("n_users"),
        min(col("t_day")).as("t1"), sum(col("a6")).as("sa6"))
      .select(col("n_users"), col("tau"),
        q((col("t1").cast("double") * lit(1e6) +
          col("sa6").cast("double")) / lit(1e6), 4).as("rmst"))
  }

  /** Peaks-over-threshold tail fit (W443): generalized-Pareto shape
    * and scale for event-value exceedances over the exact 95th-
    * percentile threshold, by METHOD OF MOMENTS (ξ = ½(1 − m̄²/s²),
    * σ = ½·m̄·(m̄²/s² + 1)) — the all-exceedances complement of
    * [[evtGumbel]]'s block maxima (POT uses every tail point, not one
    * per block, so it converges at far smaller samples). The
    * threshold comes from the cross-multiplied cumulative rule on the
    * 1e-6 value grid (no percentile interpolation), exceedances stay
    * exact integers, and the two moment ratios are one fixed double
    * fold. ξ < 0 ⇒ bounded tail, ξ ≈ 0 ⇒ exponential, ξ > 0 ⇒ heavy.
    * Scale: one value-keyed count agg + one moment agg.
    */
  def potGpd(s: SparkSession, dir: String): DataFrame = {
    val v = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
        .as("v6"))
      .persist()
    CacheScope.register(v) // eager: threshold pick + the exceedance agg
    val byV = v.groupBy("v6").agg(count(lit(1)).as("cnt"))
    val tot = byV.agg(sum(col("cnt")).as("n"))
    val thr = byV
      .withColumn("cum", sum(col("cnt")).over(Window.orderBy("v6")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 100 >= col("n") * 95)
      .agg(min(col("v6")).as("thr6"))
    val ex = v.crossJoin(broadcast(thr))
      .filter(col("v6") > col("thr6"))
      .select((col("v6") - col("thr6")).as("e"), col("thr6"))
    val g = ex.groupBy("thr6").agg(count(lit(1)).as("k"),
      sum(col("e")).as("se"),
      sum(col("e") * col("e")).as("see"))
    val kD = col("k").cast("double")
    // population moments on the grid: m = Σe/k, s² = (kΣe² − (Σe)²)/k²
    val m = col("se").cast("double") / kD
    val s2 = (kD * col("see").cast("double") -
      col("se").cast("double") * col("se").cast("double")) / (kD * kD)
    val s2S = when(s2 === 0.0, lit(1.0)).otherwise(s2)
    val ratio = m * m / s2S
    val ok = col("k") >= 2 && s2 =!= 0.0
    g.select(col("k").as("n_exceed"),
      q(col("thr6").cast("double") / lit(1e6), 6).as("threshold"),
      when(ok, q(lit(0.5) * (lit(1.0) - ratio), 6)).otherwise(lit(0.0))
        .as("xi"),
      when(ok, q(lit(0.5) * m * (ratio + lit(1.0)) / lit(1e6), 6))
        .otherwise(lit(0.0)).as("sigma"))
  }

  /** Deterministic RANSAC trend fit (W444) on the dense daily count
    * series: every day pair proposes the line through its two points,
    * each proposal counts inliers with the FULLY EXACT cross-
    * multiplied test 20·n·|(y_t−y_i)·Δt_c − Δy_c·(t−t_i)| ≤ Σy·|Δt_c|
    * (tolerance = 5% of the mean level — scale-invariant, no float
    * anywhere in the consensus loop), and the best consensus wins
    * (ties → earlier anchor pair). Where [[olsTrend]] bends toward
    * outlier days and [[theilSen]] takes the median slope, RANSAC
    * surfaces the largest self-consistent regime AND how many days
    * sit outside it. Scale: the proposal×day volume is span³ —
    * day-bounded, never corpus-bounded; the corpus pays one day-keyed
    * count agg.
    */
  def ransacTrend(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(col("d0"), explode(sequence(col("d0"), col("d1")))
        .as("day"))
      .join(daily0, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(dense) // eager: proposals + the inlier probe
    val st = dense.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val cand = dense.select(col("t").as("ti"), col("y").as("yi"))
      .join(dense.select(col("t").as("tj"), col("y").as("yj")),
        col("ti") < col("tj"))
      .select(col("ti"), col("yi"), (col("tj") - col("ti")).as("dx"),
        (col("yj") - col("yi")).as("dy"))
    val probe = cand.crossJoin(broadcast(st))
      .crossJoin(dense)
      .select(col("ti"), col("yi"), col("dx"), col("dy"), col("n"),
        col("sy"),
        (abs((col("y") - col("yi")) * col("dx") -
          col("dy") * (col("t") - col("ti"))) * lit(20L) * col("n") <=
          col("sy") * col("dx")).cast("long").as("inlier"))
    val scored = probe.groupBy("ti", "dx", "dy", "n")
      .agg(sum(col("inlier")).as("n_inliers"))
    scored
      .orderBy(col("n_inliers").desc, col("ti"), col("dx"), col("dy"))
      .limit(1)
      .select(col("n").as("n_days"), col("ti").as("anchor_t"),
        q(col("dy").cast("double") / col("dx").cast("double"), 6)
          .as("slope"),
        col("n_inliers"),
        q(col("n_inliers").cast("double") / col("n").cast("double"), 6)
          .as("inlier_share"))
  }

  /** K-step Markov absorption probabilities (W447): for each
    * non-target state, the probability the user-journey chain REACHES
    * `target` within `rounds` steps — h_{t+1}(s) = P(s,target) +
    * Σ_{s'≠target} P(s,s')·h_t(s'), the hitting-probability recursion
    * that [[markovStationary]]'s long-run shares can't answer ("from
    * a support `error`, how likely is a purchase in the next 6
    * clicks?"). Transition probabilities ride the same 9-dp grid as
    * the stationary op (merge-order noise absorbed by per-round
    * rounding, the PageRank-family convention), and the state space
    * is |event types| — the per-round join is constant-size; the
    * corpus pays one lead-window transition count.
    */
  def markovAbsorption(s: SparkSession, dir: String, rounds: Int = 6,
                       target: String = "purchase"): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"),
      col("event_id"))
    val trans = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"),
        col("event_id"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    val tot = trans.groupBy("cur").agg(sum(col("c")).as("tc"))
    val p = trans.join(tot, "cur")
      .select(col("cur"), col("nxt"),
        round(col("c") / col("tc"), 9).as("p"))
      .localCheckpoint()
    val direct = p.filter(col("nxt") === target)
      .select(col("cur").as("st"), col("p").as("pd"))
    val states = p.select(col("cur").as("st")).distinct()
      .filter(col("st") =!= target)
    var h = states.join(direct, Seq("st"), "left")
      .select(col("st"), round(coalesce(col("pd"), lit(0.0)), 9)
        .as("h"))
      .localCheckpoint()
    for (_ <- 2 to rounds) {
      val gather = p.filter(col("nxt") =!= target)
        .join(h.select(col("st").as("s2"), col("h").as("hp")),
          col("nxt") === col("s2"))
        .groupBy(col("cur").as("stg"))
        .agg(sum(col("p") * col("hp")).as("acc"))
      h = states.join(direct, Seq("st"), "left")
        .join(gather, col("st") === col("stg"), "left")
        .select(col("st"), round(coalesce(col("pd"), lit(0.0)) +
          coalesce(col("acc"), lit(0.0)), 9).as("h"))
        .localCheckpoint()
    }
    h.select(col("st").as("state"), round(col("h"), 6).as("p_absorb"))
      .orderBy("state")
  }

  /** Two-sample Kolmogorov–Smirnov drift test (W450) between the
    * first and second half of the event stream (split at the median
    * day): did the VALUE distribution move? The supremum gap runs on
    * the exact cross-multiplied integers |cum₁·n₂ − cum₂·n₁| over the
    * union of distinct 1e-6 grid values, one division surfaces D, and
    * the 5% decision compares the 6-dp D against the 6-dp critical
    * value 1.358·√((n₁+n₂)/(n₁n₂)). The generic two-sample sibling of
    * [[Ml.ksStatistic]] (classifier score separation) and the
    * all-quantile upgrade of [[psiDrift]]'s binned divergence. Scale:
    * one value-keyed count agg per half + a distinct-values window.
    */
  def ksTwoSample(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .persist()
    CacheScope.register(ev) // eager: the split bound + both halves
    val mid = ev.agg(((min(col("day")) + max(col("day"))) / lit(2))
      .cast("long").as("mid"))
    val halves = ev.crossJoin(broadcast(mid))
      .select(col("v6"), (col("day") < col("mid")).cast("long")
        .as("h1"))
    val byV = halves.groupBy("v6")
      .agg(sum(col("h1")).as("c1"),
        sum(lit(1L) - col("h1")).as("c2"))
    val tot = byV.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val w = Window.orderBy("v6")
      .rowsBetween(Window.unboundedPreceding, 0)
    val gaps = byV
      .withColumn("cum1", sum(col("c1")).over(w))
      .withColumn("cum2", sum(col("c2")).over(w))
      .crossJoin(broadcast(tot))
      .select(col("n1"), col("n2"),
        abs(col("cum1").cast("decimal(38,0)") * col("n2") -
          col("cum2").cast("decimal(38,0)") * col("n1")).as("gap"))
    val g = gaps.groupBy("n1", "n2").agg(max(col("gap")).as("mx"))
    val n1D = col("n1").cast("double")
    val n2D = col("n2").cast("double")
    val d = q(col("mx").cast("double") / (n1D * n2D), 6)
    val crit = q(lit(1.358) * sqrt((n1D + n2D) / (n1D * n2D)), 6)
    g.select(col("n1"), col("n2"), d.as("d_stat"), crit.as("critical"),
      (d > crit).cast("long").as("drift_flag"))
  }

  /** Binary transfer entropy view→purchase (W451): after median-
    * splitting both dense daily series, TE = Σ p(y',x',y)·
    * ln[p(y|y',x')/p(y|y')] over the 8 lag-triple cells — does
    * yesterday's VIEW level carry information about today's PURCHASE
    * level beyond purchase's own history? The nonlinear,
    * direction-aware complement of [[grangerCausality]] (which only
    * sees linear mean shifts) and the dynamic sibling of
    * [[mutualInformation]]. Cell counts and all four marginals are
    * exact integers; each cell's log-ratio lands once on the 1e-9
    * grid and the weighted sum divides once by N. Scale: one
    * day-keyed agg + an 8-row fold.
    */
  def transferEntropy(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        (col("event_type") === "view").cast("long").as("isv"))
      .groupBy("day")
      .agg(sum(col("isv")).as("x"), sum(lit(1L) - col("isv")).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(dense) // eager: two medians + the triple scan
    def med(c: String) = {
      val byV = dense.groupBy(col(c).as("v")).agg(count(lit(1)).as("k"))
      val n = byV.agg(sum(col("k")).as("n"))
      byV.withColumn("cum", sum(col("k")).over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(n))
        .filter(col("cum") * 2 >= col("n"))
        .agg(min(col("v")).as(s"med$c"))
    }
    val w = Window.orderBy("day")
    // strictly ABOVE the lower median: `>=` would degenerate to
    // all-ones whenever the low value carries exactly half the mass
    val bin = dense.crossJoin(broadcast(med("x")))
      .crossJoin(broadcast(med("y")))
      .select(col("day"), (col("x") > col("medx")).cast("long")
        .as("bx"), (col("y") > col("medy")).cast("long").as("by"))
    val trip = bin
      .withColumn("byl", org.apache.spark.sql.functions.lag(col("by"), 1)
        .over(w))
      .withColumn("bxl", org.apache.spark.sql.functions.lag(col("bx"), 1)
        .over(w))
      .filter(col("byl").isNotNull)
      .groupBy(col("byl"), col("bxl"), col("by"))
      .agg(count(lit(1)).as("c"))
      .persist()
    CacheScope.register(trip) // eager: four marginals read it
    val cYX = trip.groupBy(col("byl").as("a1"), col("bxl").as("a2"))
      .agg(sum(col("c")).as("cyx"))
    val cYY = trip.groupBy(col("byl").as("b1"), col("by").as("b2"))
      .agg(sum(col("c")).as("cyy"))
    val cY = trip.groupBy(col("byl").as("d1")).agg(sum(col("c")).as("cy"))
    val n = trip.agg(sum(col("c")).as("nn"))
    val terms = trip
      .join(cYX, col("byl") === col("a1") && col("bxl") === col("a2"))
      .join(cYY, col("byl") === col("b1") && col("by") === col("b2"))
      .join(cY, col("byl") === col("d1"))
      .select(col("c"),
        floor(log((col("c").cast("double") * col("cy").cast("double")) /
          (col("cyx").cast("double") * col("cyy").cast("double"))) *
          lit(1e9) + lit(0.5)).cast("long").as("l9"))
    terms.crossJoin(broadcast(n))
      .agg(max(col("nn")).as("n_obs"),
        sum(col("c") * col("l9")).as("te9"))
      .select(col("n_obs"),
        q(col("te9").cast("double") /
          (col("n_obs").cast("double") * lit(1e9)), 6).as("te_nats"),
        (q(col("te9").cast("double") /
          (col("n_obs").cast("double") * lit(1e9)), 6) > lit(0.01))
          .cast("long").as("flow_flag"))
  }

  /** Empirical upper-tail dependence (W452) between the daily view
    * and click series: λ_U = P(x > q₈₀(x) | y > q₈₀(y)) — when one
    * series spikes, does the other spike WITH it? Correlation can be
    * high while tails are independent (and vice versa); tail
    * dependence is what capacity planning actually needs. Both
    * thresholds come from the exact cumulative rule, the conditional
    * probability is one division of exact counts, and the
    * independence baseline P(x > q₈₀) is surfaced next to it. Scale:
    * one day-keyed agg + two tiny threshold windows.
    */
  def tailDependence(s: SparkSession, dir: String): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .filter(col("event_type").isin("view", "click"))
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"),
        (col("event_type") === "view").cast("long").as("isv"))
      .groupBy("day")
      .agg(sum(col("isv")).as("x"), sum(lit(1L) - col("isv")).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(coalesce(col("x"), lit(0L)).as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(dense) // eager: two thresholds + the joint scan
    def q80(c: String) = {
      val byV = dense.groupBy(col(c).as("v")).agg(count(lit(1)).as("k"))
      val n = byV.agg(sum(col("k")).as("n"))
      byV.withColumn("cum", sum(col("k")).over(Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)))
        .crossJoin(broadcast(n))
        .filter(col("cum") * 5 >= col("n") * 4)
        .agg(min(col("v")).as(s"t$c"))
    }
    val g = dense.crossJoin(broadcast(q80("x")))
      .crossJoin(broadcast(q80("y")))
      .agg(count(lit(1)).as("n"),
        sum((col("x") > col("tx")).cast("long")).as("nx"),
        sum((col("y") > col("ty")).cast("long")).as("ny"),
        sum((col("x") > col("tx") && col("y") > col("ty"))
          .cast("long")).as("nxy"),
        max(col("tx")).as("tx"), max(col("ty")).as("ty"))
    val nyS = when(col("ny") === 0, lit(1L)).otherwise(col("ny"))
    g.select(col("n").as("n_days"), col("tx"), col("ty"),
      col("nxy").as("n_joint"),
      when(col("ny") > 0, q(col("nxy").cast("double") /
        nyS.cast("double"), 6)).otherwise(lit(0.0)).as("lambda_u"),
      q(col("nx").cast("double") / col("n").cast("double"), 6)
        .as("indep_base"))
  }

  /** Rayleigh test for hour-of-day uniformity (W453): the resultant
    * length of the 24 hourly counts placed on the unit circle —
    * R̄² = (S² + C²)/n², z = n·R̄², p ≈ e^(−z) — "is activity FLAT
    * around the clock, or does it have a preferred hour?", the
    * circular-statistics primitive behind [[seasonalHourly]]'s
    * descriptive profile. The 24 cos/sin weights are DRIVER-COMPUTED
    * 1e-9 integer literals injected identically into both engines
    * (never per-engine libm trig), so S and C are exact integer dot
    * products and only the final z/p expression is float. Scale: one
    * hour-keyed count agg + a 24-row fold.
    */
  def rayleighUniformity(s: SparkSession, dir: String): DataFrame = {
    val weights = (0 until 24).map { h =>
      val a = 2 * math.Pi * h / 24
      (h, math.floor(math.cos(a) * 1e9 + 0.5).toLong,
        math.floor(math.sin(a) * 1e9 + 0.5).toLong)
    }
    import s.implicits._
    val wdf = broadcast(weights.toDF("hr", "c9", "s9"))
    val byH = Tables.events(s, dir)
      .select(hour(col("ts")).as("hr"))
      .groupBy("hr").agg(count(lit(1)).as("cnt"))
    val g = byH.join(wdf, "hr")
      .agg(sum(col("cnt")).as("n"),
        sum(col("cnt").cast("decimal(38,0)") * col("c9")).as("sc"),
        sum(col("cnt").cast("decimal(38,0)") * col("s9")).as("ss"))
    val nD = col("n").cast("double")
    val r2 = (col("sc").cast("double") * col("sc").cast("double") +
      col("ss").cast("double") * col("ss").cast("double")) /
      (nD * nD * lit(1e18))
    val z = nD * r2
    g.select(col("n").as("n_events"), q(z, 4).as("rayleigh_z"),
      q(exp(-z), 6).as("p_approx"),
      (q(exp(-z), 6) < lit(0.05)).cast("long").as("nonuniform_flag"))
  }

  /** HAC (Newey–West, Bartlett lag 5) confidence interval for the
    * daily mean (W456): the daily count series is autocorrelated, so
    * the naive se = s/√n UNDERSTATES uncertainty — the long-run
    * variance replaces s² with γ₀ + 2Σ(1−j/(L+1))γⱼ, the same exact
    * integer lag-product chain as [[kpssTest]] (demeaned residuals
    * cross-multiplied to e′ = n·y − Σy, every γ′ⱼ exact DECIMAL, the
    * L+1 weight denominator folded exactly). Surfacing naive and HAC
    * se side by side shows how much the iid illusion flatters the
    * CI. Scale: one day-keyed agg + an O(L)-lag window.
    */
  def hacMeanCi(s: SparkSession, dir: String, lag: Int = 5): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily0, Seq("day"), "left")
      .select(col("day"), coalesce(col("y"), lit(0L)).as("y"))
    val st = dense.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
    val w = Window.orderBy("day")
    val e = dense.crossJoin(broadcast(st))
      .select(col("day"), col("n"), col("sy"),
        (col("y") * col("n") - col("sy")).as("e"))
    val prodCols = (0 to lag).map(j =>
      (col("e").cast("decimal(38,0)") *
        org.apache.spark.sql.functions.lag(col("e"), j).over(w))
        .as(s"p$j"))
    val prods = e.select(Seq(col("n"), col("sy")) ++ prodCols: _*)
    val aggs = prods.groupBy("n", "sy").agg(
      sum(col("p0")).as("g0"),
      (1 to lag).map(j => sum(col(s"p$j")).as(s"g$j")): _*)
    val lrn = (1 to lag).foldLeft(
      col("g0") * lit(lag + 1): org.apache.spark.sql.Column)(
      (acc, j) => acc + col(s"g$j") * lit(2 * (lag + 1 - j)))
    val nD = col("n").cast("double")
    val mean = col("sy").cast("double") / nD
    // γ′ units are (n·e)²: σ²_lr = lrn/((L+1)·n³); se² = σ²_lr/n
    val seHac = sqrt(greatest(lit(0.0),
      lrn.cast("double") / (lit((lag + 1).toDouble) * nD * nD * nD *
        nD)))
    val seNaive = sqrt(greatest(lit(0.0),
      col("g0").cast("double") / (nD * nD * nD * nD)))
    aggs.select(col("n").as("n_days"), q(mean, 6).as("mean_daily"),
      q(seNaive, 6).as("se_naive"), q(seHac, 6).as("se_hac"),
      q(mean - lit(1.959964) * seHac, 6).as("ci_lo"),
      q(mean + lit(1.959964) * seHac, 6).as("ci_hi"))
  }

  /** Poisson GLM trend (W459): y_t ~ Poisson(exp(a + b·t)) over the
    * dense daily series, fit by `rounds` unrolled Newton steps — the
    * COUNT-correct alternative to [[olsTrend]]'s Gaussian line (no
    * negative fitted counts, multiplicative rate_ratio = e^b per
    * day). Cross-engine determinism for an iterative libm fit: each
    * step's fitted means land on the 1e-6 integer grid
    * (μ₆ = ⌊e^{a+bt}·10⁶+½⌋ — exp of IDENTICAL quantized (a,b) both
    * sides), so the gradient/Hessian sums are exact integers and the
    * 2×2 Newton solve is one fixed double expression, re-quantized
    * to 1e-9 before the next step. Scale: rounds × one day-spine
    * scan — the state is two scalars.
    */
  def poissonGlmTrend(s: SparkSession, dir: String,
                      rounds: Int = 3): DataFrame = {
    val daily0 = Tables.events(s, dir)
      .select(floor(unix_timestamp(col("ts")) / lit(86400L)).as("day"))
      .groupBy("day").agg(count(lit(1)).as("y"))
    val bounds = daily0.agg(min("day").as("d0"), max("day").as("d1"))
    val dense = bounds
      .select(col("d0"), explode(sequence(col("d0"), col("d1")))
        .as("day"))
      .join(daily0, Seq("day"), "left")
      .select((col("day") - col("d0")).as("t"),
        coalesce(col("y"), lit(0L)).as("y"))
      .persist()
    CacheScope.register(dense) // eager: init + every Newton scan
    val q9 = (c: org.apache.spark.sql.Column) =>
      floor(c * lit(1e9) + lit(0.5)) / lit(1e9)
    var state = dense
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      .select(q9(log(greatest(col("sy").cast("double") /
        col("n").cast("double"), lit(1.0)))).as("a"),
        lit(0.0).as("b"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val mu = dense.crossJoin(broadcast(state))
        .select(col("t"), col("y"), col("a"), col("b"),
          floor(exp(col("a") + col("b") * col("t")) * lit(1e6) +
            lit(0.5)).cast("long").as("m6"))
      val g = mu.groupBy("a", "b").agg(
        sum(col("m6")).as("s0"),
        sum(col("m6") * col("t")).as("s1"),
        sum(col("m6").cast("decimal(38,0)") * col("t") * col("t"))
          .as("s2"),
        sum(col("y") * lit(1000000L)).as("y0"),
        sum(col("y") * col("t") * lit(1000000L)).as("y1"))
      val det = col("s0").cast("decimal(38,0)") * col("s2") -
        col("s1").cast("decimal(38,0)") * col("s1")
      val detS = when(det === 0, lit(1)).otherwise(det).cast("double")
      val u0 = (col("y0") - col("s0")).cast("double")
      val u1 = (col("y1") - col("s1")).cast("double")
      val da = (col("s2").cast("double") * u0 -
        col("s1").cast("double") * u1) / detS
      val db = (col("s0").cast("double") * u1 -
        col("s1").cast("double") * u0) / detS
      state = g.select(q9(col("a") + da).as("a"),
        q9(col("b") + db).as("b")).localCheckpoint()
    }
    val n = dense.agg(count(lit(1)).as("n"))
    state.crossJoin(broadcast(n))
      .select(col("n").as("n_days"), q(col("a"), 6).as("a_intercept"),
        q(col("b"), 6).as("b_slope"),
        q(exp(col("b")), 6).as("rate_ratio"))
  }

  /** Weibull plotting-position fit (W460) of conversion times: OLS of
    * ln(−ln(1−F_i)) on ln(t_i) over the distinct event-day points,
    * with Bernard's median ranks F = (i − 0.3)/(m + 0.4) from exact
    * cumulative counts — shape k (slope) and scale λ = e^{−c/k}
    * answer "is conversion hazard rising (k > 1) or front-loaded
    * (k < 1)?", the parametric layer over [[kaplanMeier]]'s
    * nonparametric curve. Both log coordinates land on 1e-9 integer
    * grids before EXACT DECIMAL OLS sums (the priceElasticity
    * recipe); one division each for slope/intercept/R². Scale: one
    * user-keyed duration agg + a distinct-day window.
    */
  def weibullPlotFit(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val perUser = ev.groupBy("user_id").agg(
      to_date(min(col("ts"))).as("d0"),
      to_date(min(when(col("event_type") === "purchase", col("ts"))))
        .as("dconv"))
      .filter(col("dconv").isNotNull)
      .select(datediff(col("dconv"), col("d0")).cast("long").as("t"))
      .filter(col("t") >= 1)
    val byT = perUser.groupBy("t").agg(count(lit(1)).as("c"))
    val m = byT.agg(sum(col("c")).as("m"))
    val pts = byT
      .withColumn("cum", sum(col("c")).over(Window.orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)))
      .crossJoin(broadcast(m))
      .select(col("t"), col("cum"), col("m"),
        floor(log(col("t").cast("double")) * lit(1e9) + lit(0.5))
          .cast("long").as("x9"),
        floor(log(-log(lit(1.0) -
          (col("cum").cast("double") - lit(0.3)) /
          (col("m").cast("double") + lit(0.4)))) * lit(1e9) +
          lit(0.5)).cast("long").as("y9"))
    val g = pts.agg(count(lit(1)).as("k"), max(col("m")).as("m"),
      sum(col("x9")).as("sx"), sum(col("y9")).as("sy"),
      sum(col("x9").cast("decimal(38,0)") * col("x9")).as("sxx"),
      sum(col("x9").cast("decimal(38,0)") * col("y9")).as("sxy"),
      sum(col("y9").cast("decimal(38,0)") * col("y9")).as("syy"))
    val kD = col("k").cast("double")
    val bn = kD * col("sxy").cast("double") -
      col("sx").cast("double") * col("sy").cast("double")
    val bd = kD * col("sxx").cast("double") -
      col("sx").cast("double") * col("sx").cast("double")
    val dd = kD * col("syy").cast("double") -
      col("sy").cast("double") * col("sy").cast("double")
    val bdS = when(bd === 0.0, lit(1.0)).otherwise(bd)
    val ddS = when(dd === 0.0, lit(1.0)).otherwise(dd)
    val slope = bn / bdS
    val inter = (col("sy").cast("double") - slope *
      col("sx").cast("double")) / (kD * lit(1e9))
    val slopeS = when(bn === 0.0, lit(1.0)).otherwise(slope)
    val okW = col("k") >= 2 && bd =!= 0.0
    g.select(col("m").as("n_conversions"), col("k").as("n_points"),
      when(okW, q(slope, 4)).otherwise(lit(0.0)).as("k_shape"),
      when(okW && bn =!= 0.0, q(exp(-inter / slopeS), 2))
        .otherwise(lit(0.0)).as("lambda_scale"),
      when(okW && dd =!= 0.0, q(bn * bn / (bdS * ddS), 6))
        .otherwise(lit(0.0)).as("r2"))
  }

  /** Zero-inflation score test (W465, van den Broek): do MORE users
    * make zero purchases than a Poisson with the observed mean
    * predicts? S = (n₀ − n·p̂₀)² / (n·p̂₀(1−p̂₀) − n·ȳ·p̂₀²) against
    * χ²(1) — the "is there a never-buyer segment?" gate run before
    * fitting any count model ([[poissonGlmTrend]] silently assumes
    * no). Per-user counts are exact; p̂₀ = e^{−λ̂} lands once on the
    * 1e-9 grid (λ̂ from exact integer sums), and the score is one
    * fixed double expression. A non-positive variance denominator
    * (degenerate fits) gates to 0. Scale: one user-keyed agg + one
    * moment agg.
    */
  def zeroInflation(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(sum((col("event_type") === "purchase").cast("long"))
        .as("k"))
    val g = perUser.agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
      sum((col("k") === 0).cast("long")).as("n0"))
    val nD = col("n").cast("double")
    val lam = col("sk").cast("double") / nD
    val p09 = floor(exp(-lam) * lit(1e9) + lit(0.5)).cast("long")
    val p0 = p09.cast("double") / lit(1e9)
    val expZero = nD * p0
    val den = nD * p0 * (lit(1.0) - p0) - nD * lam * p0 * p0
    val denS = when(den <= 0.0, lit(1.0)).otherwise(den)
    val sc = (col("n0").cast("double") - expZero) *
      (col("n0").cast("double") - expZero) / denS
    g.select(col("n").as("n_users"), q(lam, 6).as("lambda_hat"),
      col("n0").as("obs_zero"), q(expZero, 2).as("exp_zero"),
      when(den > 0.0, q(sc, 4)).otherwise(lit(0.0)).as("score"),
      when(den > 0.0 && q(sc, 4) > lit(3.84), lit(1L))
        .otherwise(lit(0L)).as("zero_inflated_flag"))
  }

  /** k-anonymity generalization sweep (W473): re-identification risk
    * of the (event_type, time-bucket) quasi-identifier at THREE time
    * granularities — hour, 4-hour, day — surfacing how the violating-
    * class count and the true at-risk USER share (countDistinct over
    * violating classes, the [[kAnonymity]] contract) fall as the
    * release coarsens: the privacy–utility frontier a data publisher
    * walks before picking a granularity. All counts exact; one
    * division per row. Scale: three (type, bucket)-keyed aggs + one
    * distinct-user semi-join each — the violating-class list is tiny
    * and broadcasts.
    */
  def anonymitySweep(s: SparkSession, dir: String,
                     k: Int = 5): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        (floor(unix_timestamp(col("ts")) / lit(3600L))).as("hb"))
      .persist()
    CacheScope.register(ev) // eager: all three granularities read it
    val totUsers = ev.agg(countDistinct(col("user_id")).as("nu"))
    val rows = Seq(("hour", 1L), ("4hour", 4L), ("day", 24L)).map {
      case (nm, div) =>
        val rowsG = ev.select(col("event_type"),
          (col("hb") / lit(div)).cast("long").as("b"), col("user_id"))
        val classes = rowsG.groupBy("event_type", "b")
          .agg(countDistinct(col("user_id")).as("cu"))
        val viol = classes.filter(col("cu") < k)
        val atRisk = rowsG
          .join(broadcast(viol.select("event_type", "b")),
            Seq("event_type", "b"))
          .agg(coalesce(countDistinct(col("user_id")), lit(0L))
            .as("ur"))
        classes.agg(count(lit(1)).as("n_classes"),
            sum((col("cu") < k).cast("long")).as("n_violating"))
          .crossJoin(broadcast(atRisk))
          .crossJoin(broadcast(totUsers))
          .select(lit(nm).as("granularity"), col("n_classes"),
            col("n_violating"),
            q(col("ur").cast("double") / col("nu").cast("double"), 6)
              .as("user_risk_share"))
    }
    rows.reduce(_ unionAll _).orderBy("granularity")
  }

  /** Ansari–Bradley two-sample scale test (W474) between the hash
    * arms of [[obfSequential]]: did the experiment change the SPREAD
    * of `value`, not its location? AB scores rank from both ends
    * (a(r) = min(r, N+1−r)); the arm-A score total comes from the
    * value-grid count table via the exact piecewise closed form
    * f(m) = Σ_{r≤m} a(r) per block (ties deterministically give arm A
    * the lower ranks — documented convention, never a row sort), so
    * `t_ab` is an exact integer. The null mean/variance are the
    * classical parity-split rationals evaluated as one pinned-order
    * double chain over exact ≤2⁵³ LONGs — no libm, engine-proof.
    * Scale: one value-keyed agg + a window over DISTINCT grid values.
    */
  def ansariBradley(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
        .as("vi"),
        (pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L),
          lit(100L)) < 50).cast("long").as("isA"))
    val byV = ev.groupBy("vi").agg(count(lit(1)).as("ct"),
      sum(col("isA")).as("ca"))
    val tot = byV.agg(sum(col("ct")).as("nn"), sum(col("ca")).as("na"))
    val cb = coalesce(sum(col("ct")).over(
      Window.orderBy("vi").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val blocks = byV.select(col("ct"), col("ca"), cb.as("cb"))
      .crossJoin(broadcast(tot))
      .withColumn("h", expr("(nn + 1) div 2"))
      .withColumn("m0", col("cb"))
      .withColumn("m1", col("cb") + col("ca"))
      .withColumn("fa", expr(
        """CASE WHEN m1 <= h THEN (m1 * (m1 + 1)) div 2
             ELSE (h * (h + 1)) div 2 +
               ((2 * nn + 1 - h - m1) * (m1 - h)) div 2 END -
           CASE WHEN m0 <= h THEN (m0 * (m0 + 1)) div 2
             ELSE (h * (h + 1)) div 2 +
               ((2 * nn + 1 - h - m0) * (m0 - h)) div 2 END"""))
    val g = blocks.agg(max(col("nn")).as("nn"), max(col("na")).as("na"),
      sum(col("fa")).as("ta"))
    val nnD = col("nn").cast("double")
    val naD = col("na").cast("double")
    val nbD = (col("nn") - col("na")).cast("double")
    val even = pmod(col("nn"), lit(2L)) === 0
    val e = when(even, (naD * (nnD + lit(2.0))) / lit(4.0))
      .otherwise((naD * (nnD + lit(1.0)) * (nnD + lit(1.0))) /
        (lit(4.0) * nnD))
    val v = when(even,
      (naD * nbD * (nnD + lit(2.0)) * (nnD - lit(2.0))) /
        (lit(48.0) * (nnD - lit(1.0))))
      .otherwise((naD * nbD * (nnD + lit(1.0)) *
        (lit(3.0) + nnD * nnD)) / (lit(48.0) * nnD * nnD))
    val z = when(v > 0,
      q((col("ta").cast("double") - e) / sqrt(v), 6)).otherwise(lit(0.0))
    g.select(col("na").as("n_a"), (col("nn") - col("na")).as("n_b"),
      col("ta").as("t_ab"), z.as("z"),
      (abs(z) > lit(1.959964)).cast("long").as("scale_differs"))
  }

  /** Mood's median test (W475) across event types: do the types share
    * one median `value`? The grand median is the cross-multiplied
    * cumulative rule on the cent grid (2·cum ≥ N — an exact integer,
    * no interpolation); per-type above-median counts make a 2×k
    * contingency whose χ² terms are pinned-order doubles over exact
    * integers, each quantized to the 1e-9 LONG grid BEFORE the
    * order-free sum. The critical value is Wilson–Hilferty with a
    * driver-injected z₉₅ — the [[dispersionTest]] recipe. One
    * value-keyed agg + one type-keyed agg.
    */
  def moodMedian(s: SparkSession, dir: String): DataFrame = {
    val z95 = 1.6448536269514722
    val vi = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("v2"))
    val byV = vi.groupBy("v2").agg(count(lit(1)).as("ct"))
    val tot = byV.agg(sum(col("ct")).as("ntot"))
    val cum = sum(col("ct")).over(Window.orderBy("v2")
      .rowsBetween(Window.unboundedPreceding, 0))
    val med = byV.select(col("v2"), cum.as("cum"))
      .crossJoin(broadcast(tot))
      .filter(col("cum") * 2 >= col("ntot"))
      .agg(min(col("v2")).as("med2"))
    val perType = vi.crossJoin(broadcast(med))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum((col("v2") > col("med2")).cast("long")).as("a"),
        max(col("med2")).as("med2"))
    val g = perType.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("a")).as("m"), max(col("med2")).as("med2"))
    val p = col("m").cast("double") / col("nn").cast("double")
    val ea = col("n").cast("double") * p
    val eb = col("n").cast("double") * (lit(1.0) - p)
    val diff = col("a").cast("double") - ea
    val term = diff * diff / ea + diff * diff / eb
    val terms = perType.drop("med2").crossJoin(broadcast(g))
      .select(col("k"), col("nn"), col("m"), col("med2"),
        when(col("m") > 0 && col("m") < col("nn"),
          floor(term * lit(1e9) + lit(0.5)).cast("long"))
          .otherwise(lit(0L)).as("t9"))
    val kk = (col("k") - 1).cast("double")
    val aa = lit(1.0) - lit(2.0) / (lit(9.0) * kk) +
      lit(z95) * sqrt(lit(2.0) / (lit(9.0) * kk))
    val chi2 = q(sum(col("t9")).cast("double") / lit(1e9), 6)
    terms.groupBy("k", "nn", "m", "med2")
      .agg(chi2.as("chi2"))
      .select(col("k").as("n_types"), col("nn").as("n_total"),
        (col("med2").cast("double") / lit(100.0)).as("median"),
        col("chi2"), q(kk * aa * (aa * aa), 6).as("chi2_crit"),
        (col("chi2") > q(kk * aa * (aa * aa), 6)).cast("long")
          .as("median_differs"))
  }

  /** Jonckheere–Terpstra ordered-alternative trend test (W476): does
    * `value` drift monotonically across the week (groups = epoch-day
    * mod 7, an ordered 7-level factor both engines derive
    * identically)? 2·JT accumulates per grid value as
    * Σ_{i<j} c_j·(2·C_i + c_i) (strict wins + half-ties, DOUBLED so
    * every quantity is an exact integer) over the 21 ordered group
    * pairs — one expression per row of the value-count table, never a
    * pairwise join. The no-tie null moments are exact LONGs
    * (4E = N²−Σn², 72V = N²(2N+3)−Σn²(2n+3), both < 2⁵³ at any
    * fixture SF), and z is one pinned-order double chain. Scale: one
    * value-keyed agg + one window over distinct grid values.
    */
  def jonckheereTerpstra(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
        .as("vi"),
        pmod(expr("unix_timestamp(ts) div 86400"), lit(7L)).as("g"))
    val cCols = (0 until 7).map(i =>
      sum((col("g") === i).cast("long")).as(s"c$i"))
    val byV = ev.groupBy("vi").agg(cCols.head, cCols.tail: _*)
    val w = Window.orderBy("vi").rowsBetween(Window.unboundedPreceding, -1)
    val withCum = byV.select(col("vi") +: (0 until 7).flatMap(i => Seq(
      col(s"c$i"),
      coalesce(sum(col(s"c$i")).over(w), lit(0L)).as(s"cc$i"))): _*)
    val contrib = (0 until 7).flatMap(i => (i + 1 until 7).map(j =>
      col(s"c$j") * (lit(2L) * col(s"cc$i") + col(s"c$i"))))
      .reduce(_ + _)
    val nCols = (0 until 7).map(i => sum(col(s"c$i")).as(s"n$i"))
    val g = withCum.select(contrib.as("row2") +:
        (0 until 7).map(i => col(s"c$i")): _*)
      .agg(sum(col("row2")).as("jt2"), nCols: _*)
    val nTot = (0 until 7).map(i => col(s"n$i")).reduce(_ + _)
    val sumN2 = (0 until 7).map(i => col(s"n$i") * col(s"n$i"))
      .reduce(_ + _)
    val sumN2w = (0 until 7).map(i =>
      col(s"n$i") * col(s"n$i") * (lit(2L) * col(s"n$i") + lit(3L)))
      .reduce(_ + _)
    val withTot = g.withColumn("ntot", nTot)
      .withColumn("d4", lit(2L) * col("jt2") -
        (col("ntot") * col("ntot") - sumN2))
      .withColumn("w72", col("ntot") * col("ntot") *
        (lit(2L) * col("ntot") + lit(3L)) - sumN2w)
    val z = when(col("w72") > 0,
      q((col("d4").cast("double") / lit(4.0)) /
        sqrt(col("w72").cast("double") / lit(72.0)), 6))
      .otherwise(lit(0.0))
    withTot.select(col("ntot").as("n_total"), col("jt2"),
      z.as("z"), (abs(z) > lit(1.959964)).cast("long").as("trend"))
  }

  /** Brown–Forsythe variance-homogeneity test (W477) across event
    * types — Levene's test on |x − group MEDIAN| (the robust variant):
    * are the per-type `value` spreads equal enough for pooled-variance
    * methods? Group medians are exact cent-grid integers
    * (cross-multiplied cumulative rule per type), absolute deviations
    * are exact LONGs, and both the between-group and within-group
    * sums of squares ride exact (S, Q, n) per type with each group
    * term quantized to a 1e-3 LONG before the order-free sum. The
    * heterogeneity flag compares (k−1)·W to the Wilson–Hilferty
    * χ²₉₅(k−1) (driver-injected z₉₅), the large-N approximation
    * documented on [[dispersionTest]]. Two keyed aggs + one broadcast
    * median join.
    */
  def brownForsythe(s: SparkSession, dir: String): DataFrame = {
    val z95 = 1.6448536269514722
    val vi = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(col("event_type"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("v2"))
    val byTV = vi.groupBy("event_type", "v2").agg(count(lit(1)).as("ct"))
    val wT = Window.partitionBy("event_type").orderBy("v2")
      .rowsBetween(Window.unboundedPreceding, 0)
    val nT = Window.partitionBy("event_type")
    val med = byTV
      .withColumn("cum", sum(col("ct")).over(wT))
      .withColumn("ng", sum(col("ct")).over(nT))
      .filter(col("cum") * 2 >= col("ng"))
      .groupBy(col("event_type").as("et"))
      .agg(min(col("v2")).as("medg"))
    val z = vi.join(broadcast(med), col("event_type") === col("et"))
      .select(col("event_type"), abs(col("v2") - col("medg")).as("z"))
    val perType = z.groupBy("event_type").agg(count(lit(1)).as("n"),
      sum(col("z")).as("s1"), sum(col("z") * col("z")).as("s2"))
    val g = perType.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
      sum(col("s1")).as("st"))
    val zbarG = col("s1").cast("double") / col("n").cast("double")
    val zbar = col("st").cast("double") / col("nn").cast("double")
    val numT = col("n").cast("double") * ((zbarG - zbar) * (zbarG - zbar))
    val denT = col("s2").cast("double") -
      (col("s1").cast("double") * col("s1").cast("double")) /
        col("n").cast("double")
    val terms = perType.crossJoin(broadcast(g))
      .select(col("k"), col("nn"),
        floor(numT * lit(1e3) + lit(0.5)).cast("long").as("num3"),
        floor(denT * lit(1e3) + lit(0.5)).cast("long").as("den3"))
    val agg = terms.groupBy("k", "nn")
      .agg(sum(col("num3")).as("num3"), sum(col("den3")).as("den3"))
    val kk = (col("k") - 1).cast("double")
    val bfw = when(col("den3") > 0,
      ((col("nn") - col("k")).cast("double") / kk) *
        (col("num3").cast("double") / col("den3").cast("double")))
      .otherwise(lit(0.0))
    val aa = lit(1.0) - lit(2.0) / (lit(9.0) * kk) +
      lit(z95) * sqrt(lit(2.0) / (lit(9.0) * kk))
    val crit = q(kk * aa * (aa * aa), 6)
    agg.select(col("k").as("n_types"), col("nn").as("n_total"),
      q(bfw, 6).as("bf_w"), crit.as("chi2_crit"),
      (q(kk * bfw, 6) > crit).cast("long").as("variance_heterogeneous"))
  }

  /** Kuiper two-sample test (W478) between the hash arms — the
    * rotation-invariant KS variant V = D⁺ + D⁻ that catches SPREAD
    * and tail differences a one-sided sup misses. Both CDF gaps are
    * cross-multiplied exact integers over the value-grid cumulative
    * counts (sup includes the 0 boundary), so `dplus_num`/`dminus_num`
    * are LONGs; V and the asymptotic flag V·√(n_e) > 1.747 (the 95%
    * Kuiper point, a driver literal) are pinned-order doubles. One
    * value-keyed agg + one bounded window.
    */
  def kuiperTwoSample(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(floor(col("value") * lit(1e6) + lit(0.5)).cast("long")
        .as("vi"),
        (pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L),
          lit(100L)) < 50).cast("long").as("isA"))
    val byV = ev.groupBy("vi").agg(count(lit(1)).as("ct"),
      sum(col("isA")).as("ca"))
    val w = Window.orderBy("vi")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cums = byV.select(
      sum(col("ca")).over(w).as("cpa"),
      (sum(col("ct")).over(w) - sum(col("ca")).over(w)).as("cpb"))
    val tot = byV.agg(sum(col("ca")).as("na"),
      (sum(col("ct")) - sum(col("ca"))).as("nb"))
    val g = cums.crossJoin(broadcast(tot))
      .agg(max(col("na")).as("na"), max(col("nb")).as("nb"),
        greatest(max(col("cpa") * col("nb") - col("cpb") * col("na")),
          lit(0L)).as("dp"),
        greatest(max(col("cpb") * col("na") - col("cpa") * col("nb")),
          lit(0L)).as("dm"))
    val vstat = (col("dp") + col("dm")).cast("double") /
      (col("na").cast("double") * col("nb").cast("double"))
    val ne = (col("na").cast("double") * col("nb").cast("double")) /
      (col("na") + col("nb")).cast("double")
    g.select(col("na").as("n_a"), col("nb").as("n_b"),
      col("dp").as("dplus_num"), col("dm").as("dminus_num"),
      q(vstat, 6).as("v_stat"),
      (q(vstat * sqrt(ne), 6) > lit(1.747)).cast("long")
        .as("distribution_differs"))
  }

  /** Hodges–Lehmann shift estimate (W479) between the hash arms'
    * DAILY revenue totals: the median of all pairwise differences —
    * the robust "how much did the experiment move daily revenue?"
    * number that a mean-difference can't give under outliers. Daily
    * totals are exact 1e-6-grid LONGs; the pair frame is
    * span-bounded² (days × days, never corpus²) so the cross join is
    * a constant-size grid at any corpus scale; the median is the
    * exact lower/upper-middle selection by row_number (both
    * surfaced), and `hl_shift` is their exact midpoint over two
    * divisions. No transcendental anywhere.
    */
  def hodgesLehmann(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(expr("unix_timestamp(ts) div 86400").as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("vi"),
        (pmod(pmod(col("user_id"), lit(2147483648L)) * lit(8388593L),
          lit(100L)) < 50).cast("long").as("isA"))
    // persisted: each arm's daily agg feeds BOTH its count() and the
    // diffs grid — unpersisted, the events scan + daily agg would run
    // up to three times (two count jobs + the diffs job)
    val da = ev.filter(col("isA") === 1).groupBy("day")
      .agg(sum(col("vi")).as("va")).persist()
    val db = ev.filter(col("isA") === 0).groupBy(col("day").as("dayb"))
      .agg(sum(col("vi")).as("vb")).persist()
    graft.CacheScope.register(da)
    graft.CacheScope.register(db)
    val diffs = da.crossJoin(db)
      .select((col("va") - col("vb")).as("d"))
    val wD = Window.orderBy(col("d"))
    val ranked = diffs.withColumn("rn", row_number().over(wD))
    // the pair count is span² (bounded), so the lower/upper middle
    // ranks are two driver integers, like kaplanMeier's risk-set count
    val na = da.count()
    val nb = db.count()
    val m = na * nb
    val g = ranked.agg(
      min(when(col("rn") === lit((m + 1) / 2), col("d"))).as("dlo"),
      min(when(col("rn") === lit(m / 2 + 1), col("d"))).as("dhi"))
    g.select(lit(na).as("n_days_a"), lit(nb).as("n_days_b"),
      lit(m).as("n_pairs"),
      q((col("dlo") + col("dhi")).cast("double") / lit(2.0) / lit(1e6),
        6).as("hl_shift"))
  }

  /** Cochran–Armitage trend test (W480): does purchase propensity
    * rise with activity? Users land in 4 activity quartiles by the
    * deterministic cumulative rule over the per-user event-count grid
    * (every user with the same count gets the same quartile — no row
    * ranking), outcome = heavy repeat buyer (purchases on ≥
    * `posDays` distinct days — has-any-purchase saturates on this
    * fixture). T = Σ g·r_g with scores
    * 0..3 is an exact LONG; the null moments p̄(1−p̄)[Σg²n−(Σgn)²/N]
    * ride exact integers through one pinned-order double chain. One
    * user-keyed agg + one count-grid window.
    */
  def cochranArmitage(s: SparkSession, dir: String,
                      posDays: Int = 12): DataFrame = {
    val perUser = Tables.events(s, dir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("cnt"),
        (countDistinct(when(col("event_type") === "purchase",
          expr("unix_timestamp(ts) div 86400"))) >= posDays)
          .cast("long").as("pos"))
    val byC = perUser.groupBy("cnt").agg(count(lit(1)).as("nu"),
      sum(col("pos")).as("np"))
    val tot = byC.agg(sum(col("nu")).as("nn"))
    val cb = coalesce(sum(col("nu")).over(
      Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    val grouped = byC.select(col("nu"), col("np"), cb.as("cb"))
      .crossJoin(broadcast(tot))
      .select(least(expr("(4 * cb) div nn"), lit(3L)).as("g"),
        col("nu"), col("np"))
      .groupBy("g")
      .agg(sum(col("nu")).as("ng"), sum(col("np")).as("rg"))
    val agg = grouped.agg(sum(col("ng")).as("nn"),
      sum(col("rg")).as("rr"),
      sum(col("g") * col("rg")).as("t"),
      sum(col("g") * col("ng")).as("sn"),
      sum(col("g") * col("g") * col("ng")).as("sn2"))
    val p = col("rr").cast("double") / col("nn").cast("double")
    val e = p * col("sn").cast("double")
    val vr = (p * (lit(1.0) - p)) * (col("sn2").cast("double") -
      (col("sn").cast("double") * col("sn").cast("double")) /
        col("nn").cast("double"))
    val z = when(vr > 0,
      q((col("t").cast("double") - e) / sqrt(vr), 6)).otherwise(lit(0.0))
    agg.select(col("nn").as("n_users"), col("rr").as("n_positive"),
      col("t").as("t_stat"), z.as("z"),
      (abs(z) > lit(1.959964)).cast("long").as("trend"))
  }

  /** Grubbs max-deviation outlier screen (W481) on the daily revenue
    * series: G = max|x − x̄|/s, the "is the worst day a statistical
    * outlier?" single number. Daily totals are exact cent-grid LONGs
    * centered on the integer floor-mean (the [[jarqueBera]] recipe, so
    * the moment sums stay far under 2⁵³), and G is one pinned-order
    * double chain over (n, Σd, Σd², max d, min d) — five exact
    * integers. The flag is the operational 3σ rule (driver literal).
    * One day-keyed agg + one scalar agg.
    */
  def grubbsTest(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(expr("unix_timestamp(ts) div 86400").as("day"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("v2"))
      .groupBy("day").agg(sum(col("v2")).as("v"))
    val c = daily.agg(floor(sum(col("v")).cast("double") /
      count(lit(1))).cast("long").as("c0"))
    val d = daily.crossJoin(broadcast(c))
      .select((col("v") - col("c0")).as("d"))
    val g = d.agg(count(lit(1)).as("n"), sum(col("d")).as("s1"),
      sum(col("d") * col("d")).as("q"),
      max(col("d")).as("dmax"), min(col("d")).as("dmin"))
    val n = col("n").cast("double")
    val meanD = col("s1").cast("double") / n
    val sd = sqrt((col("q").cast("double") -
      (col("s1").cast("double") * col("s1").cast("double")) / n) /
      (n - lit(1.0)))
    val gstat = when(sd > 0, q(greatest(
      col("dmax").cast("double") - meanD,
      meanD - col("dmin").cast("double")) / sd, 6)).otherwise(lit(0.0))
    g.select(col("n").as("n_days"), gstat.as("g_stat"),
      (gstat > lit(3.0)).cast("long").as("sigma3_outlier"))
  }

  /** Running-records profile (W484) of the daily revenue series: how
    * many days set a new all-time high, and when was the last one? A
    * trend/stationarity smell on pure integer comparisons (a
    * stationary i.i.d. series grows records like ln n; a trending one
    * keeps setting them). Daily totals are exact cent-grid LONGs; a
    * record is `v > max(previous)` (first day counts) — one window
    * over the span-bounded day series, all decisions integer.
    */
  def runningRecords(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir).filter(col("value").isNotNull)
      .select(expr("unix_timestamp(ts) div 86400").as("day"),
        floor(col("value") * lit(100) + lit(0.5)).cast("long").as("v2"))
      .groupBy("day").agg(sum(col("v2")).as("v"))
    val prevMax = max(col("v")).over(Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1))
    daily.withColumn("rec",
        (prevMax.isNull || col("v") > prevMax).cast("long"))
      .agg(count(lit(1)).as("n_days"), sum(col("rec")).as("n_records"),
        max(when(col("rec") === 1, col("day"))).as("last_record_day"),
        q(max(col("v")).cast("double") / lit(100.0), 2)
          .as("max_daily_revenue"))
  }
}

