package graft

import java.sql.Timestamp
import graft.operators.Events

/** Native as-of join (`AsOfJoinPlan`/`AsOfJoinExec` via
  * `GraftStrategy`): semantics against micro fixtures, agreement with
  * the composed union+carry operator, and the physical plan shape.
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  private def writeEvents(
      rows: Seq[(Long, Timestamp, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("asof").toString
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val fixture = Seq(
    // user 1: views at t=10, 20; purchases at t=5 (no match), t=20
    // (same-second match), t=100 (latest view wins)
    (0L, ts(10), 1L, "view", 1.0),
    (1L, ts(20), 1L, "view", 2.0),
    (2L, ts(5), 1L, "purchase", 9.0),
    (3L, ts(20), 1L, "purchase", 9.0),
    (4L, ts(100), 1L, "purchase", 9.0),
    // user 2: purchase with no views at all
    (5L, ts(50), 2L, "purchase", 9.0),
    // user 3: two views in the same second -> max event_id wins
    (6L, ts(7), 3L, "view", 30.0),
    (7L, ts(7), 3L, "view", 40.0),
    (8L, ts(8), 3L, "purchase", 9.0))

  test("native as-of join: latest right ≤ left, ties by max event_id") {
    val dir = writeEvents(fixture)
    val got = Events.asofJoinNative(spark, dir, "purchase", "view")
      .collect()
      .map(r => r.getLong(1) -> (r.getLong(3), r.getDouble(4))).toMap
    assert(got == Map(
      3L -> (1L, 2.0),   // same-second view matches
      4L -> (1L, 2.0),   // latest view carries forward
      8L -> (7L, 40.0))) // same-second tie -> higher event_id
    // purchases 2 (before any view) and 5 (user without views) absent
  }

  test("native and composed as-of joins agree on the fixture tables") {
    val native = Events.asofJoinNative(spark, sf, "purchase", "view")
      .collect().map(_.toSeq).toSet
    val composed = Events.asofJoin(spark, sf, "purchase", "view")
      .collect().map(_.toSeq).toSet
    assert(native.nonEmpty && native == composed)
  }

  test("native interval join agrees with the composed range join") {
    val native = Events.rangeJoinNative(spark, sf, "click", "purchase")
      .collect().map(_.toSeq).toSet
    val composed = Events.rangeJoin(spark, sf, "click", "purchase")
      .collect().map(_.toSeq).toSet
    assert(native.nonEmpty && native == composed)
  }

  test("interval join: overlapping intervals multi-match, keys isolate") {
    import org.apache.spark.sql.graftglue.PlanApi
    import spark.implicits._
    if (!spark.experimental.extraStrategies
        .exists(_ eq graft.plans.GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.GraftStrategy
    // user 1: [0,10] and [5,20] OVERLAP; [30,40] separate. user 2: [0,100]
    val ivals = Seq((1L, 0L, 10L, "a"), (1L, 5L, 20L, "b"),
      (1L, 30L, 40L, "c"), (2L, 0L, 100L, "d"))
      .toDF("pk", "st", "en", "iv")
    val probes = Seq((1L, 7L), (1L, 15L), (1L, 25L), (1L, 40L), (2L, 50L))
      .toDF("pk2", "ts")
    val (l, r) = (PlanApi.analyzed(ivals), PlanApi.analyzed(probes))
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
          n: String) = p.output.find(_.name == n).get
    val got = PlanApi.ofRows(spark, graft.plans.IntervalJoinPlan(
        l, r, a(l, "pk"), a(l, "st"), a(l, "en"), a(r, "pk2"), a(r, "ts")))
      .collect().map(row => (row.getString(3), row.getLong(5))).toSet
    assert(got == Set(
      ("a", 7L), ("b", 7L), // inside both overlapping intervals
      ("b", 15L),           // only the longer one
      ("c", 40L),           // inclusive end
      ("d", 50L)))          // other key; ts=25 matches nothing
  }

  test("plan contains AsOfJoinExec with one exchange per side") {
    val dir = writeEvents(fixture)
    val df = Events.asofJoinNative(spark, dir, "purchase", "view")
    val pstr = df.queryExecution.executedPlan.toString
    info(pstr)
    assert(pstr.contains("AsOfJoin"))
    // co-partitioning demands exactly one hash exchange per child
    assert("Exchange hashpartitioning".r.findAllIn(pstr).size == 2)
  }
}
