package graft

import java.sql.Timestamp
import graft.operators.{Events, TextStats}

/** Round-5 batch AH: Poisson GLM trend, Weibull plotting-position
  * fit, Chao1 vocabulary richness.
  */
class Round5BatchAHSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("poissonGlmTrend: constant series converges to b = 0") {
    val dir = java.nio.file.Files.createTempDirectory("pg0").toString
    var id = 0L
    (0 until 10).flatMap(d => (0 until 7).map { _ =>
      id += 1; (id, day(d), 1L, "view", 1.0) })
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.poissonGlmTrend(spark, dir).collect().head
    assert(r.getLong(0) == 10L, s"n: $r")
    // a = ln 7, b = 0 is an exact fixed point of the Newton step
    assert(r.getDouble(1) == q(math.floor(math.log(7.0) * 1e9 + 0.5)
      / 1e9, 6), s"a: $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 1.0, s"b: $r")
  }

  test("poissonGlmTrend: exponential growth recovers the rate ratio") {
    val dir = java.nio.file.Files.createTempDirectory("pg1").toString
    var id = 0L
    // counts 2,4,8,...,128: exact rate ratio 2 per day
    (0 until 7).flatMap { d =>
      (0 until (2 << d)).map { _ =>
        id += 1; (id, day(d), 1L, "view", 1.0) } }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.poissonGlmTrend(spark, dir).collect().head
    // 3 Newton steps from (ln mean, 0) get close to b = ln 2 ≈ 0.693
    assert(r.getDouble(3) > 1.6 && r.getDouble(3) < 2.4,
      s"rate_ratio: $r")
  }

  test("weibullPlotFit: exponential-like spread gives shape near 1") {
    val dir = java.nio.file.Files.createTempDirectory("wb").toString
    // conversions at day 1,1,2,3,5,8 after first touch
    val durs = Seq(1, 1, 2, 3, 5, 8)
    var id = 0L
    val rows = durs.zipWithIndex.flatMap { case (t, u) =>
      id += 2
      Seq((id, day(0), u.toLong, "view", 1.0),
        (id + 1, day(t), u.toLong, "purchase", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.weibullPlotFit(spark, dir).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 5L, s"m,k: $r")
    assert(r.getDouble(2) > 0.3 && r.getDouble(2) < 3.0, s"shape: $r")
    assert(r.getDouble(4) > 0.8, s"r2: $r")
  }

  test("chao1Richness: hand count-of-counts") {
    val dir = java.nio.file.Files.createTempDirectory("ch").toString
    // a×3, b×2, c×1, d×1 → V=4, N=7, F1=2, F2=1
    Seq((1L, "a a a b b c d", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.chao1Richness(spark, dir).collect().head
    assert(r.getLong(0) == 7L && r.getLong(1) == 4L, s"nv: $r")
    assert(r.getLong(2) == 2L && r.getLong(3) == 1L, s"f: $r")
    // chao1 = 4 + 2·1/(2·2) = 4.5; coverage = 1 − 2/7
    assert(r.getDouble(4) == 4.5, s"chao: $r")
    assert(r.getDouble(5) == q(1.0 - 2.0 / 7, 6), s"cov: $r")
  }
}
