package graft

import java.sql.Timestamp
import graft.operators.{Events, Ml}

/** Round-5 batch N: McNemar paired test, beta-binomial EB shrinkage,
  * Durbin–Levinson PACF.
  */
class Round5BatchNSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  test("mcnemarTest: hand corpus with known discordant cells") {
    val dir = java.nio.file.Files.createTempDirectory("mcn").toString
    Seq(
      // both right: lang-id votes en, share 3*8 >= 3
      (1L, "the of and", "en", "w", 1L),
      // A right (en beats all), B wrong (1*8 < 9 tokens) -> b
      (2L, "the xxx yyy zzz aaa bbb ccc ddd eee", "en", "w", 1L),
      (3L, "the qqq www rrr ttt uuu vvv iii ooo", "en", "w", 1L),
      // A wrong (es outvotes en), B right (8 >= 4) -> c
      (4L, "el la que the", "en", "w", 1L),
      // both right on a negative: es doc predicted not-en, share 0
      (5L, "el la que", "es", "w", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Ml.mcnemarTest(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((5L, 2L, 2L, 1L)), s"cells: $r")
    // chi2 = (|2-1|-1)^2 / 3 = 0 (clamped Edwards correction)
    assert(r.getDouble(4) == 0.0, s"chi2: $r")
  }

  test("betaBinomialEb: replicated-formula parity + small-n pull") {
    val dir = java.nio.file.Files.createTempDirectory("ebb").toString
    // users 1..10: 10 events, 5 purchases; user 11: 1/1; user 12: 60/100
    val rows =
      (1L to 10L).flatMap(u => (1 to 5).map(i => (u * 1000 + i, u, "purchase")) ++
        (6 to 10).map(i => (u * 1000 + i, u, "view"))) ++
      Seq((11001L, 11L, "purchase")) ++
      (1 to 60).map(i => (12000L + i, 12L, "purchase")) ++
      (61 to 100).map(i => (12000L + i, 12L, "view"))
    rows.zipWithIndex.map { case ((e, u, t), i) => (e, day(i % 30), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // replicate the exact pipeline: 1e-9-grid rates, MoM prior
    val rates = Seq.fill(10)((5L, 10L)) ++ Seq((1L, 1L), (60L, 100L))
    val r9 = rates.map { case (x, n) =>
      math.floor(x.toDouble / n * 1e9 + 0.5).toLong }
    val ku = r9.length.toLong
    val s1 = r9.sum
    val s2 = r9.map(v => BigInt(v) * v).sum
    val v18x = BigInt(ku) * s2 - BigInt(s1) * s1
    val m = s1.toDouble / ku / 1e9
    val v = v18x.toDouble / ku / ku / 1e18
    val kap = m * (1.0 - m) / v - 1.0
    val (al, be) = (m * kap, (1.0 - m) * kap)
    def eb(x: Long, n: Long) = q6((al + x) / (al + be + n))
    val got = Events.betaBinomialEb(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(4), r.getLong(5)))).toMap
    assert(got(11L) == ((1L, 1L, eb(1, 1), 1L)), s"u11: ${got(11L)}")
    assert(got(12L) == ((100L, 60L, eb(60, 100), 1L)), s"u12: ${got(12L)}")
    // the 1/1 user is pulled toward the prior mean, below raw 1.0
    assert(eb(1, 1) < 1.0 && got(11L)._3 < 1.0)
    // ... but stays above the 5/10 crowd
    assert(got(11L)._3 > got(1L)._3)
  }

  test("betaBinomialEb: zero-variance rates — no shrink, flagged 0") {
    val dir = java.nio.file.Files.createTempDirectory("ebb0").toString
    val rows = (1L to 5L).flatMap(u =>
      Seq((u * 10 + 1, u, "purchase"), (u * 10 + 2, u, "view")))
    rows.zipWithIndex.map { case ((e, u, t), i) => (e, day(i), u, t, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.betaBinomialEb(spark, dir).collect()
    assert(got.forall(r => r.getDouble(4) == 0.5 && r.getLong(5) == 0L),
      got.mkString(", "))
  }

  test("pacfDaily: replicated Durbin–Levinson parity on a planted series") {
    val dir = java.nio.file.Files.createTempDirectory("pacf").toString
    // counts 1,2,1,3,1,4,1,5,... — alternating structure
    val counts = (0 until 16).map(d => if (d % 2 == 0) 1 else 2 + d / 2)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => (d * 100L + i, day(d), 1L, "view", 1.0)) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // replicate: per-lag Pearson over aligned pairs, 1e-9 grid, DL
    def r9(lag: Int): Long = {
      val xs = counts.dropRight(lag).map(_.toLong)
      val ys = counts.drop(lag).map(_.toLong)
      val n = xs.length.toDouble
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val num = n * sxy - sx.toDouble * sy
      val den = math.sqrt(n * sxx - sx.toDouble * sx) *
        math.sqrt(n * syy - sy.toDouble * sy)
      math.floor(num / den * 1e9 + 0.5).toLong
    }
    val (r1, r2, r3) = (r9(1) / 1e9, r9(2) / 1e9, r9(3) / 1e9)
    val phi22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    val phi21 = r1 - phi22 * r1
    val d3 = 1.0 - phi21 * r1 - phi22 * r2
    val p3 = (r3 - phi21 * r2 - phi22 * r1) / d3
    val got = Events.pacfDaily(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got(1L) == ((q6(r1), q6(r1))), s"lag1: ${got(1L)}")
    assert(got(2L) == ((q6(r2), q6(phi22))), s"lag2: ${got(2L)}")
    assert(got(3L) == ((q6(r3), q6(p3))), s"lag3: ${got(3L)}")
    // alternating series: lag-1 anticorrelated, lag-2 positive
    assert(r1 < 0 && r2 > 0)
  }
}
