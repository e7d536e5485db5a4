package graft

import java.sql.Timestamp
import graft.operators.{Events, Relational}

/** Round-5 batch U: theta forecast, Croston, spectral entropy,
  * sample entropy, ADF unit-root screen, SPRT monitor, EWMA chart,
  * DDSketch relative-error audit.
  */
class Round5BatchUSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
  private def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4

  private def writeDaily(dir: String, counts: Seq[Int],
                         eventType: String = "view"): Unit =
    counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 1000 + j).toLong, day(d),
        j.toLong, eventType, 1.0)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("thetaForecast: exact linear series — trend recovered, dyadic SES") {
    val dir = java.nio.file.Files.createTempDirectory("th").toString
    // y_t = t: trend fits exactly (a=0, b=1), theta-2 line z_t = t;
    // SES = 3/32 + 3/16 + 1/2 + 5/4 + 3 = 5.03125 (all dyadic)
    writeDaily(dir, Seq(1, 2, 3, 4, 5, 6))
    val r = Events.thetaForecast(spark, dir).collect().head
    assert(r.getLong(0) == 6L, s"n: $r")
    assert(r.getDouble(1) == 1.0, s"slope: $r")
    assert(r.getDouble(2) == 5.03125, s"ses: $r")
    assert(r.getDouble(3) == q4((5.03125 + 7.0) / 2), s"forecast: $r")
  }

  test("crostonForecast: three demands, two gaps — dyadic SES ratio") {
    val dir = java.nio.file.Files.createTempDirectory("cr").toString
    // error demands: day 0 size 2, day 2 size 4, day 6 size 8
    val counts = Seq(2, 0, 4, 0, 0, 0, 8)
    writeDaily(dir, counts, "error")
    val r = Events.crostonForecast(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L, s"n: $r")
    // z-SES = 2/4 + 4/4 + 8/2 = 5.5; p-SES = 2/2 + 4/2 = 3
    assert(r.getDouble(2) == 5.5 && r.getDouble(3) == 3.0, s"ses: $r")
    assert(r.getDouble(4) == q6(5.5 / 3), s"croston: $r")
  }

  test("spectralEntropy: flat series undefined; cycle concentrates") {
    val flat = java.nio.file.Files.createTempDirectory("sef").toString
    writeDaily(flat, Seq.fill(8)(3))
    val f = Events.spectralEntropy(spark, flat).collect().head
    assert(f.getLong(1) == 0L, s"defined: $f")
    assert(f.getDouble(2) == 0.0 && f.getDouble(3) == 0.0, s"h: $f")
    val cyc = java.nio.file.Files.createTempDirectory("sec").toString
    writeDaily(cyc, Seq(5, 1, 5, 1, 5, 1, 5, 1, 5, 1, 5, 1, 5, 1))
    val c = Events.spectralEntropy(spark, cyc).collect().head
    assert(c.getLong(1) == 1L, s"defined: $c")
    assert(c.getDouble(3) < 0.5, s"concentrated: $c")
  }

  test("sampleEntropy: period-2 series — every template match extends") {
    val dir = java.nio.file.Files.createTempDirectory("sen").toString
    // [5,1]x4: r = max(1, floor(0.2*16/8)) = 1; B = A = 6 same-phase
    // pairs → SampEn = -ln(1) = 0
    writeDaily(dir, Seq(5, 1, 5, 1, 5, 1, 5, 1))
    val r = Events.sampleEntropy(spark, dir).collect().head
    assert(r.getLong(0) == 8L && r.getLong(1) == 1L, s"n/r: $r")
    assert(r.getLong(2) == 6L && r.getLong(3) == 6L, s"B/A: $r")
    assert(r.getLong(4) == 1L && r.getDouble(5) == 0.0, s"sampen: $r")
  }

  test("adfTest: mean-reverting series — hand-computed t-statistic") {
    val dir = java.nio.file.Files.createTempDirectory("adf").toString
    writeDaily(dir, Seq(5, 1, 5, 1, 5, 2, 5, 1))
    // x=[5,1,5,1,5,2,5], dy=[-4,4,-4,4,-3,3,-4]: exact sums below
    val (n, sx, sy) = (7.0, 24.0, -4.0)
    val (sxx, sxy, syy) = (106.0, -61.0, 98.0)
    val aN = n * sxy - sx * sy
    val bD = n * sxx - sx * sx
    val gamma = aN / bD
    val sse = (n * syy - sy * sy) / n - gamma * (aN / n)
    val t = gamma / math.sqrt(sse / (n - 2) / (bD / n))
    val r = Events.adfTest(spark, dir).collect().head
    assert(r.getLong(0) == 7L, s"n: $r")
    assert(r.getDouble(1) == q6(gamma), s"gamma: $r")
    assert(r.getDouble(2) == q4(t), s"t: $r")
    assert(r.getLong(3) == 1L, s"flag: $r")
  }

  test("sprtMonitor: burst of conversions crosses the H1 boundary") {
    val dir = java.nio.file.Files.createTempDirectory("sp").toString
    val rows = (0 until 14).map(j => (j.toLong, day(0), j.toLong,
      "purchase", 1.0)) ++
      (0 until 50).map(j => (100L + j, day(1), j.toLong, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rs = Events.sprtMonitor(spark, dir).collect()
    val l1 = math.log(0.25 / 0.20)
    val l0 = math.log(0.75 / 0.80)
    val t0 = math.floor(14 * l1 * 1e9 + 0.5).toLong
    val t1 = math.floor(50 * l0 * 1e9 + 0.5).toLong
    assert(rs(0).getString(4) == "accept_h1", s"d0: ${rs(0)}")
    assert(rs(0).getDouble(3) == q6(t0 / 1e9), s"llr0: ${rs(0)}")
    assert(rs(1).getString(4) == "continue", s"d1: ${rs(1)}")
    assert(rs(1).getDouble(3) == q6((t0 + t1) / 1e9), s"llr1: ${rs(1)}")
  }

  test("ewmaChart: constant series is its own level; spike pulls z half-way") {
    val flat = java.nio.file.Files.createTempDirectory("ewf").toString
    writeDaily(flat, Seq.fill(5)(4))
    val fr = Events.ewmaChart(spark, flat).collect()
    assert(fr.forall(r => r.getDouble(2) == 4.0 && r.getLong(5) == 0L),
      s"flat: ${fr.mkString(";")}")
    val sp = java.nio.file.Files.createTempDirectory("ews").toString
    // day 0 anchors the spine; zero-count days are densified zeros
    writeDaily(sp, Seq(1, 0, 0, 0, 20))
    val last = Events.ewmaChart(spark, sp).collect().last
    // z_5 = mu/32 + (1*2 + 20*32)/64, mu = 21/5
    val z5 = 21.0 / 5 * 0.03125 + 642.0 / 64
    assert(last.getDouble(2) == q6(z5), s"spike: $last")
  }

  test("ddsketchAudit: degenerate distribution — bound holds at every q") {
    val dir = java.nio.file.Files.createTempDirectory("dd").toString
    (0 until 4).map(j => (j.toLong, day(0), j.toLong, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rs = Relational.ddsketchAudit(spark, dir).collect()
    assert(rs.length == 3, s"rows: ${rs.length}")
    assert(rs.forall(_.getDouble(2) == 2.0), s"exact: ${rs.mkString(";")}")
    assert(rs.forall(_.getLong(4) == 1L), s"bound: ${rs.mkString(";")}")
  }
}
