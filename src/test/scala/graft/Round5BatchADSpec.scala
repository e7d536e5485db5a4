package graft

import java.sql.Timestamp
import graft.operators.{Curation, Events, TextStats}

/** Round-5 batch AD: peaks-over-threshold GPD, deterministic RANSAC
  * trend, DP histogram utility audit, Fleiss' kappa.
  */
class Round5BatchADSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  private def writeValues(dir: String, vs: Seq[Double]): Unit =
    vs.zipWithIndex.map { case (v, i) =>
      (i.toLong, day(0), (i % 5).toLong, "view", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("potGpd: constant exceedances gate the degenerate variance") {
    val dir = java.nio.file.Files.createTempDirectory("pot0").toString
    // 19 values at 1.0, one clear tail point — a single exceedance
    // (k = 1 < 2) gates xi/sigma to 0
    writeValues(dir, Seq.fill(19)(1.0) :+ 9.0)
    val r = Events.potGpd(spark, dir).collect().head
    assert(r.getLong(0) == 1L, s"k: $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, s"gate: $r")
  }

  test("potGpd: matches the moment formulas on a hand tail") {
    val dir = java.nio.file.Files.createTempDirectory("pot1").toString
    // 95th pct of 40 values: threshold = 38th order stat = 1.0;
    // exceedances (grid 1e6): 2.0→1e6, 3.0→2e6
    writeValues(dir, Seq.fill(38)(1.0) ++ Seq(2.0, 3.0))
    val (e1, e2) = (1000000L, 2000000L)
    val k = 2.0
    val m = (e1 + e2) / k
    val s2 = (k * (e1 * e1 + e2 * e2).toDouble -
      math.pow((e1 + e2).toDouble, 2)) / (k * k)
    val ratio = m * m / s2
    val r = Events.potGpd(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 1.0, s"thr: $r")
    assert(r.getDouble(2) == q(0.5 * (1.0 - ratio), 6), s"xi: $r")
    assert(r.getDouble(3) == q(0.5 * m * (ratio + 1.0) / 1e6, 6),
      s"sigma: $r")
  }

  test("ransacTrend: an outlier day does not bend the consensus line") {
    val dir = java.nio.file.Files.createTempDirectory("rt").toString
    // y = 10 + 2t for t=0..7, except t=4 spikes to 100
    var id = 0L
    val rows = (0 to 7).flatMap { t =>
      val y = if (t == 4) 100L else 10L + 2 * t
      (0L until y).map { _ =>
        id += 1; (id, day(t), id % 5, "view", 1.0) }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.ransacTrend(spark, dir).collect().head
    assert(r.getLong(0) == 8L, s"n: $r")
    assert(r.getDouble(2) == 2.0, s"slope: $r")
    assert(r.getLong(3) == 7L, s"inliers: $r")
    assert(r.getDouble(4) == 0.875, s"share: $r")
  }

  test("dpUtilityAudit: k·b error budget over exact day counts") {
    val dir = java.nio.file.Files.createTempDirectory("dp").toString
    var id = 0L
    val rows = (0 until 4).flatMap { d =>
      val c = if (d == 3) 1L else 50L
      (0L until c).map { _ => id += 1; (id, day(d), 1L, "view", 1.0) }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Curation.dpUtilityAudit(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 151L, s"kn: $r")
    assert(r.getDouble(3) == 4.0, s"l1: $r")
    assert(r.getDouble(4) == q(4.0 / 151, 6), s"rel: $r")
    assert(r.getLong(5) == 1L, s"dominated: $r")
  }

  test("fleissKappa: unanimous raters agree perfectly, mixed do not") {
    val dir = java.nio.file.Files.createTempDirectory("fk").toString
    val long200 = "x" * 200
    // doc A: all three fire (x=3); doc B: none fire (x=0) →
    // P̄ = 1, P_e = 0.5, κ = 1
    val docs = Seq(
      (1L, long200 + " has the 9 marker", "s"),
      (2L, "plain filler", "s"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.fleissKappa(spark, dir).collect().head
    assert(r.getLong(0) == 2L, s"n: $r")
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 0.5, s"p: $r")
    assert(r.getDouble(3) == 1.0 && r.getLong(4) == 1L, s"kappa: $r")
  }

  test("fleissKappa: all-unanimous-same-way gates the 0/0 to zero") {
    val dir = java.nio.file.Files.createTempDirectory("fk2").toString
    val long200 = "x" * 200
    // every doc fires all three detectors → p_yes = 1 → P_e = 1
    val docs = (1L to 3L).map(i =>
      (i, long200 + " has the 9 marker", "s"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.fleissKappa(spark, dir).collect().head
    assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0, s"gate: $r")
  }
}
