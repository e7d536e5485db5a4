package graft

import java.sql.Timestamp
import graft.operators.Events

/** Round-5 batch AF: two-sample KS drift, binary transfer entropy,
  * upper-tail dependence, Rayleigh hour-of-day uniformity.
  */
class Round5BatchAFSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def at(d: Int, h: Int) =
    new Timestamp(1704067200000L + d * 86400000L + h * 3600000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("ksTwoSample: identical halves give D = 0, shifted halves flag") {
    val same = java.nio.file.Files.createTempDirectory("ks0").toString
    (0 until 8).flatMap(d => Seq(1.0, 2.0, 3.0).zipWithIndex.map {
      case (v, i) => ((d * 10 + i).toLong, day(d), 1L, "view", v) })
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$same/events.parquet")
    val r0 = Events.ksTwoSample(spark, same).collect().head
    assert(r0.getDouble(2) == 0.0 && r0.getLong(4) == 0L, s"same: $r0")
    val shft = java.nio.file.Files.createTempDirectory("ks1").toString
    (0 until 8).flatMap { d =>
      val base = if (d < 3) 1.0 else 100.0
      (0 until 20).map(i =>
        ((d * 100 + i).toLong, day(d), 1L, "view", base + i)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$shft/events.parquet")
    val r1 = Events.ksTwoSample(spark, shft).collect().head
    // mid = (d0 + d0+7)/2 truncates to d0+3 → 3 days / 5 days
    assert(r1.getLong(0) == 60L && r1.getLong(1) == 100L, s"n: $r1")
    assert(r1.getDouble(2) == 1.0 && r1.getLong(4) == 1L, s"shift: $r1")
  }

  test("transferEntropy: y copies x's lag — positive flow") {
    val dir = java.nio.file.Files.createTempDirectory("te").toString
    // x follows an APERIODIC high/low pattern (its own history does
    // not determine it); y = x lagged by one day exactly
    val bits = Seq(1, 1, 0, 1, 0, 0, 1, 0, 1, 1, 0, 0, 0, 1, 1, 0)
    val xs = bits.map(b => if (b == 1) 10L else 1L)
    val ys = 1L +: xs.dropRight(1)
    var id = 0L
    val rows = xs.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map { _ => id += 1; (id, day(d), 1L, "view", 1.0) }
    } ++ ys.zipWithIndex.flatMap { case (c, d) =>
      (0L until c).map { _ => id += 1; (id, day(d), 1L, "purchase", 1.0) }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.transferEntropy(spark, dir).collect().head
    assert(r.getLong(0) == 15L, s"n: $r")
    // binarized y_t = x'_t exactly: H(y|y',x') = 0 while y' alone
    // leaves residual entropy — TE = H(y|y') > 0
    assert(r.getDouble(1) > 0.1 && r.getLong(2) == 1L, s"te: $r")
  }

  test("tailDependence: co-moving spikes give lambda 1, disjoint 0") {
    val co = java.nio.file.Files.createTempDirectory("td0").toString
    var id = 0L
    // 10 days; both series spike together on days 8,9
    val rows = (0 until 10).flatMap { d =>
      val c = if (d >= 8) 9L else 1L
      (0L until c).flatMap { _ =>
        id += 2
        Seq((id, day(d), 1L, "view", 1.0),
          (id + 1, day(d), 1L, "click", 1.0)) }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$co/events.parquet")
    val r = Events.tailDependence(spark, co).collect().head
    // q80 of (1×8, 9×2): cum at v=1 is 8 → 40 ≥ 40 → threshold 1;
    // the two spike days clear it on BOTH series together
    assert(r.getLong(0) == 10L && r.getLong(3) == 2L, s"n: $r")
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 0.2, s"co: $r")
    val dis = java.nio.file.Files.createTempDirectory("td1").toString
    id = 0L
    // views spike days 8-9, clicks spike days 0-1 — disjoint tails
    val rows2 = (0 until 10).flatMap { d =>
      val vc = if (d >= 8) 9L else 1L
      val cc = if (d <= 1) 9L else 1L
      (0L until vc).map { _ =>
        id += 1; (id, day(d), 1L, "view", 1.0) } ++
      (0L until cc).map { _ =>
        id += 1; (id, day(d), 1L, "click", 1.0) }
    }
    rows2.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dis/events.parquet")
    val r2 = Events.tailDependence(spark, dis).collect().head
    assert(r2.getLong(3) == 0L && r2.getDouble(4) == 0.0,
      s"disjoint: $r2")
  }

  test("rayleighUniformity: flat clock accepts, one-hour spike flags") {
    val flat = java.nio.file.Files.createTempDirectory("ry0").toString
    (0 until 24).flatMap(h => (0 until 5).map(i =>
      ((h * 10 + i).toLong, at(0, h), 1L, "view", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$flat/events.parquet")
    val r0 = Events.rayleighUniformity(spark, flat).collect().head
    // perfectly flat: S and C are sums of the full trig cycle — the
    // 1e-9 rounded weights sum to ~0, z ≈ 0
    assert(r0.getLong(0) == 120L && r0.getDouble(1) < 0.001, s"flat: $r0")
    assert(r0.getLong(3) == 0L, s"flat flag: $r0")
    val spike = java.nio.file.Files.createTempDirectory("ry1").toString
    (0 until 200).map(i => (i.toLong, at(i % 5, 9), 1L, "view", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$spike/events.parquet")
    val r1 = Events.rayleighUniformity(spark, spike).collect().head
    // every event at hour 9: R̄ = 1 → z = n
    assert(r1.getDouble(1) == 200.0, s"z: $r1")
    assert(r1.getDouble(2) == 0.0 && r1.getLong(3) == 1L, s"spike: $r1")
  }
}
