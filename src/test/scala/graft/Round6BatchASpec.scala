package graft

import java.sql.Timestamp
import graft.operators.Events

/** Round-6 batch A: the nonparametric/robust test tier added this
  * round (W474–W481) — Ansari–Bradley, Mood median, Jonckheere–
  * Terpstra, Brown–Forsythe, Kuiper, Hodges–Lehmann, Cochran–
  * Armitage, Grubbs. All hand-computed micro fixtures; every surface
  * is libm-free (exact integers + pinned ÷/√ chains) by design.
  */
class Round6BatchASpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
  // the engine's deterministic arm split (same as obf_sequential)
  private def armA(u: Long) = ((u % 2147483648L) * 8388593L) % 100L < 50L

  private def writeEvents(dir: String,
                          rows: Seq[(Long, Timestamp, Long, String, Double)])
  : Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  private def pickUsers(arm: Boolean, k: Int): Seq[Long] =
    (1L to 1000L).filter(u => armA(u) == arm).take(k)

  test("ansariBradley: A at the extremes, B in the middle — exact T and z") {
    val dir = java.nio.file.Files.createTempDirectory("ab6").toString
    val Seq(a1, a2) = pickUsers(arm = true, 2)
    val Seq(b1, b2) = pickUsers(arm = false, 2)
    // values 1<2<3<4: AB scores 1,2,2,1; arm A holds ranks 1,4 → T=2
    writeEvents(dir, Seq(
      (1L, day(0), a1, "view", 1.0), (2L, day(1), b1, "view", 2.0),
      (3L, day(2), b2, "view", 3.0), (4L, day(3), a2, "view", 4.0)))
    val r = Events.ansariBradley(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"arms: $r")
    assert(r.getLong(2) == 2L, s"t_ab: $r")
    // N=4 even: E = 2*6/4 = 3, V = 2*2*6*2/(48*3) = 1/3
    val e = (2.0 * (4.0 + 2.0)) / 4.0
    val v = (2.0 * 2.0 * (4.0 + 2.0) * (4.0 - 2.0)) / (48.0 * (4.0 - 1.0))
    assert(r.getDouble(3) == q6((2.0 - e) / math.sqrt(v)), s"z: $r")
    assert(r.getLong(4) == 0L)
  }

  test("moodMedian: disjoint type ranges — chi2 exactly 4 on 2x2") {
    val dir = java.nio.file.Files.createTempDirectory("mood6").toString
    writeEvents(dir, Seq(
      (1L, day(0), 1L, "click", 1.0), (2L, day(1), 2L, "click", 2.0),
      (3L, day(2), 3L, "view", 3.0), (4L, day(3), 4L, "view", 4.0)))
    val r = Events.moodMedian(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L, s"k/n: $r")
    assert(r.getDouble(2) == 2.0, s"median: $r")
    assert(r.getDouble(3) == 4.0, s"chi2: $r")
    assert(r.getLong(5) == 1L, s"flag: $r")
  }

  test("jonckheereTerpstra: strictly rising weekday groups — exact jt2") {
    val dir = java.nio.file.Files.createTempDirectory("jt6").toString
    // day(3..5) → epoch-day mod 7 = 0,1,2 (2024-01-01 is day 19723 ≡ 4)
    writeEvents(dir, Seq(
      (1L, day(3), 1L, "view", 1.0), (2L, day(3), 2L, "view", 2.0),
      (3L, day(4), 3L, "view", 3.0), (4L, day(4), 4L, "view", 4.0),
      (5L, day(5), 5L, "view", 5.0), (6L, day(5), 6L, "view", 6.0)))
    val r = Events.jonckheereTerpstra(spark, dir).collect().head
    assert(r.getLong(0) == 6L, s"n: $r")
    // every later-group value beats every earlier: JT=12, jt2=24
    assert(r.getLong(1) == 24L, s"jt2: $r")
    // 4E = 36-12 = 24, d4 = 24; 72V = 36*15 - 3*28 = 456
    assert(r.getDouble(2) == q6((24.0 / 4.0) / math.sqrt(456.0 / 72.0)),
      s"z: $r")
    assert(r.getLong(3) == 1L, s"trend: $r")
  }

  test("brownForsythe: hand 2x2 spread table — W exactly 0.2") {
    val dir = java.nio.file.Files.createTempDirectory("bf6").toString
    writeEvents(dir, Seq(
      (1L, day(0), 1L, "click", 1.0), (2L, day(1), 2L, "click", 3.0),
      (3L, day(2), 3L, "view", 2.0), (4L, day(3), 4L, "view", 6.0)))
    val r = Events.brownForsythe(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L, s"k/n: $r")
    // med(click)=1, med(view)=2 → z-table {0,200},{0,400} (cents):
    // num = 2*(100-150)^2 + 2*(200-150)^2 = 10000 (=1 in value units
    // ×1e4 cents²); den = (2e4-... ) exact → W = 2 * num/den = 0.2
    assert(r.getDouble(2) == 0.2, s"bf_w: $r")
    assert(r.getLong(4) == 0L, s"flag: $r")
  }

  test("kuiperTwoSample: disjoint arm ranges — V exactly 1") {
    val dir = java.nio.file.Files.createTempDirectory("kp6").toString
    val Seq(a1, a2) = pickUsers(arm = true, 2)
    val Seq(b1, b2) = pickUsers(arm = false, 2)
    writeEvents(dir, Seq(
      (1L, day(0), a1, "view", 1.0), (2L, day(1), a2, "view", 2.0),
      (3L, day(2), b1, "view", 3.0), (4L, day(3), b2, "view", 4.0)))
    val r = Events.kuiperTwoSample(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"arms: $r")
    assert(r.getLong(2) == 4L && r.getLong(3) == 0L, s"sups: $r")
    assert(r.getDouble(4) == 1.0, s"v: $r")
    assert(r.getLong(5) == 0L, s"flag: $r")
  }

  test("hodgesLehmann: two A days x one B day — exact pair median") {
    val dir = java.nio.file.Files.createTempDirectory("hl6").toString
    val Seq(a1) = pickUsers(arm = true, 1)
    val Seq(b1) = pickUsers(arm = false, 1)
    writeEvents(dir, Seq(
      (1L, day(0), a1, "view", 10.0), (2L, day(1), a1, "view", 20.0),
      (3L, day(0), b1, "view", 1.0)))
    val r = Events.hodgesLehmann(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 1L &&
      r.getLong(2) == 2L, s"days/pairs: $r")
    // diffs {9, 19} → median (9+19)/2 = 14
    assert(r.getDouble(3) == 14.0, s"hl: $r")
  }

  test("cochranArmitage: propensity rising with activity — exact z") {
    val dir = java.nio.file.Files.createTempDirectory("ca6").toString
    // users with 1..4 events; only the two most active purchase
    def evs(u: Long, n: Int, buy: Boolean): Seq[(Long, Timestamp, Long,
        String, Double)] =
      (0 until n).map(i => (u * 10 + i, day(i), u,
        if (buy && i == 0) "purchase" else "view", 1.0))
    writeEvents(dir, evs(1, 1, buy = false) ++ evs(2, 2, buy = false) ++
      evs(3, 3, buy = true) ++ evs(4, 4, buy = true))
    val r = Events.cochranArmitage(spark, dir, posDays = 1)
      .collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L, s"n/pos: $r")
    assert(r.getLong(2) == 5L, s"t: $r")
    // p=1/2, E=3, Var = 1/4 * (14 - 36/4) = 1.25
    assert(r.getDouble(3) == q6(2.0 / math.sqrt(1.25)), s"z: $r")
  }

  test("grubbsTest: one spiked day — G exactly 1.5") {
    val dir = java.nio.file.Files.createTempDirectory("gr6").toString
    writeEvents(dir, Seq(
      (1L, day(0), 1L, "view", 1.0), (2L, day(1), 1L, "view", 1.0),
      (3L, day(2), 2L, "view", 1.0), (4L, day(3), 2L, "view", 10.0)))
    val r = Events.grubbsTest(spark, dir).collect().head
    assert(r.getLong(0) == 4L, s"n: $r")
    // cents 100,100,100,1000: c0=325, d=-225x3,675; sd=450, G=1.5
    assert(r.getDouble(1) == 1.5, s"g: $r")
    assert(r.getLong(2) == 0L)
  }
}
