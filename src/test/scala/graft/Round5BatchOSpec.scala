package graft

import java.sql.Timestamp
import graft.operators.{Events, Relational, TextStats}

/** Round-5 batch O: k-group testing (ANOVA, Kruskal–Wallis),
  * association/agreement (Cramér's V, Cohen's kappa),
  * concentration/inequality (HHI, Lorenz/Gini), and serial-randomness +
  * drift monitors (runs test, Page–Hinkley) — each on a hand corpus
  * with independently computed expected values.
  */
class Round5BatchOSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeEvents(dir: String,
                          rows: Seq[(Long, Timestamp, Long, String, Double)])
  : Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("anovaOneway: textbook two-group F (SSB=13.5, SSW=4, F=13.5)") {
    val dir = java.nio.file.Files.createTempDirectory("anova").toString
    // A = {1,2,3}, B = {4,5,6}: grand mean 3.5, group means 2 and 5
    val rows = Seq(1.0, 2.0, 3.0).map(v => ("a", v)) ++
      Seq(4.0, 5.0, 6.0).map(v => ("b", v))
    writeEvents(dir, rows.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, day(i), i.toLong, t, v) })
    val r = Events.anovaOneway(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L, s"shape: $r")
    assert(r.getDouble(2) == 13.5, s"ss_between: $r")
    assert(r.getDouble(3) == 4.0, s"ss_within: $r")
    assert(r.getDouble(4) == 13.5, s"f = (13.5/1)/(4/4): $r")
  }

  test("kruskalWallis: exact midranks + documented unit-grid floor") {
    val dir = java.nio.file.Files.createTempDirectory("kw").toString
    // A = {1,2}, B = {3,4}: ranks 1..4, R_A = 3, R_B = 7, no ties.
    // Unit-grid floor of R²/n: floor(4.5)+floor(24.5) = 28 →
    // H = 12/(4·5)·28 − 3·5 = 1.8 (exact-ΣR²/n H would be 2.4)
    writeEvents(dir, Seq(("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0))
      .zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, day(i), i.toLong, t, v) })
    val r = Events.kruskalWallis(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L, s"shape: $r")
    assert(r.getDouble(2) == 1.8, s"h_stat: $r")
    assert(r.getDouble(3) == 1.8, s"no ties -> h_adj = h: $r")
  }

  test("kruskalWallis: ties get midranks + correction < 1") {
    val dir = java.nio.file.Files.createTempDirectory("kwt").toString
    // A = {1,1}, B = {1,2}: value 1 has t=3 (midrank 2), value 2 rank 4.
    // R_A = 4, R_B = 6; tie term t³−t = 24, N³−N = 60 → corr = 0.6
    writeEvents(dir, Seq(("a", 1.0), ("a", 1.0), ("b", 1.0), ("b", 2.0))
      .zipWithIndex.map { case ((t, v), i) =>
        (i.toLong, day(i), i.toLong, t, v) })
    val r = Events.kruskalWallis(spark, dir).collect().head
    // floor(R²/n): floor(8)+floor(18) = 26 → H = 0.6·26 − 15 = 0.6
    assert(r.getDouble(2) == 0.6, s"h_stat: $r")
    assert(r.getDouble(3) == q6(0.6 / 0.6), s"h_adj = h/0.6: $r")
  }

  test("runsTest: known sign sequence (R=4, n+=3, n-=2)") {
    val dir = java.nio.file.Files.createTempDirectory("runs").toString
    // daily counts 1,2,1,2,3,2 → signs +,−,+,+,− (zero-change days none)
    val counts = Seq(1, 2, 1, 2, 3, 2)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 100 + j).toLong, day(d),
        j.toLong, "view", 1.0)) }
    writeEvents(dir, rows)
    val r = Events.runsTest(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 4L,
      s"counts: $r")
    val (mu, s2) = (2.0 * 3 * 2 / 5 + 1, 2.0 * 3 * 2 * (12 - 5) / (25 * 4))
    assert(r.getDouble(3) == q6((4 - mu) / math.sqrt(s2)), s"z: $r")
  }

  test("pageHinkley: level shift alarms; replicated quantized fold") {
    val dir = java.nio.file.Files.createTempDirectory("ph").toString
    val counts = Seq.fill(10)(10) ++ Seq.fill(5)(30)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 100 + j).toLong, day(d),
        j.toLong, "view", 1.0)) }
    writeEvents(dir, rows)
    val r = Events.pageHinkley(spark, dir, delta = 0.0, lambda = 5.0)
      .collect().head
    // replicate: dev9 = floor((x − S/i − δ)·1e9 + .5), PH prefix sums,
    // running min, alarm when gap > λ·1e9
    var (s, ph, mn) = (0L, 0L, 0L)
    var (firstAlarm, alarms, maxExc) = (-1L, 0L, 0L)
    counts.zipWithIndex.foreach { case (x, i0) =>
      val i = i0 + 1; s += x
      ph += math.floor((x - s.toDouble / i - 0.0) * 1e9 + 0.5).toLong
      mn = math.min(mn, ph)
      val exc = ph - mn
      maxExc = math.max(maxExc, exc)
      if (exc > 5e9.toLong) {
        alarms += 1; if (firstAlarm < 0) firstAlarm = i
      }
    }
    assert(r.getLong(0) == 15L, s"n_days: $r")
    assert(r.getDouble(1) == q6(maxExc.toDouble / 1e9), s"max_exc: $r")
    assert(r.getLong(2) == firstAlarm && firstAlarm == 11L,
      s"first alarm right after the shift: $r")
    assert(r.getLong(3) == alarms, s"alarm_days: $r")
  }

  test("cramersV: perfect 2x2 association gives V=1, chi2=N") {
    val dir = java.nio.file.Files.createTempDirectory("cv").toString
    val docs = (1 to 10).map(i => (i.toLong, "t", "en", "src0", 1L)) ++
      (11 to 20).map(i => (i.toLong, "t", "de", "src1", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.cramersV(spark, dir).collect().head
    assert(r.getLong(0) == 20L && r.getLong(1) == 2L && r.getLong(2) == 2L)
    assert(r.getDouble(3) == 20.0, s"chi2 = N on a perfect table: $r")
    assert(r.getDouble(4) == 1.0, s"v: $r")
  }

  test("cohensKappa: agreement by construction (po=0.5, pe=0.5, k=0)") {
    val dir = java.nio.file.Files.createTempDirectory("ck").toString
    // thresholds 5 chars / 2 tokens:
    //   "aaaaaa" → (1,0)  "ab cd" → (1,1)  "a b" → (0,1)  "x" → (0,0)
    Seq((1L, "aaaaaa", "en", "s", 6L), (2L, "ab cd", "en", "s", 5L),
      (3L, "a b", "en", "s", 3L), (4L, "x", "en", "s", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.cohensKappa(spark, dir, charsMin = 5, toksMin = 2)
      .collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ==
      ((1L, 1L, 1L, 1L)), s"cells: $r")
    assert(r.getDouble(5) == 0.5 && r.getDouble(6) == 0.5 &&
      r.getDouble(7) == 0.0, s"po/pe/kappa: $r")
  }

  test("herfindahlIndex: 3:1 two-nation split → HHI 0.625") {
    val dir = java.nio.file.Files.createTempDirectory("hhi").toString
    Seq((0L, "R")).toDF("r_regionkey", "r_name")
      .write.mode("overwrite").parquet(s"$dir/region.parquet")
    Seq((0L, "N1", 0L), (1L, "N2", 0L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    Seq((1L, 0L), (2L, 1L)).toDF("s_suppkey", "s_nationkey")
      .write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    // 3 items via supplier 1 (N1), 1 via supplier 2 (N2), equal revenue
    Seq((1L, 100.0, 0.0), (1L, 100.0, 0.0), (1L, 100.0, 0.0),
      (2L, 100.0, 0.0))
      .toDF("l_suppkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.herfindahlIndex(spark, dir).collect()
    assert(r.length == 1 && r.head.getLong(1) == 2L, s"shape: ${r.toSeq}")
    assert(r.head.getDouble(2) == 0.625, s"0.75² + 0.25²: ${r.toSeq}")
  }

  test("lorenzGini: 1,1,1,5 revenue split → gini 0.375, shares exact") {
    val dir = java.nio.file.Files.createTempDirectory("lg").toString
    val itemCounts = Seq((1L, 1), (2L, 1), (3L, 1), (4L, 5))
    itemCounts.flatMap { case (ok, n) => Seq.fill(n)((ok, 100.0, 0.0)) }
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    itemCounts.map { case (ok, _) => (ok, ok * 10) }
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = Relational.lorenzGini(spark, dir).collect()
    // n=4 → sparse deciles {1,3,6,8}; G = (2·26 − 5·8)/(4·8) = 0.375
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 3, 6, 8), s"${rows.toSeq}")
    assert(rows.map(_.getDouble(1)).toSeq == Seq(0.125, 0.25, 0.375, 1.0),
      s"cum shares: ${rows.toSeq}")
    assert(rows.forall(_.getDouble(2) == 0.375), s"gini: ${rows.toSeq}")
  }
}
