package graft

import java.sql.Timestamp
import graft.operators.{Events, Relational, TextStats}

/** Round-5 batch T: Mann–Whitney U + Cliff's delta, Jarque–Bera,
  * Wasserstein-1D, energy distance, lead–lag CCF, Theil's U,
  * standardized effect sizes, partial correlation.
  */
class Round5BatchTSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = new Timestamp(1704067200000L + h * 3600000L)
  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeEvents(dir: String,
                          rows: Seq[(String, Double)]): Unit =
    rows.zipWithIndex.map { case ((t, v), i) =>
      (i.toLong, ts(0), i.toLong, t, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("mannWhitney: hand-ranked ties — exact 2U, tie-corrected z") {
    val dir = java.nio.file.Files.createTempDirectory("mw").toString
    // A={1,2,2}, B={2,3}: midranks give R1=7, U1=1 (2U=2); ties=24
    writeEvents(dir, Seq("click" -> 1.0, "click" -> 2.0,
      "click" -> 2.0, "purchase" -> 2.0, "purchase" -> 3.0))
    val r = Events.mannWhitney(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L, s"n: $r")
    assert(r.getLong(2) == 2L, s"u2: $r")
    val sigma2 = 3.0 * 2 / 12 * ((5 + 1) - 24.0 / (5 * 4))
    assert(r.getDouble(3) == q6((1.0 - 3.0) / math.sqrt(sigma2)),
      s"z: $r")
    assert(r.getDouble(4) == q6(2.0 * 1 / 6 - 1), s"delta: $r")
  }

  test("jarqueBera: symmetric light-tailed sample — exact JB") {
    val dir = java.nio.file.Files.createTempDirectory("jb").toString
    // d = [-100, 0, 0, 100]: skew 0, m2=5000, m4=5e7 → K=-1,
    // JB = (4/6)·(0 + 1/4)
    writeEvents(dir, Seq("view" -> 1.0, "view" -> 2.0,
      "view" -> 2.0, "view" -> 3.0))
    val r = Events.jarqueBera(spark, dir).collect().head
    val jb = 4.0 / 6 * (1.0 / 4)
    assert(r.getLong(1) == 4L, s"n: $r")
    assert(r.getDouble(2) == math.floor(jb * 1e4 + 0.5) / 1e4, s"jb: $r")
    assert(r.getDouble(3) ==
      math.floor(math.exp(-jb / 2) * 1e9 + 0.5) / 1e9, s"p: $r")
  }

  test("wasserstein1d: two unit moves — W1 exactly 1 char") {
    val dir = java.nio.file.Files.createTempDirectory("w1").toString
    // A lengths {1,3}, B lengths {2,2}: transport 1→2 and 3→2
    Seq((1L, "a", "en", "src0", 1L), (2L, "b", "en", "src0", 3L),
        (3L, "c", "en", "src1", 2L), (4L, "d", "en", "src1", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.wasserstein1d(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"n: $r")
    assert(r.getDouble(2) == 1.0, s"w1: $r")
  }

  test("energyDistance: B at the midpoint of A — closed-form integrals") {
    val dir = java.nio.file.Files.createTempDirectory("ed").toString
    // A={0,2}, B={1,1}: E|X-Y|=1, E|X-X'|=1, E|Y-Y'|=0 → D=1
    writeEvents(dir, Seq("click" -> 0.0, "click" -> 2.0,
      "purchase" -> 1.0, "purchase" -> 1.0))
    val r = Events.energyDistance(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"n: $r")
    assert(r.getDouble(2) == 1.0, s"e_xy: $r")
    assert(r.getDouble(3) == 1.0, s"e_dist: $r")
  }

  test("crossCorrDaily: anti-phase series — ccf(0) = -1, thin lags guarded") {
    val dir = java.nio.file.Files.createTempDirectory("ccf").toString
    // clicks/day [1,2,1], purchases/day [5,1,5]
    val rows = Seq((0, "click", 1), (1, "click", 2), (2, "click", 1),
      (0, "purchase", 5), (1, "purchase", 1), (2, "purchase", 5))
    rows.flatMap { case (d, t, c) =>
      (0 until c).map(j => ((d * 1000 + j).toLong, day(d),
        j.toLong, t, 1.0)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rs = Events.crossCorrDaily(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rs(0) == (3L, -1.0), s"lag0: $rs")
    // single-pair lags: zero-variance denominator → guarded to 0.0
    assert(rs(2) == (1L, 0.0) && rs(-2) == (1L, 0.0), s"thin: $rs")
    assert(!rs.contains(3) && !rs.contains(-3), s"empty lags: $rs")
  }

  test("theilU: hour determines type — U exactly 1") {
    val dir = java.nio.file.Files.createTempDirectory("tu").toString
    Seq((1L, ts(0), 1L, "click", 1.0), (2L, ts(0), 2L, "click", 1.0),
        (3L, ts(1), 3L, "purchase", 1.0), (4L, ts(1), 4L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.theilU(spark, dir).collect().head
    // per-term grid: floor(0.5·ln2·1e6 + .5) = 346574, ×2 both sums
    assert(r.getDouble(0) == 0.693148, s"mi: $r")
    assert(r.getDouble(1) == 0.693148, s"ht: $r")
    assert(r.getDouble(2) == 1.0, s"u: $r")
  }

  test("effectSizes: pooled vs control-sd denominators") {
    val dir = java.nio.file.Files.createTempDirectory("es").toString
    // A={1,2,3} (var 1), B={1,2,3,4,5} (var 2.5), gap = -1
    writeEvents(dir, Seq("click" -> 1.0, "click" -> 2.0, "click" -> 3.0,
      "purchase" -> 1.0, "purchase" -> 2.0, "purchase" -> 3.0,
      "purchase" -> 4.0, "purchase" -> 5.0))
    val r = Events.effectSizes(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 5L, s"n: $r")
    val sp = math.sqrt((2 * 1.0 + 4 * 2.5) / 6)
    val jf = 1.0 - 3.0 / (4.0 * 8 - 9)
    assert(r.getDouble(2) == q6(-1.0 / sp), s"d: $r")
    assert(r.getDouble(3) == q6(jf * -1.0 / sp), s"g: $r")
    assert(r.getDouble(4) == q6(-1.0 / math.sqrt(2.5)), s"glass: $r")
  }

  test("partialCorr: y = x + z — confounder subtracts to r = 1") {
    val dir = java.nio.file.Files.createTempDirectory("pc").toString
    // cents grid: x=[100,200,300,400], z=[1,3,2,4], y = x + z exactly
    Seq((1.0, 1.01, 0.01), (2.0, 2.03, 0.03),
        (3.0, 3.02, 0.02), (4.0, 4.04, 0.04))
      .toDF("l_quantity", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.partialCorr(spark, dir).collect().head
    assert(r.getLong(0) == 4L, s"n: $r")
    assert(r.getDouble(2) == 0.8, s"r_xz: $r")   // exact: 1600/2000
    assert(math.abs(r.getDouble(4) - 1.0) <= 1e-5, s"partial: $r")
  }
}
