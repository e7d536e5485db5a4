package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph, Index, Relational, Similarity, TextStats}

/** Round-5 batch S: Yule's K, MAP@10, Yule–Walker AR(2), JL distortion,
  * Brown–Forsythe, Tukey fences, local bridges, Cochran–Armitage.
  */
class Round5BatchSSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeDaily(dir: String, counts: Seq[Int]): Unit =
    counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 100 + j).toLong, day(d),
        j.toLong, "view", 1.0)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("yuleK: hand-counted repeat rate") {
    val dir = java.nio.file.Files.createTempDirectory("yk").toString
    // tf: x=3, y=1 → V_1=1, V_3=1; N=4, Σm²V = 10
    // K = 1e4·(10 − 4)/16 = 3750
    Seq((1L, "x x x y", "en", "a", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.yuleK(spark, dir).collect().head
    assert(r.getLong(1) == 4L && r.getLong(2) == 2L, s"N/V: $r")
    assert(r.getDouble(3) == 3750.0, s"K: $r")
  }

  test("mapAtK: short high-tf doc outranks, diluted relevant doc slips") {
    val dir = java.nio.file.Files.createTempDirectory("map").toString
    // d1 (tf=5, dl=5) rel, ranked 1st; d2 (tf=1, dl=5) irrelevant but
    // outscores d3 (tf=4, dl=50, rel — diluted): AP = (1 + 2/3)/2
    val docs = Seq(
      (1L, "w w w w w", "en", "a", 9L),
      (2L, "w a a a a", "en", "a", 9L),
      (3L, ("w w w w " + Seq.fill(46)("b").mkString(" ")), "en", "a", 99L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Index.mapAtK(spark, dir).collect()
    val w = rows.find(_.getString(0) == "w").get
    assert(w.getLong(2) == 2L, s"n_rel: $w")
    val ap9 = 1000000000L + math.floor(2.0 / 3 * 1e9 + 0.5).toLong
    assert(w.getDouble(3) == q6(ap9 / 1e9 / 2), s"AP: $w")
  }

  test("ar2Forecast: alternating series — exact Yule–Walker rationals") {
    val dir = java.nio.file.Files.createTempDirectory("ar2").toString
    writeDaily(dir, Seq(2, 1, 2, 1, 2, 1))
    // z = 6y − 9 = [3,−3,3,−3,3,−3]; a=−45, b=36, c=54, den=891
    val r = Events.ar2Forecast(spark, dir).collect().head
    assert(r.getLong(0) == 6L, s"n: $r")
    assert(r.getDouble(2) == q6(-810.0 / 891), s"phi1: $r")
    assert(r.getDouble(3) == q6(-81.0 / 891), s"phi2: $r")
    val phi1 = -810.0 / 891; val phi2 = -81.0 / 891
    val yhat = (9.0 + phi1 * -3 + phi2 * 3) / 6
    assert(r.getDouble(4) == math.floor(yhat * 1e4 + 0.5) / 1e4,
      s"forecast: $r")
  }

  test("ar2Forecast: constant series degenerates to the mean") {
    val dir = java.nio.file.Files.createTempDirectory("ar2c").toString
    writeDaily(dir, Seq(3, 3, 3, 3))
    val r = Events.ar2Forecast(spark, dir).collect().head
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, s"phis: $r")
    assert(r.getDouble(4) == 3.0, s"forecast: $r")
  }

  test("jlDistortion: single-coordinate differences have ratio exactly 1") {
    val dir = java.nio.file.Files.createTempDirectory("jl").toString
    // consecutive vectors differ in exactly one coordinate → the sign
    // cancels in the square: dproj² = k·δ², ratio ≡ 1.0
    val vecs = (0 to 3).map { i =>
      val v = Array.fill(8)(0.0f)
      for (c <- 0 until i) v(c) = 0.25f * (c + 1)
      (i.toLong, v, 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.jlDistortion(spark, dir).collect().head
    assert(r.getLong(0) == 3L, s"pairs: $r")
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 &&
      r.getDouble(3) == 1.0, s"ratios: $r")
    assert(r.getDouble(4) == 0.0, s"bad_share: $r")
  }

  test("brownForsythe: equal spreads give F=0; planted spread gap F=1") {
    val dir = java.nio.file.Files.createTempDirectory("bf").toString
    def write(rows: Seq[(String, Long)]): Unit =
      rows.map { case (s, n) => (s.hashCode.toLong, "t", "en", s, n) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    write(Seq(("a", 1L), ("a", 3L), ("b", 5L), ("b", 7L)))
    val r0 = TextStats.brownForsythe(spark, dir).collect().head
    assert(r0.getDouble(4) == 0.0, s"equal spreads: $r0")
    // A: z = [0, 10]; B: z = [0, 0] → SSB=25, SSW=50, F=(25/1)/(50/2)=1
    write(Seq(("a", 0L), ("a", 10L), ("b", 5L), ("b", 5L)))
    val r1 = TextStats.brownForsythe(spark, dir).collect().head
    assert(r1.getDouble(2) == 25.0 && r1.getDouble(3) == 50.0, s"SS: $r1")
    assert(r1.getDouble(4) == 1.0, s"F: $r1")
  }

  test("tukeyOutliers: planted far point is the only fence breach") {
    val dir = java.nio.file.Files.createTempDirectory("tk").toString
    val vals = (1 to 8).map(_.toDouble) :+ 100.0
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, day(0), i.toLong, "view", v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.tukeyOutliers(spark, dir).collect().head
    assert(r.getLong(1) == 9L, s"n: $r")
    assert(r.getDouble(2) == 3.0 && r.getDouble(3) == 7.0, s"Q1/Q3: $r")
    assert(r.getLong(4) == 0L && r.getLong(5) == 1L, s"low/high: $r")
    assert(r.getDouble(6) == q6(1.0 / 9), s"share: $r")
  }

  test("localBridges: pendant edge bridges, triangle edges are embedded") {
    val dir = java.nio.file.Files.createTempDirectory("lb").toString
    // two copies of basket {1,2,3} (triangle, c=2 each edge) and two of
    // {3,4} (pendant edge, c=2): only (3,4) has no common neighbor
    val rows = Seq(1L, 2L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L))) ++
      Seq((3L, 3L), (3L, 4L), (4L, 3L), (4L, 4L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Graph.localBridges(spark, dir).collect()
    assert(r.length == 1, s"${r.toSeq}")
    assert(r.head.getLong(0) == 2L, s"weight: ${r.head}")
    assert(r.head.getLong(1) == 4L && r.head.getLong(2) == 1L,
      s"edges/bridges: ${r.head}")
    assert(r.head.getDouble(3) == 0.25, s"share: ${r.head}")
  }

  test("cochranArmitage: perfect two-month trend hits z²=4") {
    val dir = java.nio.file.Files.createTempDirectory("ca").toString
    val jan = new Timestamp(1705276800000L) // 2024-01-15
    val feb = new Timestamp(1707955200000L) // 2024-02-15
    Seq((1L, jan, "O"), (2L, jan, "O"), (3L, feb, "F"), (4L, feb, "F"))
      .toDF("o_orderkey", "o_orderdate", "o_orderstatus")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.cochranArmitage(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L &&
      r.getLong(2) == 2L, s"counts: $r")
    assert(r.getDouble(3) == 4.0, s"z2: $r")
    assert(r.getLong(4) == 1L, s"flag: $r")
  }
}
