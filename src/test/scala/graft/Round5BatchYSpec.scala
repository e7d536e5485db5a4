package graft

import java.sql.Timestamp
import graft.operators.{Dedup, Events, Relational, TextStats}

/** Round-5 batch Y: Hoover index, Hellinger distance, permutation
  * entropy, Pielou evenness, detector agreement, quantile gaps.
  */
class Round5BatchYSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeDocs(dir: String,
                        docs: Seq[(Long, String, String)]): Unit =
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("hooverIndex: 25% of spend must move to equalize 1000 vs 3000") {
    val dir = java.nio.file.Files.createTempDirectory("hv").toString
    Seq((1L, 1L, 10.0), (2L, 2L, 30.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.hooverIndex(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 0.25, s"hoover: $r")
  }

  test("hellingerDistance: identical dists 0, disjoint dists 1") {
    val same = java.nio.file.Files.createTempDirectory("hs").toString
    writeDocs(same, Seq((1L, "a b", "src0"), (2L, "a b", "src1")))
    val rs = TextStats.hellingerDistance(spark, same).collect().head
    assert(rs.getLong(2) == 2L, s"vocab: $rs")
    assert(rs.getDouble(3) == 1.0 && rs.getDouble(4) == 0.0, s"id: $rs")
    val dis = java.nio.file.Files.createTempDirectory("hd").toString
    writeDocs(dis, Seq((1L, "a a", "src0"), (2L, "b b", "src1")))
    val rd = TextStats.hellingerDistance(spark, dis).collect().head
    assert(rd.getDouble(3) == 0.0 && rd.getDouble(4) == 1.0, s"dis: $rd")
  }

  test("permutationEntropy: monotone series — one pattern, zero entropy") {
    val dir = java.nio.file.Files.createTempDirectory("pey").toString
    (1 to 5).flatMap(d => (0 until d).map(j =>
      ((d * 100 + j).toLong, day(d), j.toLong, "view", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.permutationEntropy(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L, s"patterns: $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0, s"h: $r")
  }

  test("pielouEvenness: two equal sources — evenness at the grid limit") {
    val dir = java.nio.file.Files.createTempDirectory("pv").toString
    writeDocs(dir, Seq((1L, "x", "a"), (2L, "y", "b")))
    val r = TextStats.pielouEvenness(spark, dir).collect().head
    val t9 = math.floor(0.5 * math.log(2) * 1e9 + 0.5).toLong
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"k: $r")
    assert(r.getDouble(2) == q6(2 * t9 / 1e9), s"h: $r")
    assert(r.getDouble(3) == q6(2 * t9 / 1e9 / math.log(2.0)), s"j: $r")
  }

  test("detectorAgreement: identical docs found by both detectors") {
    val dir = java.nio.file.Files.createTempDirectory("da").toString
    writeDocs(dir, Seq((1L, "alpha beta gamma delta", "s"),
      (2L, "alpha beta gamma delta", "s"),
      (3L, "unrelated totally different words here", "s")))
    val r = Dedup.detectorAgreement(spark, dir).collect().head
    assert(r.getLong(0) == 1L, s"both: $r")
    assert(r.getLong(1) == 0L && r.getLong(2) == 0L, s"only: $r")
    assert(r.getDouble(3) == 1.0, s"agree: $r")
  }

  test("quantileGap: tail moves while the median holds") {
    val dir = java.nio.file.Files.createTempDirectory("qg").toString
    (Seq(1.0, 2.0, 3.0, 4.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, day(0), i.toLong, "click", v) } ++
      Seq((10L, day(0), 1L, "purchase", 2.0),
        (11L, day(0), 2L, "purchase", 2.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rs = Events.quantileGap(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(rs(50) == ((2.0, 2.0, 0.0)), s"q50: $rs")
    assert(rs(90) == ((4.0, 2.0, 2.0)), s"q90: $rs")
  }
}
