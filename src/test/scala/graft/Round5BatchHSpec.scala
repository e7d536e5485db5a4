package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Events, Graph, TextStats}

/** Round-5 batch H: log-rank test, Burrows' delta, link-prediction
  * backtest.
  */
class Round5BatchHSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)

  private def armA(u: Long): Boolean =
    ((u % 2147483648L) * 8388593L) % 100L < 50L

  test("logrankTest: one arm converts, the other censors — χ² is exact") {
    val dir = java.nio.file.Files.createTempDirectory("lr").toString
    val as = (1L to 200L).filter(armA).take(10)
    val bs = (1L to 200L).filterNot(armA).take(10)
    val rows =
      as.zipWithIndex.flatMap { case (u, i) =>
        Seq((i * 2L, day(0), u, "view", 1.0),
          (i * 2L + 1, day(1), u, "purchase", 1.0))
      } ++ bs.zipWithIndex.map { case (u, i) =>
        (100L + i, day(0), u, "view", 1.0)
      }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.logrankTest(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((10L, 10L, 10L)))
    assert(r.getDouble(3) == 5.0, s"expected_a ${r.getDouble(3)}")
    // V = d·n1·n2·(n−d)/(n²(n−1)) = 10·10·10·10/(400·19); χ² = 25/V
    val v9 = math.floor(10.0 * 10 * 10 * 10 / (20.0 * 20 * 19) * 1e9
      + 0.5).toLong
    val chi2 = math.floor(25.0 / (v9.toDouble / 1e9) * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == chi2, s"chi2 ${r.getDouble(4)} vs $chi2")
  }

  test("burrowsDelta: identical sources sit at distance zero") {
    val dir = java.nio.file.Files.createTempDirectory("bd").toString
    val styleA = "the quick brown fox jumps over the lazy dog the end"
    val styleC = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    Seq((1L, styleA, "en", "twin1", 1L), (2L, styleA, "en", "twin2", 1L),
      (3L, styleC, "en", "other", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextStats.burrowsDelta(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3))
      .toMap
    assert(got(("twin1", "twin2")) == 0.0, s"got $got")
    assert(got(("other", "twin1")) > 0.0)
    assert(got(("other", "twin1")) == got(("other", "twin2")))
  }

  test("linkPredEval: doubly-connected pre pair that reappears → AUC 1") {
    val dir = java.nio.file.Files.createTempDirectory("lpe").toString
    // pre (day 0): S1{c1,c2}, S4{c1,c2}, S2{c3,c4}; post (day 100):
    // S3{c1,c2}. Pair (c1,c2) scores 2·aa(2) and labels 1; (c3,c4)
    // scores aa(2), labels 0.
    val edges = Seq(
      (1L, 1L, 0, 21L), (2L, 2L, 0, 21L),     // S1 pre
      (3L, 1L, 0, 24L), (4L, 2L, 0, 24L),     // S4 pre
      (5L, 3L, 0, 22L), (6L, 4L, 0, 22L),     // S2 pre
      (7L, 1L, 100, 23L), (8L, 2L, 100, 23L)) // S3 post
    edges.map { case (ok, ck, d, _) => (ok, ck, day(d)) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    edges.map { case (ok, _, _, sk) => (ok, sk) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Graph.linkPredEval(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((2L, 1L)), s"got $r")
    assert(r.getDouble(2) == 1.0, s"auc ${r.getDouble(2)}")
  }

  test("linkPredEval: AUC well-defined on the fixture") {
    // sf0.001's handful of suppliers all exceed the default 64-degree
    // hub cap (each serves most customers); widen it for the property
    val r = Graph.linkPredEval(spark, sf, maxDeg = 10000L)
      .collect().head
    assert(r.getLong(0) > 0)
    assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(0))
    if (r.getLong(1) > 0 && r.getLong(1) < r.getLong(0))
      assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }
}
