package graft

import java.sql.Timestamp
import graft.operators.{Dedup, Events, Graph, Relational, TextStats}

/** Round-5 batch V: RAKE keywords, chi2 term selection, Cronbach's
  * alpha, SALSA, transition reciprocity, CEM ATT, odds-ratio CI,
  * blocking-scheme quality.
  */
class Round5BatchVSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = new Timestamp(1704067200000L + h * 3600000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeDocs(dir: String,
                        docs: Seq[(Long, String, String, Long)]): Unit =
    docs.map { case (id, t, src, nc) => (id, t, "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("rakeKeywords: stopword-delimited phrases, deg/freq word scores") {
    val dir = java.nio.file.Files.createTempDirectory("rk").toString
    // phrases "red apple" / "green apple": every word deg/freq = 2
    writeDocs(dir, Seq((1L, "red apple and green apple", "a", 25L)))
    val rows = TextStats.rakeKeywords(spark, dir).collect()
    assert(rows.length == 2, s"rows: ${rows.mkString(";")}")
    assert(rows(0).getString(0) == "green apple" &&
      rows(0).getDouble(3) == 4.0, s"r0: ${rows(0)}")
    assert(rows(1).getString(0) == "red apple" &&
      rows(1).getDouble(3) == 4.0, s"r1: ${rows(1)}")
    assert(rows.forall(r => r.getLong(1) == 2L && r.getLong(2) == 1L))
  }

  test("chi2Terms: perfectly separating terms score N, shared term 0") {
    val dir = java.nio.file.Files.createTempDirectory("x2").toString
    val docs = (1 to 5).map(i => (i.toLong, "aa bb", "src0", 5L)) ++
      (6 to 10).map(i => (i.toLong, "bb cc", "src1", 5L))
    writeDocs(dir, docs)
    val rows = TextStats.chi2Terms(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(rows("aa") == 10.0 && rows("cc") == 10.0, s"sep: $rows")
    assert(rows("bb") == 0.0, s"shared: $rows")
  }

  test("cronbachAlpha: items identical up to scale — alpha exactly 1") {
    val dir = java.nio.file.Files.createTempDirectory("ca").toString
    // n_chars == token count == distinct count per doc
    writeDocs(dir, Seq((1L, "a b", "s", 2L), (2L, "a b c", "s", 3L),
      (3L, "a b c d", "s", 4L)))
    val r = TextStats.cronbachAlpha(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 3L, s"n/k: $r")
    assert(r.getDouble(2) == 1.0, s"alpha: $r")
  }

  test("salsaScores: hand-iterated dyadic walk on a 2x2 graph") {
    val dir = java.nio.file.Files.createTempDirectory("sl").toString
    Seq((1L, 1L), (2L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Graph.salsaScores(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(rows(("auth", 1000002L)) == 1.34375, s"a2: $rows")
    assert(rows(("auth", 1000001L)) == 0.65625, s"a1: $rows")
    assert(rows(("hub", 1L)) == 1.328125, s"h1: $rows")
    assert(rows(("hub", 2L)) == 0.671875, s"h2: $rows")
  }

  test("reciprocity: one loop pair and one one-way edge") {
    val dir = java.nio.file.Files.createTempDirectory("rc").toString
    Seq((1L, ts(0), 1L, "A", 1.0), (2L, ts(1), 1L, "B", 1.0),
        (3L, ts(2), 1L, "A", 1.0),
        (4L, ts(0), 2L, "A", 1.0), (5L, ts(1), 2L, "C", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.reciprocity(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L, s"edges: $r")
    assert(r.getDouble(2) == q6(2.0 / 3), s"recip: $r")
    assert(r.getLong(3) == 3L && r.getLong(4) == 2L, s"w: $r")
    assert(r.getDouble(5) == q6(2.0 / 3), s"w_ratio: $r")
  }

  test("cemAtt: one matched stratum, one off-support treated order") {
    val dir = java.nio.file.Files.createTempDirectory("cm").toString
    val d = new Timestamp(1704067200000L)
    Seq((1L, "1-URGENT", "O", 10.0, d), (2L, "1-URGENT", "O", 20.0, d),
        (3L, "3-MEDIUM", "O", 10.0, d), (4L, "3-MEDIUM", "O", 10.0, d),
        (5L, "1-URGENT", "F", 50.0, d))
      .toDF("o_orderkey", "o_orderpriority", "o_orderstatus",
        "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.cemAtt(spark, dir).collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L, s"strata: $r")
    assert(r.getLong(2) == 1L, s"unmatched: $r")
    assert(r.getDouble(3) == 5.0, s"att: $r")
  }

  test("oddsRatioCi: balanced 2x2 — OR = RR = 1, Woolf CI around it") {
    val dir = java.nio.file.Files.createTempDirectory("or").toString
    val d = new Timestamp(1704067200000L)
    Seq((1L, "F", 1.0, d), (2L, "O", 2.0, d),
        (3L, "F", 3.0, d), (4L, "O", 4.0, d))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.oddsRatioCi(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 1L, 1L, 1L)), s"cells: $r")
    assert(r.getLong(4) == 1L, s"defined: $r")
    assert(r.getDouble(5) == 1.0 && r.getDouble(6) == 1.0, s"or/rr: $r")
    assert(r.getDouble(7) == q6(math.exp(-1.96 * 2)), s"lo: $r")
    assert(r.getDouble(8) == q6(math.exp(1.96 * 2)), s"hi: $r")
  }

  test("blockingQuality: dup pair co-blocked, odd doc in its own band") {
    val dir = java.nio.file.Files.createTempDirectory("bq").toString
    writeDocs(dir, Seq(
      (1L, "alpha beta gamma delta", "s", 22L),
      (2L, "alpha beta gamma delta", "s", 22L),
      (3L, "alpha beta gamma epsilon zeta", "s", 45L)))
    val r = Dedup.blockingQuality(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L, s"n/truth: $r")
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L, s"cand/match: $r")
    assert(r.getDouble(4) == 1.0, s"pc: $r")
    assert(r.getDouble(5) == q6(1.0 - 1.0 / 3), s"rr: $r")
  }
}
