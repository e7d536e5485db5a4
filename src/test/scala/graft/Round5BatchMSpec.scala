package graft

import java.sql.Timestamp
import graft.operators.{Events, Relational, TextStats}

/** Round-5 batch M: JSD source distance, Good–Turing smoothing,
  * Kendall tau-b, item-item CF.
  */
class Round5BatchMSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)

  test("jensenShannon: a single source IS the corpus — JSD exactly 0") {
    val dir = java.nio.file.Files.createTempDirectory("jsd1").toString
    Seq((1L, "the cat sat on the mat", "en", "web", 22L),
      (2L, "the dog sat", "en", "web", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.jensenShannon(spark, dir).collect()
    assert(r.length == 1 && r.head.getDouble(2) == 0.0, r.mkString)
  }

  test("jensenShannon: disjoint symmetric sources — equal, in (0, ln2]") {
    val dir = java.nio.file.Files.createTempDirectory("jsd2").toString
    Seq((1L, "aa bb cc", "en", "s1", 8L),
      (2L, "dd ee ff", "en", "s2", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = TextStats.jensenShannon(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(m("s1") == m("s2"), s"asymmetric: $m")
    assert(m("s1") > 0.0 && m("s1") <= 0.693148, s"out of bound: $m")
  }

  test("goodTuring: hand-exact frequency-of-frequencies table") {
    val dir = java.nio.file.Files.createTempDirectory("gt").toString
    // counts: a=1 b=1 c=2 d=3 → N=7, N1=2, N2=1, N3=1
    Seq((1L, "a b c c d d d", "en", "web", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextStats.goodTuring(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    def g(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(rows(0L) == ((0L, 2L, 0.0, g(2.0 / 7))), s"r=0: ${rows(0L)}")
    assert(rows(1L) == ((2L, 1L, 1.0, g(2.0 / 7))), s"r=1: ${rows(1L)}")
    assert(rows(2L) == ((1L, 1L, 3.0, g(3.0 / 7))), s"r=2: ${rows(2L)}")
    assert(rows(3L) == ((1L, 0L, 0.0, 0.0)), s"r=3: ${rows(3L)}")
    assert(rows(4L) == ((0L, 0L, 0.0, 0.0)) &&
      rows(5L) == ((0L, 0L, 0.0, 0.0)), "empty tail rows")
  }

  test("kendallTau: perfectly concordant daily series — tau_b = 1") {
    val dir = java.nio.file.Files.createTempDirectory("kt").toString
    // day d: d+1 clicks, d+2 purchases — strictly co-monotone
    val rows = (0 until 6).flatMap { d =>
      (0 to d).map(i => (d * 100L + i, day(d), 1L, "click", 1.0)) ++
        (0 to d + 1).map(i => (d * 100L + 50 + i, day(d), 1L, "purchase", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.kendallTau(spark, dir).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 15L &&
      r.getLong(2) == 0L && r.getDouble(3) == 1.0, s"got $r")
  }

  test("kendallTau: anti-monotone series — tau_b = -1") {
    val dir = java.nio.file.Files.createTempDirectory("kt2").toString
    // day d: d+1 clicks, 6-d purchases — strictly anti-monotone
    val rows = (0 until 5).flatMap { d =>
      (0 to d).map(i => (d * 100L + i, day(d), 1L, "click", 1.0)) ++
        (0 until 6 - d).map(i =>
          (d * 100L + 50 + i, day(d), 1L, "purchase", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.kendallTau(spark, dir).collect().head
    assert(r.getLong(1) == 0L && r.getLong(2) == 10L &&
      r.getDouble(3) == -1.0, s"got $r")
  }

  test("itemCfTopk: hand baskets — exact cosine, min-support cut") {
    val dir = java.nio.file.Files.createTempDirectory("cf").toString
    // baskets: {10,20} {10,20} {10,30} → co(10,20)=2 passes, co(10,30)=1 cut
    Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L), (3L, 10L), (3L, 30L))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.itemCfTopk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).sortBy(x => (x._1, x._2))
    val cos = math.floor(2.0 / math.sqrt(3.0 * 2.0) * 1e6 + 0.5) / 1e6
    assert(got.toSeq == Seq((10L, 1, 20L, 2L, cos), (20L, 1, 10L, 2L, cos)),
      got.mkString(", "))
  }
}
