package graft

import java.sql.Timestamp
import graft.operators.{Curation, Dedup, Events, Graph, Ml, Relational,
  TextStats}

/** Round-6 batch B (W482–W491): GMD/Gini, Benford, running records,
  * Jaccard/PA link prediction, LIX, MSTTR, containment dedup, MCC,
  * Pareto front. Hand-computed micro fixtures; integer-only or
  * pinned-chain surfaces throughout.
  */
class Round6BatchBSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)

  test("runningRecords: 1,3,2,5 daily series — records on days 0,1,3") {
    val dir = java.nio.file.Files.createTempDirectory("rr6").toString
    Seq((1L, day(0), 1L, "view", 1.0), (2L, day(1), 1L, "view", 3.0),
      (3L, day(2), 2L, "view", 2.0), (4L, day(3), 2L, "view", 5.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.runningRecords(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 3L, s"records: $r")
    assert(r.getLong(2) == 19723L + 3L, s"last: $r")
    assert(r.getDouble(3) == 5.0, s"max: $r")
  }

  test("giniMeanDifference: totals 1,2,3 — GMD 4/3, Gini 1/3") {
    val dir = java.nio.file.Files.createTempDirectory("gmd6").toString
    Seq((1L, 1L, 1.0), (2L, 1L, 2.0), (3L, 2L, 3.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.giniMeanDifference(spark, dir).collect().head
    assert(r.getLong(0) == 3L, s"n: $r")
    assert(r.getDouble(1) == 1.3333, s"gmd: $r")
    assert(r.getDouble(2) == 0.333333, s"gini: $r")
  }

  test("benfordDigits: hand digits — exact chi2 replay") {
    val dir = java.nio.file.Files.createTempDirectory("bf6b").toString
    Seq((1L, 1L, 1.11), (2L, 1L, 1.23), (3L, 2L, 9.99))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rs = Relational.benfordDigits(spark, dir).collect()
    assert(rs.length == 9)
    val byD = rs.map(r => r.getLong(0) -> r).toMap
    assert(byD(1L).getLong(1) == 2L && byD(9L).getLong(1) == 1L)
    assert(byD(2L).getLong(1) == 0L)
    // replay the exact chi2 chain: per-digit 1e-9-grid terms
    val obs = Map(1L -> 2L, 9L -> 1L).withDefaultValue(0L)
    val t9 = (1 to 9).map { d =>
      val p = math.log10(1.0 + 1.0 / d)
      val e = 3.0 * p
      val diff = obs(d.toLong).toDouble - e
      math.floor(diff * diff / e * 1e9 + 0.5).toLong
    }.sum
    val chi2 = math.floor(t9.toDouble / 1e9 * 1e6 + 0.5) / 1e6
    assert(byD(1L).getDouble(4) == chi2, s"chi2: ${byD(1L)}")
  }

  private def writeGraph(dir: String): Unit = {
    // c1 -> {s10, s11}; c2 -> {s10, s11, s12}
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 2L))
      .map { case (ok, ck) => (ok, ck, day(0)) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (2L, 11L), (3L, 10L), (4L, 11L), (5L, 12L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("jaccardLinkPred: shared-neighbor triangle — exact overlaps") {
    val dir = java.nio.file.Files.createTempDirectory("jlp6").toString
    writeGraph(dir)
    val rs = Graph.jaccardLinkPred(spark, dir).collect()
    CacheScope.release(spark)
    assert(rs.length == 3, s"pairs: ${rs.mkString(";")}")
    val top = rs.head
    assert(top.getLong(0) == 1000010L && top.getLong(1) == 1000011L)
    assert(top.getLong(2) == 2L && top.getLong(3) == 2L &&
      top.getDouble(4) == 1.0, s"top: $top")
    assert(rs(1).getDouble(4) == 0.5 && rs(2).getDouble(4) == 0.5)
  }

  test("preferentialAttachment: hub pair scores highest — exact products") {
    val dir = java.nio.file.Files.createTempDirectory("pa6").toString
    writeGraph(dir)
    val rs = Graph.preferentialAttachment(spark, dir).collect()
    CacheScope.release(spark)
    assert(rs.length == 3)
    val top = rs.head
    assert(top.getLong(0) == 1000010L && top.getLong(1) == 1000011L)
    assert(top.getLong(2) == 2L && top.getLong(3) == 2L &&
      top.getLong(4) == 4L, s"top: $top")
    assert(rs(1).getLong(4) == 2L && rs(2).getLong(4) == 2L)
  }

  private def writeDocs(dir: String,
                        rows: Seq[(Long, String, String)]): Unit =
    rows.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("lixReadability: hand sentence/long-word counts") {
    val dir = java.nio.file.Files.createTempDirectory("lix6").toString
    writeDocs(dir, Seq(
      (1L, "The cat sat. The elephant wandered!", "sA")))
    val r = TextStats.lixReadability(spark, dir).collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 6L, s"docs/words: $r")
    assert(r.getLong(3) == 2L && r.getLong(4) == 2L, s"sent/long: $r")
    // LIX = 6/2 + 100*2/6 = 36.3333 on the 1e-4 grid
    val lix = math.floor((6.0 / 2.0 + 100.0 * 2.0 / 6.0) * 1e4 + 0.5) / 1e4
    assert(r.getDouble(5) == lix, s"lix: $r")
  }

  test("msttrDiversity: rich segment + degenerate segment = 0.52") {
    val dir = java.nio.file.Files.createTempDirectory("ms6").toString
    // letter-only tokens (the tokenizer strips non-letter edges)
    val rich = ('a' to 'y').map(c => s"$c$c").mkString(" ")
    val flat = Seq.fill(25)("dup").mkString(" ")
    writeDocs(dir, Seq((1L, s"$rich $flat", "sA")))
    val r = TextStats.msttrDiversity(spark, dir).collect().head
    assert(r.getLong(1) == 2L, s"segments: $r")
    assert(r.getDouble(2) == 0.52, s"msttr: $r")
  }

  test("docContainment: short doc inside a longer one — containment 1") {
    val dir = java.nio.file.Files.createTempDirectory("dc6").toString
    // letter-only tokens (the tokenizer strips non-letter edges)
    val base = ('a' to 'j').map(c => s"$c$c$c").mkString(" ")
    writeDocs(dir, Seq(
      (1L, base, "sA"), (2L, base + " extra", "sB"),
      (3L, "completely different words entirely here now", "sC")))
    val rs = Dedup.docContainment(spark, dir).collect()
    CacheScope.release(spark)
    assert(rs.length == 1, s"pairs: ${rs.mkString(";")}")
    val r = rs.head
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L, s"ids: $r")
    assert(r.getLong(2) == 8L && r.getLong(3) == 8L, s"sizes: $r")
    assert(r.getDouble(4) == 1.0 && r.getLong(5) == 1L, s"cont: $r")
  }

  test("mccThreshold: cells agree with prf_metrics; chain replays") {
    val r = Ml.mccThreshold(spark, sf).collect().head
    val p = Ml.prfMetrics(spark, sf).collect().head
    val (tp, fp, fn, tn) = (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))
    assert((tp, fp, fn, tn) ==
      (p.getLong(0), p.getLong(1), p.getLong(2), p.getLong(3)))
    val num = tp.toDouble * tn.toDouble - fp.toDouble * fn.toDouble
    val den = math.sqrt((tp + fp).toDouble * (tp + fn).toDouble *
      (tn + fp).toDouble * (tn + fn).toDouble)
    val mcc = math.floor(num / den * 1e6 + 0.5) / 1e6
    assert(r.getDouble(4) == mcc, s"mcc: $r vs $mcc")
    assert(r.getDouble(4) >= -1.0 && r.getDouble(4) <= 1.0)
  }

  test("paretoFront: only the undominated (len,distinct) doc survives") {
    val dir = java.nio.file.Files.createTempDirectory("pf6").toString
    writeDocs(dir, Seq(
      (1L, (0 until 10).map(i => s"a$i").mkString(" "), "sA"),
      (2L, "a a a b b b c c c d d e", "sA"),
      (3L, "a b c d e f g h i j k a", "sA"),
      (4L, (0 until 8).map(i => s"b$i").mkString(" "), "sA")))
    val rs = Curation.paretoFront(spark, dir).collect()
    assert(rs.length == 1, s"front: ${rs.mkString(";")}")
    assert(rs.head.getLong(0) == 3L && rs.head.getLong(1) == 12L &&
      rs.head.getLong(2) == 11L, s"front: ${rs.head}")
  }
}
