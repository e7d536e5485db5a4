package graft

import java.sql.Timestamp
import graft.operators.{Curation, Events, Graph, Similarity}

/** Micro-fixture specs for the round-3 additions: interval union,
  * z-score anomalies, tf-idf doc similarity, neighborhood Jaccard,
  * per-source quota, token-budget mixing.
  */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  private def writeEvents(rows: Seq[(Long, Timestamp, Long, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r3ev").toString
    rows.toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def writeDocs(rows: Seq[(Long, String, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("r3doc").toString
    rows.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("intervalUnion: overlaps merge, touching merges, gaps split") {
    val dir = writeEvents(Seq(
      (0L, ts(0), 1L, 10.0),    // [0, 10]
      (1L, ts(5), 1L, 10.0),    // [5, 15] overlaps -> island 1 = [0, 15]
      (2L, ts(15), 1L, 5.0),    // [15, 20] touches (ts == prev max) -> merges
      (3L, ts(100), 1L, 5.0),   // island 2 = [100, 105]
      (4L, ts(0), 2L, 1.0)))    // other user
    val got = Events.intervalUnion(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L) == (4L, 2L, 25.0)) // 20 + 5 covered seconds
    assert(got(2L) == (1L, 1L, 1.0))
  }

  test("zscoreAnomalies: flags the 3-sigma outlier, not the rest") {
    // nine 0.0s + one 100.0: mu=10, sigma_pop=30 -> z(100) = 3.0
    val dir = writeEvents(
      (0L to 8L).map(i => (i, ts(i), 1L, 0.0)) :+ (9L, ts(9), 1L, 100.0))
    val typed = spark.read.parquet(s"$dir/events.parquet")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("t"))
    val dir2 = java.nio.file.Files.createTempDirectory("r3ev").toString
    typed.write.mode("overwrite").parquet(s"$dir2/events.parquet")
    val got = Events.zscoreAnomalies(spark, dir2).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(9L))
    assert(got.head.getDouble(3) == 3.0)
  }

  test("docSimilarityPairs: identical docs score 1.0 through shared terms") {
    val dir = writeDocs(Seq(
      (1L, "apple banana", "s"),
      (2L, "apple banana", "s"),
      (3L, "cherry date", "s")))
    // tiny N: disable df pruning (every term has df/N >= 0.2 here)
    val got = Similarity.docSimilarityPairs(spark, dir, 0.3, 1.0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("neighborJaccard: full overlap = 1.0, disjoint pairs absent") {
    val dir = java.nio.file.Files.createTempDirectory("r3nj").toString
    // customers 1,2 both buy from suppliers 1 and 2; customer 3 -> supplier 3
    Seq((10L, 1L), (11L, 2L), (12L, 3L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (10L, 2L), (11L, 1L), (11L, 2L), (12L, 3L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.neighborJaccard(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((1L, 2L, 2L, 1.0)))
  }

  test("sourceQuota: keeps the cap smallest (hash, id) docs per source") {
    // pctHash(id) = (id * 8388593) % 100: 1->93, 2->86, 3->79, 4->72,
    // 5->65, 6->58 — hash order is descending id here
    val dir = writeDocs(Seq(
      (1L, "x", "a"), (2L, "x", "a"), (3L, "x", "a"),
      (4L, "x", "b"), (5L, "x", "b"), (6L, "x", "b")))
    val got = Curation.sourceQuota(spark, dir, cap = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 3L), ("b", 6L)))
  }

  test("tokenBudget: admits docs in hash order until the budget line") {
    // hash order within source "a": doc 3 (h=79), doc 2 (86), doc 1 (93);
    // each doc is 3 tokens, budget 5: doc 3 (cum 3), doc 2 (cum 6,
    // started at 3 < 5 so admitted), doc 1 (started at 6 >= 5, dropped)
    val dir = writeDocs(Seq(
      (1L, "a b c", "a"), (2L, "a b c", "a"), (3L, "a b c", "a")))
    val got = Curation.tokenBudget(spark, dir, budget = 5).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toMap
    assert(got == Map(3L -> 3L, 2L -> 6L))
  }
}
