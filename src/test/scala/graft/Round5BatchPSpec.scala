package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph, Similarity, TextStats}

/** Round-5 batch P: Katz centrality (exact walk counts), Monroe
  * log-odds terms, average precision, Cramér–von Mises, exact moment
  * skew/kurtosis, Gaussian naive Bayes.
  */
class Round5BatchPSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeEvents(dir: String,
                          rows: Seq[(Long, Timestamp, Long, String, Double)])
  : Unit =
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("katzCentrality: star graph walk counts replicated exactly") {
    val dir = java.nio.file.Files.createTempDirectory("katz").toString
    // customers 1, 2 each buy from supplier 1 → star c1—s—c2
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (20L, 1L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Graph.katzCentrality(spark, dir).collect()
    // replicate: leaf w_t = (2,2,4,4,8,8)… no: star walk counts —
    // center s: w_t(s) = 2·w_{t-1}(leaf), leaf: w_t = w_{t-1}(s)
    var (leaf, center) = (1.0, 1.0) // w0
    var (kLeaf, kCenter) = (0.0, 0.0)
    for (t <- 1 to 6) {
      val (nl, nc) = (center, 2 * leaf)
      kLeaf += math.pow(0.05, t) * nl
      kCenter += math.pow(0.05, t) * nc
      leaf = nl; center = nc
    }
    assert(rows.head.getLong(0) == 1000001L, s"hub first: ${rows.toSeq}")
    assert(rows.head.getDouble(1) ==
      math.floor(kCenter * 1e9 + 0.5) / 1e9, s"center katz: ${rows.toSeq}")
    assert(rows(1).getDouble(1) ==
      math.floor(kLeaf * 1e9 + 0.5) / 1e9, s"leaf katz: ${rows.toSeq}")
    assert(rows.map(_.getLong(0)).toSeq == Seq(1000001L, 1L, 2L),
      s"id tiebreak among equal leaves: ${rows.toSeq}")
  }

  test("logOddsTerms: skewed term tops z, formula replicated") {
    val dir = java.nio.file.Files.createTempDirectory("lo").toString
    // srcA says "alpha" a lot; both say "common" equally
    val docs =
      (1 to 6).map(i => (i.toLong, "alpha common", "en", "src0", 1L)) ++
      (7 to 12).map(i => (i.toLong, "beta common", "en", "srcX", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextStats.logOddsTerms(spark, dir).collect()
    assert(rows.head.getString(0) == "alpha", s"${rows.toSeq}")
    // replicate for "alpha": ya=6, yb=0, na=12, nb=12, f=6, N=24
    val aw = 500.0 * 6 / 24
    val delta = math.log((6 + aw) / (12 + 500.0 - 6 - aw)) -
      math.log((0 + aw) / (12 + 500.0 - 0 - aw))
    val z = delta / math.sqrt(1.0 / (6 + aw) + 1.0 / (0 + aw))
    assert(rows.head.getDouble(3) == q6(delta), s"delta: ${rows.toSeq}")
    assert(rows.head.getDouble(4) == q6(z), s"z: ${rows.toSeq}")
    assert(rows.last.getString(0) == "beta", s"negative pole: ${rows.toSeq}")
  }

  test("prAuc: positives at ranks 1 and 3 → AP = (1 + 2/3)/2") {
    val dir = java.nio.file.Files.createTempDirectory("ap").toString
    Seq((1L, "the the the", "en", "s", 1L),   // share 1.0, positive
      (2L, "the xxx", "de", "s", 1L),          // share 0.5
      (3L, "the yyy zzz", "en", "s", 1L),      // share 1/3, positive
      (4L, "aaa bbb", "de", "s", 1L))          // share 0
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.prAuc(spark, dir).collect().head
    assert(r.getLong(0) == 4L && r.getLong(1) == 2L, s"shape: $r")
    val ap9 = 1000000000L + math.floor(2e9 / 3 + 0.5).toLong
    assert(r.getDouble(2) == q6(ap9.toDouble / 2 / 1e9), s"ap: $r")
    assert(r.getDouble(3) == 0.2, s"p@10 = 2/10: $r")
  }

  test("cvmTest: interleaved samples → T = 0.125") {
    val dir = java.nio.file.Files.createTempDirectory("cvm").toString
    // click = {1, 3}, purchase = {2, 4}: U = 2·1 + 2·5 = 12,
    // T = 12/(2·2·4) − 15/24 = 0.125
    writeEvents(dir, Seq(("click", 1.0), ("purchase", 2.0),
      ("click", 3.0), ("purchase", 4.0)).zipWithIndex.map {
      case ((t, v), i) => (i.toLong, day(i), i.toLong, t, v) })
    val r = Events.cvmTest(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L, s"sizes: $r")
    assert(r.getDouble(2) == 0.125, s"t_stat: $r")
  }

  test("skewKurtosis: symmetric 3-point law → skew 0, excess −1.5") {
    val dir = java.nio.file.Files.createTempDirectory("sk").toString
    writeEvents(dir, Seq(1.0, 2.0, 3.0).zipWithIndex.map {
      case (v, i) => (i.toLong, day(i), i.toLong, "view", v) })
    val r = Events.skewKurtosis(spark, dir).collect().head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 2.0, s"n/mean: $r")
    assert(r.getDouble(3) == 0.0, s"skew: $r")
    assert(r.getDouble(4) == -1.5, s"uniform-3 excess kurtosis: $r")
  }

  test("gaussianNb: separated 2-dim classes classify diagonally") {
    val dir = java.nio.file.Files.createTempDirectory("gnb").toString
    Seq((1L, Seq(0.1f, 0.2f), 0), (2L, Seq(0.2f, 0.1f), 0),
      (3L, Seq(-0.1f, -0.2f), 1), (4L, Seq(-0.2f, -0.1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.gaussianNb(spark, dir).collect()
    assert(rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq ==
      Seq((0, 0, 2L), (1, 1, 2L)), s"confusion: ${rows.toSeq}")
  }
}
