package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Events, Graph, Multimodal, Similarity}

/** Round-5 batch F: media pair-verify, butterfly census, Little's law,
  * exponential-gap KS, PQ codebooks.
  */
class Round5BatchFSpec extends SparkSpec {
  import spark.implicits._

  test("mediaDedupVerify: identical blobs verify, distinct ones don't") {
    val dir = java.nio.file.Files.createTempDirectory("mdv").toString
    // doc_ids ≡ 0 mod 3 → all 'image'; two identical, one very different
    val same = "abcdefghijklmnopqrstuvwxyz0123456789"
    val diff = "zzzzaaaazzzzaaaazzzzaaaazzzzaaaazzzz"
    Seq((3L, same, "en", "s", 36L), (6L, same, "en", "s", 36L),
      (9L, diff, "en", "s", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.mediaDedupVerify(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // identical docs share bucket AND sig → the pair verifies at dist 0
    val (cand, ver, _) = got("image")
    assert(ver >= 1L && cand >= ver, s"got $got")
  }

  test("butterflyCount: K2,2 plus a pendant leg — exactly one butterfly") {
    val dir = java.nio.file.Files.createTempDirectory("bfly").toString
    def od = new Timestamp(1700000000000L)
    // orders: one per (cust, supplier) edge
    Seq((1L, 1L, od), (2L, 1L, od), (3L, 2L, od), (4L, 2L, od),
      (5L, 3L, od))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (2L, 11L), (3L, 10L), (4L, 11L), (5L, 10L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Graph.butterflyCount(spark, dir).collect().head
    // edges 5; wedges: s10 → (1,2),(1,3),(2,3); s11 → (1,2);
    // pair (1,2) has w=2 → 1 butterfly
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((5L, 4L, 3L, 1L, 1L)), s"got $r")
  }

  test("littlesLawAudit: hand-built two-session trace") {
    val dir = java.nio.file.Files.createTempDirectory("ll").toString
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    // user 1: session A [0, 10min], then (gap > 30min) session B at 120
    Seq((0L, ts(0), 1L, 1.0), (1L, ts(10), 1L, 1.0),
      (2L, ts(120), 1L, 1.0))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.littlesLawAudit(spark, dir).collect().head
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getLong(0) == 2L)                       // sessions
    assert(r.getDouble(1) == 2.0)                    // span hours
    assert(r.getDouble(2) == 1.0)                    // λ per hour
    assert(r.getDouble(3) == 5.0)                    // W mean minutes
    assert(r.getDouble(4) == q6(600.0 / 7200.0))     // L_pred
    assert(r.getDouble(5) == q6(12.0 / 121.0))       // minute-grid L
    assert(r.getDouble(6) == q6(12.0 / 121.0 / (600.0 / 7200.0)))
  }

  test("expGapFit: constant gaps — KS equals the first CDF jump") {
    val dir = java.nio.file.Files.createTempDirectory("egf").toString
    def tsSec(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    Seq((0L, tsSec(0), 1L, "a", 0.0), (1L, tsSec(1), 1L, "a", 0.0),
      (2L, tsSec(2), 1L, "a", 0.0), (3L, tsSec(3), 1L, "a", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.expGapFit(spark, dir).collect().head
    assert(r.getString(0) == "a" && r.getLong(1) == 3L)
    assert(r.getDouble(2) == 3600.0, s"λ/hr ${r.getDouble(2)}")
    // λ=1, all gaps 1 → D = F(1) = 1 − e⁻¹ (empirical CDF is 0 below 1)
    val f9 = math.floor((1.0 - math.exp(-1.0)) * 1e9 + 0.5).toLong
    val d9 = (3L * f9) // |0·1e9 − 3·f9| dominates at i=1
    val ks = math.floor(d9.toDouble / 3e9 * 1e6 + 0.5) / 1e6
    assert(r.getDouble(3) == ks, s"ks ${r.getDouble(3)} vs $ks")
  }

  test("pqCodebook: identical vectors collapse to one zero-error code") {
    val dir = java.nio.file.Files.createTempDirectory("pq").toString
    val v = Array.tabulate(64)(i => 0.25f * (i % 4))
    (1L to 8L).map(i => (i, v, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.pqCodebook(spark, dir).collect()
    // per subspace: everything lands in code 0 with MSE 0
    assert(rows.length == 2, s"got ${rows.mkString(";")}")
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 8L
        && r.getDouble(3) == 0.0, s"row $r")
    }
  }

  test("pqCodebook: partitions the corpus, non-negative errors") {
    val rows = Similarity.pqCodebook(spark, sf).collect()
    val bySub = rows.groupBy(_.getLong(0))
    assert(bySub.keySet == Set(0L, 1L))
    val total = Tables.embeddings(spark, sf).count()
    bySub.values.foreach { rs =>
      assert(rs.map(_.getLong(2)).sum == total)
      assert(rs.forall(_.getDouble(3) >= 0.0))
    }
  }
}
