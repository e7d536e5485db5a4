package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph, Relational}

/** Round-5 batch AG: percolation threshold, VaR/expected shortfall,
  * HAC mean CI, kNN hubness.
  */
class Round5BatchAGSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("percolationThreshold: star vs cycle robustness") {
    val star = java.nio.file.Files.createTempDirectory("pc0").toString
    // one customer buys from 4 suppliers: degrees (4,1,1,1,1)
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$star/orders.parquet")
    (1L to 4L).map(sup => (1L, sup)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$star/lineitem.parquet")
    val r = Graph.percolationThreshold(spark, star).collect().head
    // Σk = 8, Σk² = 20 → κ = 2.5, f_c = 0.5/1.5
    assert(r.getLong(0) == 5L, s"n: $r")
    assert(r.getDouble(2) == 2.5, s"kappa: $r")
    assert(r.getDouble(3) == q(0.5 / 1.5, 6), s"fc: $r")
    assert(r.getLong(4) == 1L, s"flag: $r")
  }

  test("cvarEs: exact tail mean beyond the cumulative VaR") {
    val dir = java.nio.file.Files.createTempDirectory("cv").toString
    // 20 orders: 19 at 10.00, one at 100.00 → VaR95 = 10.00 (the
    // 19th of 20 clears 95%), tail = all ≥ 10.00 → ES = mean of all
    val prices = Seq.fill(19)(10.0) :+ 100.0
    prices.zipWithIndex.map { case (p, i) => (i.toLong, 1L, p) }
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.cvarEs(spark, dir).collect().head
    assert(r.getLong(0) == 20L, s"n: $r")
    assert(r.getDouble(1) == 10.0, s"var: $r")
    // cum at 10.00 = 19 → 1900 ≥ 1900 → threshold 10.00; tail = 20
    assert(r.getDouble(2) == q((19 * 1000 + 10000) / 20.0 / 100.0, 2),
      s"es: $r")
    assert(r.getDouble(3) == 1.0, s"share: $r")
  }

  test("hacMeanCi: iid-ish series — HAC and naive agree; AR inflates") {
    val dir = java.nio.file.Files.createTempDirectory("hc").toString
    // strongly positively autocorrelated: 5 low days then 5 high days
    var id = 0L
    val rows = (0 until 10).flatMap { d =>
      val c = if (d < 5) 2L else 8L
      (0L until c).map { _ => id += 1; (id, day(d), 1L, "view", 1.0) }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.hacMeanCi(spark, dir).collect().head
    assert(r.getLong(0) == 10L && r.getDouble(1) == 5.0, s"mean: $r")
    // positive autocorrelation must inflate the HAC se above naive
    assert(r.getDouble(3) > r.getDouble(2), s"se order: $r")
    assert(r.getDouble(4) < 5.0 && r.getDouble(5) > 5.0, s"ci: $r")
  }

  test("knnHubness: one universal hub maxes k-occurrence") {
    val dir = java.nio.file.Files.createTempDirectory("hub").toString
    // vec 0 is the normalized centroid direction everyone loves;
    // others are axis-aligned across 6 dims with a small shared bias
    val vecs = (0L until 7L).map { i =>
      val v = Array.fill(6)(0.1f)
      if (i > 0) v((i - 1).toInt % 6) = 1.0f
      (i, v, 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Graph.knnHubness(spark, dir, k = 1).collect().head
    // with k = 1 every non-hub's nearest neighbor is vec 0 (cosine
    // to the all-0.1 direction beats any axis sibling)
    assert(r.getLong(0) == 7L && r.getLong(1) == 1L, s"n: $r")
    assert(r.getLong(2) == 6L, s"hub occ: $r")
    assert(r.getDouble(3) > 1.0 && r.getLong(4) == 1L, s"skew: $r")
  }
}
