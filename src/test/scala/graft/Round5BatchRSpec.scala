package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph, Relational, Similarity}

/** Round-5 batch R: disparity-filter backbone, weighted quantiles,
  * frequent triples, Hurst R/S, OLS influence, moment-collapsed MMD².
  */
class Round5BatchRSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeDaily(dir: String, counts: Seq[Int]): Unit =
    counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 100 + j).toLong, day(d),
        j.toLong, "view", 1.0)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("graphBackbone: dominant spoke is the only significant edge") {
    val dir = java.nio.file.Files.createTempDirectory("bb").toString
    // customers 1,2,3 → supplier 1 with multiplicities 8,1,1:
    // from the hub, p(edge to c1) = (1 − 0.8)² = 0.04 < α = 0.05
    val lines = Seq.fill(8)((10L, 1L)) ++ Seq((20L, 1L), (30L, 1L))
    lines.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val rows = Graph.graphBackbone(spark, dir).collect()
    assert(rows.length == 1, s"${rows.toSeq}")
    val r = rows.head
    assert(r.getLong(0) == 3L && r.getLong(1) == 1L, s"counts: $r")
    assert(r.getLong(2) == 1L && r.getLong(3) == 1000001L, s"edge: $r")
    assert(r.getDouble(5) == 0.04, s"(1-0.8)^2: $r")
  }

  test("weightedMedian: unit-weight 2-point histogram") {
    val dir = java.nio.file.Files.createTempDirectory("wm").toString
    Seq(("A", 1.0, 1.0), ("A", 2.0, 1.0), ("A", 2.0, 8.0))
      .toDF("l_returnflag", "l_extendedprice", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.weightedMedian(spark, dir).collect().head
    // weights: price 1.00 → 1, price 2.00 → 9; W = 10
    assert(r.getLong(1) == 10L, s"w_total: $r")
    assert(r.getDouble(2) == 2.0, s"p50 lands in the heavy point: $r")
    assert(r.getDouble(3) == 2.0, s"p90: $r")
  }

  test("frequentTriples: only the repeated basket clears minSup") {
    val dir = java.nio.file.Files.createTempDirectory("ft").toString
    val rows = Seq((1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (3L, 2L), (3L, 4L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.frequentTriples(spark, dir).collect()
    assert(got.length == 1, s"${got.toSeq}")
    assert((got.head.getLong(0), got.head.getLong(1),
      got.head.getLong(2), got.head.getLong(3)) == ((1L, 2L, 3L, 2L)),
      s"${got.toSeq}")
  }

  test("hurstRs: replicated integer fold on a 30-day series") {
    val dir = java.nio.file.Files.createTempDirectory("hr").toString
    val counts = (0 until 30).map(d => 10 + (d % 7) + (d / 3))
    writeDaily(dir, counts)
    val got = Events.hurstRs(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    // replicate: per m, full blocks, z = m·y − Σy, R/S on 1e-9 grid
    val pts = Seq(5, 10, 15).map { m =>
      val nb = 30 / m
      val rs9s = (0 until nb).flatMap { b =>
        val ys = counts.slice(b * m, (b + 1) * m).map(_.toLong)
        val sy = ys.sum; val sy2 = ys.map(y => y * y).sum
        val d2 = m * sy2 - sy * sy
        if (d2 <= 0) None else {
          val z = ys.map(y => m * y - sy)
          val cz = z.scanLeft(0L)(_ + _).tail
          val rz = cz.max - cz.min
          Some(math.floor(rz.toDouble / math.sqrt(d2.toDouble) * 1e9
            + 0.5).toLong)
        }
      }
      val rsMean = rs9s.sum.toDouble / rs9s.length / 1e9
      (m.toLong, rs9s.length.toLong, rsMean)
    }
    pts.foreach { case (m, nb, rsMean) =>
      assert(got(m)._1 == nb, s"blocks m=$m: $got")
      assert(got(m)._2 == q6(rsMean), s"rs_mean m=$m: $got")
    }
    // ln-ln slope from the same 1e-9 grids
    val g = pts.map { case (m, _, rs) =>
      (math.floor(math.log(m.toDouble) * 1e9 + 0.5).toLong,
        math.floor(math.log(rs) * 1e9 + 0.5).toLong) }
    val k = BigInt(g.length)
    val (sx, sy) = (BigInt(g.map(_._1).sum), BigInt(g.map(_._2).sum))
    val sxy = g.map { case (x, y) => BigInt(x) * y }.sum
    val sxx = g.map { case (x, _) => BigInt(x) * x }.sum
    val h = (k * sxy - sx * sy).toDouble / (k * sxx - sx * sx).toDouble
    assert(got(5L)._3 == q6(h), s"hurst: $got vs $h")
  }

  test("olsInfluence: the outlier day tops Cook's D with exact leverage") {
    val dir = java.nio.file.Files.createTempDirectory("oi").toString
    writeDaily(dir, Seq.fill(9)(10) ++ Seq(30))
    val rows = Events.olsInfluence(spark, dir).collect()
    assert(rows.head.getLong(0) == 9L, s"outlier day first: ${rows.toSeq}")
    // n=10: h_9 = 1/10 + (10·9−45)²/(10·(10·285−45²)) = 0.1 + 2025/8250
    assert(rows.head.getDouble(3) == q6(0.1 + 2025.0 / 8250),
      s"leverage: ${rows.toSeq}")
  }

  test("mmdPoly: constant halves collapse to closed-form 1.125") {
    val dir = java.nio.file.Files.createTempDirectory("mmd").toString
    // ids 1..7 hash to half b, 8..10 to half a (verified offline)
    val vecs = (8L to 10L).map(i => (i, Seq(0.5f, 0.0f), 0)) ++
      (1L to 7L).map(i => (i, Seq(0.0f, 0.5f), 0))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.mmdPoly(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 7L, s"halves: $r")
    // M_A = diag(0.25,0), M_B = diag(0,0.25): fro = 2·0.0625 = 0.125
    // mean gap = 2·(0.25 + 0.25) = 1.0 → mmd² = 1.125
    assert(r.getDouble(2) == 0.125 && r.getDouble(3) == 1.0 &&
      r.getDouble(4) == 1.125, s"mmd parts: $r")
  }
}
