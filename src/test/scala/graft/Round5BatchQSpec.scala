package graft

import java.sql.Timestamp
import graft.operators.{Curation, Events, Relational}

/** Round-5 batch Q: Ljung–Box whiteness, periodogram, AMS F₂ sketch
  * audit, priority-sampling estimator audit, IPF raking.
  */
class Round5BatchQSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeDaily(dir: String, counts: Seq[Int]): Unit =
    counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 100 + j).toLong, day(d),
        j.toLong, "view", 1.0)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("ljungBox: alternating series — exact integer rho, replicated Q") {
    val dir = java.nio.file.Files.createTempDirectory("lb").toString
    writeDaily(dir, Seq(1, 2, 1, 2, 1, 2)) // z = ±3, A0 = 54
    val rows = Events.ljungBox(spark, dir).collect()
    // lags 6..7 have no pairs on a 6-day series → 5 rows
    assert(rows.length == 5, s"${rows.toSeq}")
    val byLag = rows.map(r => r.getInt(0) -> (r.getDouble(1),
      r.getDouble(2))).toMap
    assert(byLag(1)._1 == q6(-45.0 / 54), s"rho1: ${rows.toSeq}")
    assert(byLag(2)._1 == q6(36.0 / 54), s"rho2: ${rows.toSeq}")
    // replicate the 1e-12-grid cumulative Q
    val (n, a0) = (6.0, 54.0)
    val aks = Seq(-45.0, 36.0, -27.0, 18.0, -9.0)
    var c12 = 0L
    aks.zipWithIndex.foreach { case (ak, i) =>
      val rho = ak / a0
      c12 += math.floor(rho * rho / (n - (i + 1)) * 1e12).toLong
      assert(byLag(i + 1)._2 == q6(n * (n + 2) * (c12.toDouble / 1e12)),
        s"q_stat lag ${i + 1}: ${rows.toSeq}")
    }
  }

  test("periodogramTopk: period-2 square wave dominates at power 9") {
    val dir = java.nio.file.Files.createTempDirectory("pg").toString
    writeDaily(dir, Seq(1, 2, 1, 2, 1, 2))
    val rows = Events.periodogramTopk(spark, dir).collect()
    assert(rows.head.getInt(0) == 2, s"top period: ${rows.toSeq}")
    // C = -18 (z·cos over ±3 with cos ∈ {1,-1}), S quantizes to 0
    assert(rows.head.getDouble(1) == 9.0, s"(18²)/36: ${rows.toSeq}")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("amsF2: md5-coin sketch replicated on a 2-key corpus") {
    val dir = java.nio.file.Files.createTempDirectory("ams").toString
    // orderkey 1 × 3 lines, orderkey 2 × 1 line → F2 = 9 + 1 = 10
    Seq((1L, 1.0, 0.0), (1L, 1.0, 0.0), (1L, 1.0, 0.0), (2L, 1.0, 0.0))
      .toDF("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.amsF2(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 10.0, s"exact: $r")
    def sgn(k: Long, i: Long): Long =
      if ("13579bdf".contains(md5hex(s"$k-$i").last)) -1L else 1L
    val est = (0L until 16L).map { i =>
      val x = sgn(1, i) * 3 + sgn(2, i) * 1; (x * x).toDouble
    }.sum / 16
    assert(r.getDouble(2) == math.floor(est * 1e2 + 0.5) / 1e2, s"est: $r")
    assert(r.getDouble(3) == q6(math.abs(est - 10.0) / 10.0), s"rel: $r")
  }

  test("prioritySample: n <= k census is exact (tau = 0)") {
    val dir = java.nio.file.Files.createTempDirectory("ps").toString
    // 4 orders with revenue 100, 200, 300, 400 → total 1000
    val li = (1 to 4).map(i => (i.toLong, i * 100.0, 0.0))
    li.toDF("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (1 to 4).map(i => (i.toLong, i.toLong * 10))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.prioritySample(spark, dir).collect().head
    assert(r.getLong(0) == 4L, s"n: $r")
    assert(r.getDouble(2) == 1000.0 && r.getDouble(3) == 1000.0,
      s"census: $r")
    assert(r.getDouble(4) == 0.0, s"rel_err: $r")
  }

  test("prioritySample: k=2 threshold estimator replicated") {
    val dir = java.nio.file.Files.createTempDirectory("ps2").toString
    val li = (1 to 6).map(i => (i.toLong, i * 100.0, 0.0))
    li.toDF("l_orderkey", "l_extendedprice", "l_discount")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    (1 to 6).map(i => (i.toLong, i.toLong * 10))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.prioritySample(spark, dir, k = 2).collect().head
    // replicate: w in 1e-4 units, u = (h7+1)/16^7, top-2 + tau = q_(3)
    val w = (1 to 6).map(i => i.toLong -> i * 100.0 * 1e4).toMap
    val q = w.map { case (key, wi) =>
      val h = java.lang.Long.parseLong(md5hex(s"$key").take(7), 16)
      key -> wi / ((h + 1).toDouble / 268435456.0)
    }
    val order = q.toSeq.sortBy { case (key, qi) => (-qi, key) }
    val tau = order(2)._2
    val e2 = order.take(2).map { case (key, _) =>
      math.floor(math.max(w(key), tau) * 1e2 + 0.5).toLong }.sum
    assert(r.getDouble(3) ==
      math.floor(e2.toDouble / 1e2 / 1e4 * 1e2 + 0.5) / 1e2, s"est: $r")
  }

  test("ipfRaking: quantized two-round fold replicated on a 2x2 grid") {
    val dir = java.nio.file.Files.createTempDirectory("ipf").toString
    // counts [[3,1],[2,2]]: rows already on target, columns 5 vs 3
    val docs =
      (1 to 3).map(i => (i.toLong, "t", "en", "s0", 1L)) ++
      Seq((4L, "t", "en", "s1", 1L)) ++
      (5 to 6).map(i => (i.toLong, "t", "de", "s0", 1L)) ++
      (7 to 8).map(i => (i.toLong, "t", "de", "s1", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Curation.ipfRaking(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    // replicate the exact quantized fold
    var w = Map(("en", "s0") -> 3e6, ("en", "s1") -> 1e6,
      ("de", "s0") -> 2e6, ("de", "s1") -> 2e6)
    val (tt, rr, cc) = (8.0, 2L, 2L)
    for (_ <- 1 to 2; axis <- Seq(0, 1)) {
      val cnt = if (axis == 0) rr else cc
      val sums = w.groupBy(_._1.productElement(axis)).view
        .mapValues(_.values.sum).toMap
      w = w.map { case (kk, v) =>
        kk -> math.floor(v * (tt * 1e6 / cnt) /
          sums(kk.productElement(axis)) + 0.5)
      }
    }
    w.foreach { case ((l, s0), v) =>
      assert(got((l, s0)) == q6(v / 1e6), s"cell ($l,$s0): $got vs $w")
    }
    // marginals actually moved toward 4.0 per column
    val colSums = got.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    assert(math.abs(colSums("s0") - 4.0) < 0.05 &&
      math.abs(colSums("s1") - 4.0) < 0.05, s"raked columns: $colSums")
  }
}
