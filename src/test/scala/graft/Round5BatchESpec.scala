package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Events, Ml, Relational}

/** Round-5 batch E: sequential patterns, FS-EM, target encoding,
  * Simpson audit, Brier decomposition.
  */
class Round5BatchESpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("seqPatterns: greedy chain counts non-contiguous subsequences") {
    val dir = java.nio.file.Files.createTempDirectory("seqp").toString
    // user 1: a b c — supports (a,b,c) and every sub-alphabet chain
    // user 2: b a b — (b,a,b) needs the SECOND b; greedy must find it
    Seq(
      (0L, ts(0), 1L, "a", 0.0), (1L, ts(1), 1L, "b", 0.0),
      (2L, ts(2), 1L, "c", 0.0),
      (3L, ts(0), 2L, "b", 0.0), (4L, ts(1), 2L, "a", 0.0),
      (5L, ts(2), 2L, "b", 0.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sup = Events.seqPatterns(spark, dir, k = 100).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(sup(("a", "b", "c")) == 1L, s"got $sup")
    assert(sup(("b", "a", "b")) == 1L)
    assert(!sup.contains(("c", "b", "a")))   // c first blocks nothing else
    assert(!sup.contains(("a", "b", "a")))   // no a after user 1's b
  }

  test("seqPatterns: support monotone — a,b,c pattern ≤ its a,b prefix pairs") {
    val sup = Events.seqPatterns(spark, sf, k = 1000).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        r.getLong(3)).toMap
    assert(sup.nonEmpty && sup.size <= 125)
    // anti-monotone support: (a,b,c) can't beat the pair support of
    // (a,b) — users where some b follows the first a (greedy pair)
    val pairSup = {
      val ev = Tables.events(spark, sf)
        .select(col("user_id").as("u"), col("event_type").as("ty"),
          (unix_timestamp(col("ts")) * lit(1048576L) + col("event_id"))
            .as("t"))
      val first = ev.groupBy("u", "ty").agg(min(col("t")).as("t1"))
        .select(col("u"), col("ty").as("a"), col("t1"))
      ev.join(first, "u").filter(col("t") > col("t1"))
        .select(col("a"), col("ty").as("b"), col("u")).distinct()
        .groupBy("a", "b").agg(count(lit(1)).as("s")).collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
    }
    sup.foreach { case ((a, b, _), v) =>
      assert(v <= pairSup((a, b)), s"($a,$b,*) support $v")
    }
    // and every support is ≤ the number of users
    val users = Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(sup.values.forall(v => v >= 1 && v <= users))
  }

  test("fsEmWeights: EM separates m from u and matches in-memory EM") {
    // replicate: pattern counts via the same blocked join, then the
    // identical quantized EM in plain Scala
    val p = Tables.part(spark, sf).select(
      col("p_partkey").as("k"),
      element_at(split(col("p_name"), " "), 1).as("adj"),
      element_at(split(col("p_name"), " "), -1).as("noun"),
      col("p_brand").as("b"), col("p_type").as("t"),
      floor(col("p_size") / 5).cast("long").as("band"))
    val a = p.select(col("k").as("k1"), col("adj").as("adj1"),
      col("noun"), col("b").as("b1"), col("t").as("t1"), col("band"))
    val bb = p.select(col("k").as("k2"), col("adj").as("adj2"),
      col("noun"), col("b").as("b2"), col("t").as("t2"), col("band"))
    val counts = a.join(bb, Seq("noun", "band"))
      .filter(col("k1") < col("k2"))
      .select(((col("b1") === col("b2")).cast("long") * 4 +
        (col("t1") === col("t2")).cast("long") * 2 +
        (col("adj1") === col("adj2")).cast("long")).as("g"))
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
    val n = (0 until 8).map(g => counts.getOrElse(g, 0L))
    def em(p0: Double, m0: Array[Double], u0: Array[Double]) = {
      val wq = (0 until 8).map { g =>
        val bits = Array((g >> 2) & 1, (g >> 1) & 1, g & 1)
        def lik(v: Array[Double]) =
          (if (bits(0) == 1) v(0) else 1.0 - v(0)) *
            (if (bits(1) == 1) v(1) else 1.0 - v(1)) *
            (if (bits(2) == 1) v(2) else 1.0 - v(2))
        val pm = p0 * lik(m0); val pu = (1.0 - p0) * lik(u0)
        math.floor(pm / (pm + pu) * 1e9 + 0.5).toLong
      }
      val nn = n.sum
      val sw = (0 until 8).map(g => BigInt(n(g)) * wq(g)).sum
      val su = (0 until 8).map(g => BigInt(n(g)) * (1000000000L - wq(g))).sum
      def bitSum(j: Int, w: Int => Long) = (0 until 8)
        .filter(g => ((g >> (2 - j)) & 1) == 1)
        .map(g => BigInt(n(g)) * w(g)).sum
      val m = Array.tabulate(3)(j =>
        bitSum(j, wq).toDouble / sw.toDouble)
      val u = Array.tabulate(3)(j =>
        bitSum(j, g => 1000000000L - wq(g)).toDouble / su.toDouble)
      (sw.toDouble / (nn.toDouble * 1e9), m, u, nn)
    }
    val (p1, m1, u1, _) = em(0.1, Array(0.9, 0.9, 0.9),
      Array(0.1, 0.1, 0.1))
    val (p2, m2, u2, nn) = em(p1, m1, u1)
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val r = Dedup.fsEmWeights(spark, sf).collect().head
    assert(r.getLong(0) == nn)
    assert(r.getDouble(1) == q6(p2), s"p ${r.getDouble(1)} vs ${q6(p2)}")
    assert(r.getDouble(2) == q6(m2(0)) && r.getDouble(3) == q6(m2(1))
      && r.getDouble(4) == q6(m2(2)))
    assert(r.getDouble(5) == q6(u2(0)) && r.getDouble(6) == q6(u2(1))
      && r.getDouble(7) == q6(u2(2)))
    // the point of EM: matches agree more than non-matches, per field
    assert(r.getDouble(2) > r.getDouble(5))
  }

  test("targetEncode: shrinkage sits between prior and raw mean") {
    val rows = Relational.targetEncode(spark, sf).collect()
    assert(rows.nonEmpty)
    // global prior from the same exact stats
    val pr = Tables.orders(spark, sf)
      .agg((sum(floor(col("o_totalprice") * lit(1e6) + lit(0.5))
        .cast("decimal(38,0)")).cast("double") / lit(1e6) /
        count(lit(1))).as("prior")).collect().head.getDouble(0)
    rows.foreach { r =>
      val (mean, enc) = (r.getDouble(2), r.getDouble(3))
      val lo = math.min(mean, pr) - 1e-6
      val hi = math.max(mean, pr) + 1e-6
      assert(enc >= lo && enc <= hi, s"$enc outside [$lo,$hi]")
    }
  }

  test("targetEncode: hand-built two-segment fixture") {
    val dir = java.nio.file.Files.createTempDirectory("tenc").toString
    // segment X: orders 100, 200; segment Y: one order 1000.
    // prior = 1300/3; m = 20
    Seq((1L, 1L, 100.0), (2L, 1L, 200.0), (3L, 2L, 1000.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, "X"), (2L, "Y")).toDF("c_custkey", "c_mktsegment")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = Relational.targetEncode(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val prior = 1300.0 / 3.0
    assert(got("X") == ((2L, 150.0,
      q6((300.0 + 20.0 * prior) / 22.0))), s"got $got")
    assert(got("Y") == ((1L, 1000.0,
      q6((1000.0 + 20.0 * prior) / 21.0))))
  }

  test("simpsonAudit: planted reversal flips both strata") {
    val dir = java.nio.file.Files.createTempDirectory("simp").toString
    // within-stratum slope +1; across strata high-x pairs with low y
    Seq(("A", 1.0, 10.0), ("A", 2.0, 11.0),
      ("B", 11.0, 0.0), ("B", 12.0, 1.0))
      .toDF("l_returnflag", "l_discount", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.simpsonAudit(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getLong(4))).toMap
    assert(got("A") == ((1.0, got("A")._2, 1L)), s"got $got")
    assert(got("B")._1 == 1.0 && got("B")._3 == 1L)
    assert(got("A")._2 < 0) // pooled slope negative
  }

  test("brierDecomp: components reconstruct the score within binning error") {
    val r = Ml.brierDecomp(spark, sf).collect().head
    val (n, brier, rel, res, unc) = (r.getLong(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(n == Ml.applyQuery(spark, sf).count())
    assert(brier >= 0 && rel >= 0 && res >= 0 && unc >= 0 && unc <= 0.25)
    // Murphy: brier = rel − res + unc up to within-bin p variance
    assert(math.abs(brier - (rel - res + unc)) < 0.02,
      s"brier $brier vs ${rel - res + unc}")
    // resolution can't exceed uncertainty
    assert(res <= unc + 1e-6)
  }
}
