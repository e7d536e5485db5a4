package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph, Relational}

/** Round-5 batch X: Allan variance, turning points, jackknife ratio
  * SE, variogram, post-stratification, brand homophily, price
  * elasticity, inequality indices.
  */
class Round5BatchXSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = new Timestamp(1704067200000L + h * 3600000L)
  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6

  private def writeDaily(dir: String, counts: Seq[Int]): Unit =
    counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(j => ((d * 1000 + j).toLong, day(d),
        j.toLong, "view", 1.0)) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("allanVariance: alternating series — white at tau 1, flat at tau 2") {
    val dir = java.nio.file.Files.createTempDirectory("av").toString
    writeDaily(dir, Seq(1, 3, 1, 3, 1, 3))
    val rs = Events.allanVariance(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(rs(1L) == ((6L, 2.0, q6(math.sqrt(2)))), s"t1: $rs")
    assert(rs(2L) == ((3L, 0.0, 0.0)), s"t2: $rs")
    assert(!rs.contains(4L), s"single-block tau dropped: $rs")
  }

  test("turningPoints: sawtooth — every interior point an extremum") {
    val dir = java.nio.file.Files.createTempDirectory("tp").toString
    writeDaily(dir, Seq(1, 3, 1, 3, 1))
    val r = Events.turningPoints(spark, dir).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L, s"T: $r")
    assert(r.getDouble(2) == 2.0, s"E: $r")
    assert(r.getDouble(3) == q6(1.0 / math.sqrt(51.0 / 90)), s"z: $r")
    assert(r.getLong(4) == 0L, s"flag: $r")
  }

  test("jackknifeRatio: constant per-day ratio — zero jackknife SE") {
    val dir = java.nio.file.Files.createTempDirectory("jk").toString
    Seq((1L, day(0), 1L, "view", 1.0), (2L, day(0), 1L, "view", 3.0),
        (3L, day(1), 1L, "view", 2.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.jackknifeRatio(spark, dir).collect().head
    assert(r.getLong(0) == 2L, s"n: $r")
    assert(r.getDouble(1) == 2.0 && r.getDouble(2) == 0.0, s"se: $r")
    assert(r.getDouble(3) == 2.0 && r.getDouble(4) == 2.0, s"ci: $r")
  }

  test("variogram: period-2 series — gamma alternates 2, 0") {
    val dir = java.nio.file.Files.createTempDirectory("vg").toString
    writeDaily(dir, Seq(1, 3, 1, 3))
    val rs = Events.variogram(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rs(1) == ((3L, 2.0)), s"lag1: $rs")
    assert(rs(2) == ((2L, 0.0)), s"lag2: $rs")
    assert(rs(3) == ((1L, 2.0)), s"lag3: $rs")
  }

  test("postStratify: uniform-hour reweighting moves the estimate") {
    val dir = java.nio.file.Files.createTempDirectory("ps").toString
    // hour 0: 1/2 purchase; hour 1: 1/4 purchase
    (Seq((1L, ts(0), 1L, "purchase", 1.0), (2L, ts(0), 2L, "view", 1.0)) ++
      Seq((3L, ts(1), 3L, "purchase", 1.0)) ++
      (4 to 6).map(i => (i.toLong, ts(1), i.toLong, "view", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.postStratify(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L, s"strata: $r")
    assert(r.getDouble(2) == q6(2.0 / 6), s"raw: $r")
    assert(r.getDouble(3) == 0.375, s"post: $r")
    assert(r.getDouble(4) == q6(0.375 - 2.0 / 6), s"shift: $r")
  }

  test("homophilyBrand: two same-brand cliques, one cross edge") {
    val dir = java.nio.file.Files.createTempDirectory("hb").toString
    val orders = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L),
      (3L, 3L), (3L, 4L), (4L, 3L), (4L, 4L),
      (5L, 1L), (5L, 3L), (6L, 1L), (6L, 3L))
    orders.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"))
      .toDF("p_partkey", "p_brand")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = Graph.homophilyBrand(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 6L, s"m: $r")
    assert(r.getDouble(2) == q6(4.0 / 6), s"same: $r")
    // r = (6*4 - 18)/(36 - 18) = 1/3
    assert(r.getDouble(3) == q6(1.0 / 3), s"assort: $r")
  }

  test("priceElasticity: halved demand at doubled price — slope -1") {
    val dir = java.nio.file.Files.createTempDirectory("pe").toString
    (Seq.fill(1)((1L, 1L, 100.0)) ++ Seq((2L, 2L, 50.0)))
      .toDF("l_orderkey", "l_partkey", "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    Seq((1L, 1.0), (2L, 2.0))
      .toDF("p_partkey", "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")
    val r = Relational.priceElasticity(spark, dir).collect().head
    assert(r.getLong(0) == 2L, s"n: $r")
    assert(r.getDouble(1) == -1.0, s"elasticity: $r")
    assert(r.getDouble(3) == 1.0, s"r2: $r")
  }

  test("inequalityIndices: equal spend — every index exactly zero") {
    val dir = java.nio.file.Files.createTempDirectory("iq").toString
    Seq((1L, 1L, 10.0), (2L, 2L, 10.0), (3L, 3L, 10.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.inequalityIndices(spark, dir).collect().head
    assert(r.getLong(0) == 3L && r.getLong(1) == 0L, s"n: $r")
    assert(r.getDouble(2) == 0.0 && r.getDouble(3) == 0.0 &&
      r.getDouble(4) == 0.0, s"indices: $r")
  }
}
