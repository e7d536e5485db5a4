package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph, Relational, TextStats}

/** Round-5 batch W: Gumbel EVT, 1-D DBSCAN, Nelson–Aalen, dispersion
  * test, VoteRank, Burt constraint, RBO stability, association rules.
  */
class Round5BatchWSpec extends SparkSpec {
  import spark.implicits._

  private def at(sec: Long) = new Timestamp(1704067200000L + sec * 1000L)
  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
  private def q4(x: Double) = math.floor(x * 1e4 + 0.5) / 1e4

  test("evtGumbel: two block maxima — moments in closed form") {
    val dir = java.nio.file.Files.createTempDirectory("gb").toString
    Seq((1L, day(0), 1L, "view", 1.0), (2L, day(0), 1L, "view", 0.5),
        (3L, day(1), 1L, "view", 3.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.evtGumbel(spark, dir).collect().head
    val c = math.sqrt(6.0) / math.Pi
    val sd = math.sqrt((2.0 * 10e12 - 16e12) / 2) / 1e6
    val beta = sd * c
    val mu = 2.0 - 0.5772156649015329 * beta
    val y30 = -math.log(-math.log(1 - 1.0 / 30))
    assert(r.getLong(0) == 2L, s"n: $r")
    assert(r.getDouble(1) == q6(mu) && r.getDouble(2) == q6(beta),
      s"fit: $r")
    assert(r.getDouble(3) == q4(mu + beta * y30), s"rl30: $r")
  }

  test("dbscan1d: core chain, one border, one noise point") {
    val dir = java.nio.file.Files.createTempDirectory("db").toString
    Seq(0L, 600L, 1200L, 2500L, 10000L).zipWithIndex
      .map { case (sec, i) => (i.toLong, at(sec), 1L, "view", 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.dbscan1d(spark, dir).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 3L, s"n/core: $r")
    assert(r.getLong(2) == 1L && r.getLong(3) == 1L, s"border/noise: $r")
    assert(r.getLong(4) == 1L, s"clusters: $r")
  }

  test("nelsonAalen: two conversions out of three at risk") {
    val dir = java.nio.file.Files.createTempDirectory("na").toString
    Seq((1L, day(0), 1L, "signup", 1.0), (2L, day(2), 1L, "purchase", 1.0),
        (3L, day(0), 2L, "view", 1.0), (4L, day(4), 2L, "view", 1.0),
        (5L, day(0), 3L, "signup", 1.0), (6L, day(2), 3L, "purchase", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rs = Events.nelsonAalen(spark, dir).collect()
    assert(rs.length == 1, s"rows: ${rs.mkString(";")}")
    val r = rs.head
    val h9 = math.floor(2.0 / 3 * 1e9 + 0.5).toLong
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L &&
      r.getLong(2) == 2L, s"risk: $r")
    assert(r.getLong(3) == h9, s"hc9: $r")
    assert(r.getDouble(4) == q6(h9 / 1e9), s"H: $r")
  }

  test("dispersionTest: two-day Poisson-like series — VMR 1, not flagged") {
    val dir = java.nio.file.Files.createTempDirectory("dp").toString
    (0 until 1).flatMap(_ => Seq(
      (1L, day(0), 1L, "view", 1.0), (2L, day(1), 1L, "view", 1.0),
      (3L, day(1), 2L, "view", 1.0), (4L, day(1), 3L, "view", 1.0)))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.dispersionTest(spark, dir).collect().head
    assert(r.getLong(1) == 2L, s"n: $r")
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 1.0, s"vmr: $r")
    assert(r.getDouble(4) == 1.0 && r.getLong(5) == 0L, s"chi2: $r")
  }

  test("voteRank: seed suppression pushes round 2 off the hub cluster") {
    val dir = java.nio.file.Files.createTempDirectory("vr").toString
    Seq((1L, 1L), (2L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 1L), (1L, 2L), (2L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rs = Graph.voteRank(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rs(1L) == ((1L, 2.0)), s"r1: $rs")
    assert(rs(2L) == ((1000002L, 1.0)), s"r2: $rs")
    assert(rs(3L) == ((2L, 0.0)), s"r3: $rs")
  }

  test("burtConstraint: K4 co-purchase clique — closed-form constraint") {
    val dir = java.nio.file.Files.createTempDirectory("bc").toString
    (1 to 2).flatMap(ok => (1 to 4).map(pk => (ok.toLong, pk.toLong)))
      .toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rs = Graph.burtConstraint(spark, dir).collect()
    assert(rs.length == 4, s"rows: ${rs.mkString(";")}")
    val p9 = math.floor(1e9 / 3 + 0.5).toLong +
      2 * math.floor(1e9 / 9 + 0.5).toLong
    val c9 = math.floor((p9 / 1e9) * (p9 / 1e9) * 1e9 + 0.5).toLong
    val expect = q6(3 * c9 / 1e9)
    assert(rs.forall(r => r.getLong(1) == 3L &&
      r.getDouble(2) == expect), s"constraint: ${rs.mkString(";")}")
  }

  test("rboStability: one shared top term — geometric depth weights") {
    val dir = java.nio.file.Files.createTempDirectory("rb").toString
    Seq((2L, "x y", "en", "s", 3L), (3L, "x z", "en", "s", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.rboStability(spark, dir).collect().head
    val rbo9 = (1 to 20).map(d =>
      math.floor(0.1 * math.pow(0.9, d - 1) * (1.0 / d) * 1e9 + 0.5)
        .toLong).sum
    assert(r.getLong(0) == 20L && r.getLong(1) == 1L, s"overlap: $r")
    assert(r.getDouble(2) == q6(rbo9 / 1e9), s"rbo: $r")
  }

  test("assocRules: asymmetric confidence, conviction guard at 1.0") {
    val dir = java.nio.file.Files.createTempDirectory("ar").toString
    val rows = (1 to 6).flatMap(ok =>
      Seq((ok.toLong, 1L), (ok.toLong, 2L))) ++
      Seq((7L, 1L), (8L, 1L))
    rows.toDF("l_orderkey", "l_partkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = Relational.assocRules(spark, dir).collect()
    assert(out.length == 2, s"rows: ${out.mkString(";")}")
    val first = out.head // B->A: conf 1, conviction undefined
    assert(first.getLong(0) == 2L && first.getLong(1) == 1L)
    assert(first.getDouble(3) == 1.0 && first.getLong(6) == 0L, s"$first")
    val second = out(1) // A->B: conf .75, conviction exactly 1
    assert(second.getDouble(3) == 0.75 && second.getDouble(4) == 1.0 &&
      second.getDouble(5) == 0.0 && second.getDouble(7) == 1.0,
      s"$second")
  }
}
