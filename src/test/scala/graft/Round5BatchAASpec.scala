package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph, TextStats}

/** Round-5 batch AA: eigenvector centrality, Louvain move gains,
  * resource-allocation link prediction, Cochran's Q, seasonal
  * Mann–Kendall, Durbin–Watson. Replicas recompute the exact-integer
  * chains in-process (BigInt); graph fixtures build the
  * customer⇄supplier projection from tiny orders/lineitem tables.
  */
class Round5BatchAASpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  /** Write orders+lineitem so customer c buys from suppliers ss
    * (order key = 10·c + index, one line per supplier). */
  private def writeGraph(dir: String,
                         adj: Seq[(Long, Seq[Long])]): Unit = {
    val orders = adj.zipWithIndex.map { case ((c, _), i) =>
      (i.toLong + 1, c) }
    orders.toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val lines = adj.zipWithIndex.flatMap { case ((_, ss), i) =>
      ss.map(sup => (i.toLong + 1, sup)) }
    lines.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
  }

  test("eigenvectorCentrality: matches the BigInt walk-count replica") {
    val dir = java.nio.file.Files.createTempDirectory("ec").toString
    // c1–{s1,s2}, c2–{s1}: s1 (node 1000001) is the hub
    writeGraph(dir, Seq((1L, Seq(1L, 2L)), (2L, Seq(1L))))
    // symmetric adjacency on ids 1, 2, 1000001, 1000002
    val nbrs = Map(
      1L -> Seq(1000001L, 1000002L), 2L -> Seq(1000001L),
      1000001L -> Seq(1L, 2L), 1000002L -> Seq(1L))
    var w = nbrs.keys.map(_ -> BigInt(1)).toMap
    for (_ <- 1 to 6)
      w = nbrs.map { case (id, ns) => id -> ns.map(w).sum }
    val sw = w.values.sum
    val want = w.map { case (id, v) =>
      id -> q(v.toDouble / sw.toDouble, 9) }
    val got = Graph.eigenvectorCentrality(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == want, s"ec: got $got want $want")
  }

  test("louvainMoveGains: hub pair claims the largest exact gain") {
    val dir = java.nio.file.Files.createTempDirectory("lv").toString
    // c1 buys twice from s1 (weight 2), once from s2; c2 once from s1
    writeGraph(dir, Seq((1L, Seq(1L, 1L, 2L)), (2L, Seq(1L))))
    // weighted degrees: c1=3, c2=1, s1=3, s2=1; m2=8
    // num(i→j) = m2·w − k_i·k_j: c1→s1: 16−9=7, c1→s2: 8−3=5,
    // c2→s1: 8−3=5, s1→c1: 7, s1→c2: 5, s2→c1: 5
    val r = Graph.louvainMoveGains(spark, dir).collect()
    assert(r.head.getLong(0) == 4L, s"n_nodes: ${r.head}")
    assert(r.head.getLong(1) == 4L, s"n_moved: ${r.head}")
    // total gain = 2·(7+5+5+7)/64 = 48/64 ... per-node best sums
    assert(r.head.getDouble(2) == q(2.0 * 24 / 64.0, 9),
      s"total: ${r.head}")
    val best = r.map(x => x.getLong(3) -> (x.getLong(4), x.getDouble(5)))
      .toMap
    assert(best(1L) == ((1000001L, q(2.0 * 7 / 64.0, 9))), s"c1: $best")
    assert(best(1000001L) == ((1L, q(2.0 * 7 / 64.0, 9))), s"s1: $best")
    assert(best(2L) == ((1000001L, q(2.0 * 5 / 64.0, 9))), s"c2: $best")
  }

  test("resourceAllocation: integer 1e9 div deg wedge weights") {
    val dir = java.nio.file.Files.createTempDirectory("ra").toString
    // c1–{s1,s2} (deg 2), c2–{s1,s2,s3} (deg 3)
    writeGraph(dir, Seq((1L, Seq(1L, 2L)), (2L, Seq(1L, 2L, 3L))))
    val got = Graph.resourceAllocation(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val s = 1000000L
    assert(got((s + 1, s + 2)) == ((2L, 500000000L + 333333333L)),
      s"s1s2: $got")
    assert(got((s + 1, s + 3)) == ((1L, 333333333L)), s"s1s3: $got")
    assert(got((s + 2, s + 3)) == ((1L, 333333333L)), s"s2s3: $got")
  }

  test("cochransQ: detector disagreement matches the exact formula") {
    val dir = java.nio.file.Files.createTempDirectory("cq").toString
    val long200 = "x" * 200
    // (d1 long, d2 digit, d3 ' the ')
    val docs = Seq(
      (1L, long200 + " has the 9 marker", "s"),   // 1,1,1
      (2L, long200 + " plain filler text", "s"),  // 1,0,0
      (3L, "short 7 digits", "s"),                // 0,1,0
      (4L, "just the word", "s"),                 // 0,0,1
      (5L, "nothing here", "s"))                  // 0,0,0
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // C = (2,2,2), N=6, R = (3,1,1,1,0) → ΣR²=12
    // Q = 2(3·12 − 36)/(18 − 12) = 0
    val r = TextStats.cochransQ(spark, dir).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 2L &&
      r.getLong(2) == 2L && r.getLong(3) == 2L, s"counts: $r")
    assert(r.getDouble(4) == 0.0 && r.getLong(5) == 0L, s"q: $r")
  }

  test("cochransQ: one dominant detector rejects") {
    val dir = java.nio.file.Files.createTempDirectory("cq2").toString
    val long200 = "x" * 200
    // 12 docs: d1 fires on all, d2/d3 never → C=(12,0,0), R_i=1 ∀i
    val docs = (1L to 12L).map(i => (i, long200, "s"))
    docs.map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Q = 2(3·144 − 144)/(3·12 − 12) = 2·288/24 = 24
    val r = TextStats.cochransQ(spark, dir).collect().head
    assert(r.getDouble(4) == 24.0 && r.getLong(5) == 1L, s"q: $r")
  }

  test("seasonalMannKendall: one rising season, 23 flat ones") {
    val dir = java.nio.file.Files.createTempDirectory("smk").toString
    // hour 0 of day d carries d+1 events, days 0..4
    var id = 0L
    val rows = (0 until 5).flatMap(d => (0 to d).map { j =>
      id += 1; (id, day(d), j.toLong, "view", 1.0) })
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // S = C(5,2) = 10 in hour 0, 0 elsewhere; ties: 23 seasons all-0
    // (t=5 → 300 each); var18 = 24·5·4·15 − 6900 = 300
    val z = q(9.0 / math.sqrt(300.0 / 18.0), 6)
    val r = Events.seasonalMannKendall(spark, dir).collect().head
    assert(r.getLong(0) == 5L && r.getLong(1) == 24L, s"n: $r")
    assert(r.getLong(2) == 10L && r.getDouble(3) == z, s"s,z: $r")
    assert(r.getLong(4) == (if (math.abs(z) > 1.959964) 1L else 0L),
      s"flag: $r")
  }

  test("durbinWatson: constant series reads 2.0, alternating rejects") {
    val cdir = java.nio.file.Files.createTempDirectory("dwc").toString
    var id = 0L
    (0 until 6).flatMap(d => (0 until 2).map { _ =>
      id += 1; (id, day(d), 1L, "view", 1.0) })
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$cdir/events.parquet")
    val rc = Events.durbinWatson(spark, cdir).collect().head
    assert(rc.getDouble(1) == 2.0 && rc.getLong(2) == 0L &&
      rc.getLong(3) == 0L, s"const: $rc")
    val adir = java.nio.file.Files.createTempDirectory("dwa").toString
    id = 0L
    (0 until 6).flatMap(d => (0 until (if (d % 2 == 0) 1 else 3)).map {
      _ => id += 1; (id, day(d), 1L, "view", 1.0) })
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$adir/events.parquet")
    // y = 1,3,1,3,1,3: n·Σ∆² / (n·Σy² − S²) = 6·20/36
    val ra = Events.durbinWatson(spark, adir).collect().head
    assert(ra.getDouble(1) == q(120.0 / 36.0, 6) &&
      ra.getLong(3) == 1L, s"alt: $ra")
  }
}
