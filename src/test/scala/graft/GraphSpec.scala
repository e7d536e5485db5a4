package graft

import scala.collection.mutable
import org.apache.spark.sql.functions.col
import graft.operators.Graph

/** In-memory sequential oracle with the reference's semantics
  * (SURVEY §2.7 G9 / `SequentialPersonalizedPageRank.java`): priors at
  * the source, alpha=0.15, teleport + dangling mass all to the source.
  */
object SeqPPR {
  def run(edges: Seq[(Long, Long)], source: Long, iters: Int,
          alpha: Double = 0.15): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val out = edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var r = nodes.map(n => n -> (if (n == source) 1.0 else 0.0)).toMap
    for (_ <- 1 to iters) {
      val recv = mutable.Map[Long, Double]().withDefaultValue(0.0)
      for (n <- nodes; outs <- out.get(n); d <- outs)
        recv(d) += r(n) / outs.size
      val missing = 1.0 - recv.values.sum
      r = nodes.map { n =>
        n -> ((1 - alpha) * recv(n) +
          (if (n == source) alpha + (1 - alpha) * missing else 0.0))
      }.toMap
    }
    r
  }
}

class GraphSpec extends SparkSpec {
  import spark.implicits._

  val smallEdges: Seq[(Long, Long)] =
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (5L, 1L))
  // node 4 is dangling (no out-edges); node 5 has no in-edges

  test("distributed PPR matches sequential oracle on a dangling graph") {
    val edges = smallEdges.toDF("src", "dst")
    val sources = Seq(1L, 4L)
    val ranks = Graph.personalizedPageRank(edges, sources, 10).collect()
    sources.zipWithIndex.foreach { case (src, i) =>
      val oracle = SeqPPR.run(smallEdges, src, 10)
      ranks.foreach { row =>
        val id = row.getLong(0)
        val got = row.getDouble(1 + i)
        assert(math.abs(got - oracle(id)) < 1e-12,
          s"source=$src id=$id got=$got want=${oracle(id)}")
      }
    }
  }

  test("mass conserves: ranks sum to 1 per source") {
    val edges = smallEdges.toDF("src", "dst")
    val ranks = Graph.personalizedPageRank(edges, Seq(1L), 7).collect()
    val total = ranks.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-12)
  }

  test("Gnutella regression: adjacency parse + 3 iterations vs oracle") {
    val path = "/root/reference/data/p2p-Gnutella08-adj.txt"
    assume(new java.io.File(path).exists())
    val edges = Graph.adjacencyEdges(spark, path)
    val local = edges.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(local.nonEmpty)
    val oracle = SeqPPR.run(local, 0L, 3)
    val ranks = Graph.personalizedPageRank(edges, Seq(0L), 3).collect()
    ranks.foreach { row =>
      val id = row.getLong(0)
      assert(math.abs(row.getDouble(1) - oracle(id)) < 1e-12)
    }
  }

  test("connected components match union-find on a multi-component graph") {
    // components: {1,2,3,4,5} (from smallEdges), {10,11}, {20}... node 20
    // can't exist alone (no self-edges) so add 20-21
    val edges = (smallEdges ++ Seq((10L, 11L), (21L, 20L))).toDF("src", "dst")
    val got = Graph.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find oracle
    val all = smallEdges ++ Seq((10L, 11L), (21L, 20L))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    all.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = (all.map(_._1) ++ all.map(_._2)).distinct
    val oracle = nodes.groupBy(find).values
      .map(g => g.toSet -> g.min).toMap
    oracle.foreach { case (members, minId) =>
      members.foreach(m => assert(got(m) == minId,
        s"node $m: got ${got(m)} want $minId"))
    }
  }

  test("topK returns k best per source, sorted") {
    val edges = smallEdges.toDF("src", "dst")
    val ranks = Graph.personalizedPageRank(edges, Seq(1L, 4L), 5)
    val top = Graph.topK(ranks, Seq(1L, 4L), 2).collect()
    assert(top.length == 4)
    val bySource = top.groupBy(_.getLong(0))
    bySource.foreach { case (_, rows) =>
      val rs = rows.map(_.getDouble(2))
      assert(rs.zip(rs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("triangleCensus matches a brute-force enumeration") {
    val got = Graph.triangleCensus(spark, sf).collect()(0)
    // brute force: recompute the thresholded projection in memory
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val co = scala.collection.mutable.Map[(Long, Long), Long]()
    byOrder.values.foreach { ss =>
      for (i <- ss.indices; j <- i + 1 until ss.size if ss(i) != ss(j))
        co((ss(i), ss(j))) = co.getOrElse((ss(i), ss(j)), 0L) + 1
    }
    // interpolated p90 (same formula as Spark percentile / quantile_cont)
    val cs = co.values.toArray.sorted.map(_.toDouble)
    val pos = 0.9 * (cs.length - 1)
    val (lo, f) = (pos.toInt, pos - pos.toInt)
    val thr = if (lo + 1 < cs.length) cs(lo) * (1 - f) + cs(lo + 1) * f
              else cs(lo)
    // .iterator first: collect on a Map producing pairs would rebuild a
    // Map and silently merge edges sharing a first endpoint
    val und = co.iterator.collect { case (p, c) if c >= thr => p }.toSet
    // degree-oriented enumeration, mirroring the operator
    val deg = und.toSeq.flatMap { case (u, v) => Seq(u, v) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ord = Ordering.Tuple2[Long, Long]
    def eta(x: Long) = (deg(x), x)
    val oriented = und.map { case (u, v) =>
      if (ord.lt(eta(u), eta(v))) (u, v) else (v, u) }
    val outAdj = oriented.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val wedges = for {
      (a, ts) <- outAdj.toSeq
      b <- ts; c <- ts if ord.lt(eta(b), eta(c))
    } yield (a, b, c)
    val tris = wedges.count { case (_, b, c) => oriented((b, c)) }
    assert(got.getLong(0) == und.size.toLong)
    assert(got.getLong(1) == wedges.size.toLong)
    assert(got.getLong(2) == tris.toLong)
  }

  test("PPR dangling-free fast path ≡ generic path on the fixture graph") {
    val e = Graph.customerSupplierEdges(spark, sf)
    // precondition the fast path claims: every vertex has out-edges
    val dangling = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .join(e.select(col("src").as("id")).distinct(), Seq("id"), "left_anti")
      .count()
    assert(dangling == 0L, "symmetrized graph must have no dangling nodes")
    def ranksOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val generic = ranksOf(Graph.personalizedPageRank(e, Seq(1L, 2L), 4))
    val fast = ranksOf(Graph.personalizedPageRank(e, Seq(1L, 2L), 4,
      danglingFree = true, checkpointEvery = 4))
    assert(fast.keySet == generic.keySet)
    fast.foreach { case (id, (a0, a1)) =>
      val (b0, b1) = generic(id)
      assert(math.abs(a0 - b0) < 1e-12 && math.abs(a1 - b1) < 1e-12,
        s"rank mismatch at $id")
    }
  }

  test("triangleCensusEdges: degree orientation collapses hub fan-out") {
    // star: hub 0 — leaves 1..50, plus one leaf-leaf edge (1,2) closing
    // a single triangle. Degree orientation points every spoke INTO the
    // hub, so the hub owns no wedges at all: 1 wedge total, where the
    // old id-orientation (hub = smallest id = out-degree 50) enumerated
    // C(50,2) = 1225 — the fan-out bound that keeps a power-law hub's
    // self-join survivable at 100 TB.
    val e = ((1L to 50L).map(i => (0L, i)) :+ (1L, 2L)).toDF("u", "v")
    val got = Graph.triangleCensusEdges(e).collect()(0)
    assert(got.getLong(0) == 51L, "n_edges")
    assert(got.getLong(1) == 1L, s"oriented wedge volume, got ${got.getLong(1)}")
    assert(got.getLong(2) == 1L, "n_triangles")
  }
}
