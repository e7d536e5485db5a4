package graft

import graft.operators.{Dedup, Graph, Similarity, TextStats}

/** Round-5 batch AI: source duplication matrix, average neighbor
  * degree, TwoNN intrinsic dimension, rarefaction curve.
  */
class Round5BatchAISpec extends SparkSpec {
  import spark.implicits._

  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("dedupSourceMatrix: cross-source syndication shows up as a cell") {
    val dir = java.nio.file.Files.createTempDirectory("dsm").toString
    val rep = "alpha beta gamma delta epsilon zeta eta theta"
    Seq((1L, rep, "sA"), (2L, rep, "sB"),
      (3L, "unrelated totally different words here", "sA"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = Dedup.dedupSourceMatrix(spark, dir).collect()
    assert(r.length == 1, s"cells: ${r.mkString(",")}")
    assert(r.head.getString(0) == "sA" && r.head.getString(1) == "sB",
      s"pair: ${r.head}")
    assert(r.head.getLong(2) == 1L && r.head.getLong(3) == 0L &&
      r.head.getDouble(4) == 1.0, s"cell: ${r.head}")
  }

  test("avgNeighborDegree: star — leaves see the hub, hub sees leaves") {
    val dir = java.nio.file.Files.createTempDirectory("and").toString
    Seq((1L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    (1L to 4L).map(sup => (1L, sup)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.avgNeighborDegree(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // bucket 1 (the four leaves): each sees the degree-4 hub
    assert(got(1L) == ((4L, 4.0)), s"leaves: $got")
    // bucket 4 (the hub): sees four degree-1 leaves
    assert(got(4L) == ((4L, 1.0)), s"hub: $got")
  }

  test("intrinsicDimension: 1-d curve of embeddings reads LOW") {
    val dir = java.nio.file.Files.createTempDirectory("twonn").toString
    // points on a 1-d curve with IRREGULAR spacing (TwoNN needs
    // random-like spacings: on a regular grid both neighbors sit at
    // the same distance, μ → 1 and the estimator diverges)
    val gaps = Seq(1, 3, 2, 7, 4, 2, 9, 5, 3, 8, 1, 6, 4, 2, 7, 3, 9,
      2, 5, 4, 6, 1, 8)
    val ts = gaps.scanLeft(0.0)((acc, g) => acc + g / 500.0)
    val vecs = ts.zipWithIndex.map { case (t, i) =>
      (i.toLong, Array(math.cos(t).toFloat, math.sin(t).toFloat,
        0.5f, 0.5f), 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.intrinsicDimension(spark, dir).collect().head
    assert(r.getLong(0) == 24L && r.getLong(1) == 0L, s"n: $r")
    // cosine distance ≈ arc²/3 on this curve (a metric-squared), so
    // the 1-d manifold reads ≈ 0.5; anything ≪ the ambient 4 is the
    // signal being tested
    assert(r.getDouble(3) > 0.1 && r.getDouble(3) < 3.0, s"id: $r")
  }

  test("rarefactionCurve: all-hapax corpus follows 1-(1-f) exactly") {
    val dir = java.nio.file.Files.createTempDirectory("rf").toString
    // 8 distinct tokens once each: E[V_f] = V·(1-(1-f)^1) = V·f
    Seq((1L, "a b c d e f g h", "en", "s", 15L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextStats.rarefactionCurve(spark, dir).collect()
      .map(r => r.getDouble(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    for (f <- Seq(0.1, 0.25, 0.5, 0.75, 0.9)) {
      val t9 = math.floor((1.0 - math.exp(1.0 * math.log(1.0 - f)))
        * 1e9 + 0.5)
      val ev = q(8 * t9 / 1e9, 2)
      assert(got(f)._1 == ev, s"f=$f: ${got(f)} want $ev")
      assert(got(f)._2 == q(8 * t9 / 1e9 / 8.0, 6), s"share f=$f")
    }
  }
}
