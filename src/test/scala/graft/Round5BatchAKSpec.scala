package graft

import java.sql.Date
import graft.operators.{Relational, Similarity}

/** Round-5 batch AK: perfect-order rate, embedding
  * alignment/uniformity.
  */
class Round5BatchAKSpec extends SparkSpec {
  import spark.implicits._

  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("perfectOrderRate: the worst line decides the order") {
    val dir = java.nio.file.Files.createTempDirectory("po").toString
    Seq((1L, Date.valueOf("2024-01-01")),
      (2L, Date.valueOf("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // order 1: leads 5 and 10 (perfect); order 2: leads 5 and 40
    Seq((1L, Date.valueOf("2024-01-06")),
      (1L, Date.valueOf("2024-01-11")),
      (2L, Date.valueOf("2024-01-06")),
      (2L, Date.valueOf("2024-02-10")))
      .toDF("l_orderkey", "l_shipdate")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.perfectOrderRate(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getDouble(1) == 0.5, s"share: $r")
    assert(r.getDouble(2) == q((5 + 10 + 5 + 40) / 4.0, 4), s"mean: $r")
    assert(r.getLong(3) == 40L, s"p95: $r")
  }

  test("embeddingAlignment: tight classes align, spread uniformity") {
    val dir = java.nio.file.Files.createTempDirectory("ea").toString
    // two orthogonal classes, identical within class: alignment = 0
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f, 0f), 0), (1L, Array(1f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 1f, 0f, 0f), 1), (3L, Array(0f, 1f, 0f, 0f), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.embeddingAlignment(spark, dir).collect().head
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L, s"n: $r")
    assert(r.getDouble(2) == 0.0, s"alignment: $r")
    // uniformity: 2 pairs at d=0 (term 1e9) and 4 cross pairs at
    // d=1 (term = grid of e^-4)
    val t0 = 1000000000L
    val t1 = math.floor(math.exp(-4.0) * 1e9 + 0.5).toLong
    val want = q(math.log((2 * t0 + 4 * t1) / (6.0 * 1e9)), 6)
    assert(r.getDouble(3) == want, s"uniformity: $r want $want")
  }
}
