package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identical=1, orthogonal=0, opposite=-1") {
    val df = Seq(
      (Seq(1f, 0f), Seq(1f, 0f)),
      (Seq(1f, 0f), Seq(0f, 1f)),
      (Seq(1f, 0f), Seq(-1f, 0f))
    ).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b")).collect()
      .map(_.getDouble(0))
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("fused cosine Expression is bit-identical to the built-in composition") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").limit(50)
      .select($"vec_id", $"embedding")
    val q = emb.filter($"vec_id" === 0)
      .select($"embedding".as("qv"))
    val both = emb.crossJoin(q).select(
      Similarity.cosine($"embedding", $"qv").as("fused"),
      Similarity.cosineBuiltins($"embedding", $"qv").as("builtin"))
      .collect()
    both.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(both.nonEmpty)
  }

  test("brute force: exactly k neighbors per query, sorted desc") {
    val top = Similarity.bruteForceTopK(spark, sf, 5, 4).collect()
    val by = top.groupBy(_.getLong(0))
    assert(by.keySet == Set(0L, 1L, 2L, 3L, 4L))
    by.values.foreach { rows =>
      assert(rows.length == 4)
      val sims = rows.sortBy(-_.getDouble(2)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      rows.foreach(r => assert(r.getLong(1) != r.getLong(0)))
    }
  }

  test("IVF probes recover a meaningful fraction of exact neighbors") {
    val exact = Similarity.bruteForceTopK(spark, sf, 5, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, sf, 5, 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf.size <= exact.size)
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall too low")
  }

  test("kmeans matches a driver-side Lloyd's run exactly") {
    val vecs = Tables.embeddings(spark, sf)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    val k = 3; val iters = 2
    var cents = vecs.take(k).map(_._2)
    def nearest(v: Array[Double]): Int =
      cents.zipWithIndex.map { case (c, i) =>
        (v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum, i)
      }.min._2
    for (_ <- 1 until iters) {
      val byC = vecs.groupBy { case (_, v) => nearest(v) }
      cents = cents.indices.flatMap(i => byC.get(i).map { m =>
        val dim = m.head._2.length
        Array.tabulate(dim)(d => m.map(_._2(d)).sum / m.length)
      }).toArray
    }
    val want = vecs.map { case (id, v) => id -> nearest(v) }.toMap
    val got = Similarity.kmeans(spark, sf, k, iters).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == want.keySet)
    assert(got == want)
    assert(got.values.toSet.size > 1, "should use more than one cluster")
  }

  test("LSH near-dup pairs are a subset of the exact all-pairs result") {
    val exact = Similarity.embeddingPairs(spark, sf, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.embeddingPairsLsh(spark, sf, 0.45).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact),
      s"LSH found pairs the exact scan did not: ${lsh -- exact}")
    assert(lsh.nonEmpty, "bucket join should surface at least one pair")
  }
}
