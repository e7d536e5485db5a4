package graft

import graft.operators.Similarity

/** Round-6 scale restatements (VERDICT r5 #2/#3): intrinsic_dimension
  * re-candidated off IVF probe lists, embedding_alignment's
  * deterministic hash pair subsample. These pin the 100 TB posture —
  * bounded broadcasts, equality joins — alongside value sanity on
  * both code paths.
  */
class Round6ScaleFixSpec extends SparkSpec {
  import spark.implicits._

  private def plan(df: org.apache.spark.sql.DataFrame): String = {
    val p = df.queryExecution.executedPlan.toString
    CacheScope.release(spark)
    p
  }

  test("intrinsic_dimension: centroids broadcast, probe join shuffles," +
    " no full-corpus broadcast") {
    val p = plan(Similarity.intrinsicDimension(spark, sf))
    assert(p.contains("BroadcastExchange"),
      "the 16-centroid table must broadcast")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      "the n-proportional probe join must shuffle on centroid_id")
    assert(!p.contains("CartesianProduct"))
    // the only nested-loop joins allowed are unconditioned Cross
    // broadcasts of BOUNDED frames (16-row centroids, 1-row scalars);
    // the r5 shape was a conditioned Inner BNLJ against the WHOLE
    // broadcast embedding table (`NOT (vec_id = qid)`)
    p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .foreach(l => assert(l.contains("Cross"),
        s"conditioned nested-loop join — full-corpus broadcast? $l"))
  }

  test("intrinsic_dimension: IVF candidates keep the 1-d curve reading" +
    " low-dimensional") {
    val dir = java.nio.file.Files.createTempDirectory("twonn6").toString
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
    // on a smooth curve the true 2 nearest neighbors share the query's
    // probed lists, so the IVF estimate matches the exact one's range
    assert(r.getLong(0) == 24L && r.getLong(1) == 0L, s"n: $r")
    assert(r.getDouble(3) > 0.1 && r.getDouble(3) < 3.0, s"id: $r")
  }

  test("embedding_alignment: sampled path over the cutoff — bucketed" +
    " equality join, no broadcast nested loop") {
    val dir = java.nio.file.Files.createTempDirectory("align6").toString
    // 1200 unit vectors in 2 clusters > exactCutoff=1024 → hash-bucket
    // pair subsample
    val vecs = (0 until 1200).map { i =>
      val lab = i % 2
      val theta = lab * 1.5 + (i % 97) * 0.001
      (i.toLong, Array(math.cos(theta).toFloat, math.sin(theta).toFloat),
        lab)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val df = Similarity.embeddingAlignment(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"sampled path must pair via the bucket equality join:\n$p")
    val r = df.collect().head
    CacheScope.release(spark)
    val nPairs = r.getLong(0)
    // ~64·n pairs (n/128 buckets of ~128): far below all-pairs 719k
    assert(nPairs > 10000L && nPairs < 200000L, s"pairs: $nPairs")
    // same-label pairs sit ~0.001 rad apart, cross pairs ~1.5 rad:
    // alignment (mean 1−cos over positives) must read near 0
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) < 0.01,
      s"alignment: $r")
    assert(r.getDouble(3) < 0.0, s"uniformity must be negative: $r")
  }

  test("embedding_alignment: exact path below the cutoff is unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("align6b").toString
    // 4 vectors, 2 labels: positives identical (d9=0), all-pairs = 6
    val vecs = Seq(
      (0L, Array(1f, 0f), 0), (1L, Array(1f, 0f), 0),
      (2L, Array(0f, 1f), 1), (3L, Array(0f, 1f), 1))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.embeddingAlignment(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(0) == 6L && r.getLong(1) == 2L, s"pairs: $r")
    assert(r.getDouble(2) == 0.0, s"identical positives align at 0: $r")
  }
}
