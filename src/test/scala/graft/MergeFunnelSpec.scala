package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Relational, Similarity}

/** Invariants of the merge/unpivot/centroid/funnel operators. */
class MergeFunnelSpec extends SparkSpec {

  test("upsert merge: one row per active customer, delta wins") {
    val rows = Relational.upsertMerge(spark, sf).collect()
    val keys = rows.map(_.getLong(0))
    assert(keys.distinct.length == keys.length, "key uniqueness")
    val custWithOrders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").distinct().count()
    assert(rows.length == custWithOrders)
    // every delta-source row has a date >= cutoff, base rows < cutoff
    rows.foreach { r =>
      val d = r.getString(1)
      if (r.getString(3) == "delta") assert(d >= "1998-01-01")
      else assert(d < "1998-01-01")
    }
  }

  test("unpivot: 3 measures per flag, values match the wide table") {
    val rows = Relational.unpivotMeasures(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(round(sum("l_quantity"), 4).as("q")).collect()
    assert(rows.size == wide.length * 3)
    wide.foreach { w =>
      assert(rows((w.getString(0), "sum_qty")) == w.getDouble(1))
    }
  }

  test("embedding centroids: dim x label coverage, counts add up") {
    val rows = Similarity.embeddingCentroids(spark, sf).collect()
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    val labels = rows.map(_.getInt(0)).distinct
    assert(rows.length == labels.length * 64)
    // per-position counts per label sum to the table size across labels
    val perPos = rows.filter(_.getInt(1) == 0).map(_.getLong(3)).sum
    assert(perPos == total)
  }

  test("media features: histogram counts sum to blob length") {
    val byDoc = graft.operators.Multimodal.featureExtract(spark, sf)
      .collect().groupBy(_.getLong(0))
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, rows) =>
      assert(rows.map(_.getLong(3)).sum == lens(id))
      assert(rows.map(_.getInt(2)).forall(b => b >= 0 && b < 16))
    }
  }

  test("funnel: stages are monotone and bounded") {
    val rows = Events.funnel(spark, sf).collect()
    assert(rows.nonEmpty)
    val stages = rows.map(_.getInt(1))
    assert(stages.forall(st => st >= 1 && st <= 3))
    // users at stage 3 must also satisfy stage-2 logic: strictly more
    // stage>=2 users than stage-3 users unless every clicker purchased
    assert(stages.count(_ >= 2) >= stages.count(_ == 3))
  }
}
