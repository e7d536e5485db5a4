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

  test("date spine: dense grid, zero-filled months, totals preserved") {
    val nations = Seq("NATION_3", "NATION_24")
    val rows = Relational.dateSpineFill(spark, sf, nations).collect()
    assert(rows.length == nations.length * 84, "dense nation x month grid")
    val sparse = Relational.q5Monthly(spark, sf, nations).collect()
    assert(rows.map(_.getLong(2)).sum == sparse.map(_.getLong(2)).sum)
    assert(rows.exists(_.getLong(2) == 0L), "gap months surface as zeros")
  }

  test("argmax agg: picks the actual extreme rows") {
    val rows = Relational.argMaxAgg(spark, sf).collect()
    val orders = spark.read.parquet(s"$sf/orders.parquet").collect()
      .groupBy(_.getString(2)) // o_orderstatus
    rows.foreach { r =>
      val grp = orders(r.getString(0))
      val priciest = grp.maxBy(x => (x.getDouble(3), x.getLong(0)))
      assert(r.getString(1) == priciest.getString(5))
      assert(r.getLong(3) == grp.count(_.getDouble(3) > 100000))
    }
  }

  test("zorder buckets: clustering narrows per-bucket key rectangles") {
    val rows = Relational.zorderBuckets(spark, sf, buckets = 16).collect()
    assert(rows.length == 16)
    val total = rows.map(_.getLong(1)).sum
    assert(total == spark.read.parquet(s"$sf/lineitem.parquet").count())
    // locality: the MEDIAN bucket's partkey span must be well under the
    // global span (z-order clusters both dims; a random assignment
    // would give every bucket ~the full range)
    val globalSpan = rows.map(_.getLong(3)).max - rows.map(_.getLong(2)).min
    val spans = rows.map(r => r.getLong(3) - r.getLong(2)).sorted
    assert(spans(spans.length / 2) < globalSpan / 2,
      s"median span ${spans(spans.length / 2)} vs global $globalSpan")
  }

  test("connected components: driver union-find == distributed loop") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L),
      (12L, 11L), (20L, 21L), (21L, 20L)).toDF("src", "dst")
    val viaDriver = graft.operators.Graph.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = graft.operators.Graph
      .connectedComponents(edges, driverCutoff = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver == viaLoop)
    assert(viaDriver(3L) == 1L && viaDriver(12L) == 10L
      && viaDriver(21L) == 20L)
  }

  test("event transitions: probabilities sum to 1 per source type") {
    val rows = Events.eventTransitions(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(math.abs(rs.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    }
    val nEvents = graft.Tables.events(spark, sf).count()
    val nUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == nEvents - nUsers,
      "transition count = events minus one terminal event per user")
  }

  test("value streaks: bounded by per-user event counts") {
    val perUser = graft.Tables.events(spark, sf)
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = Events.valueStreaks(spark, sf).collect()
    assert(rows.length == perUser.size)
    rows.foreach { r =>
      val st = r.getLong(1)
      assert(st >= 1 && st <= perUser(r.getLong(0)))
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
