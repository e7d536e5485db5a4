package graft

import java.sql.Timestamp
import graft.operators.{Dedup, Events, Relational, TextStats}

/** Micro-fixture specs for the second round-3 batch: equi-depth
  * histogram, Q22 churn shape, time-weighted average, last-write-wins
  * snapshot, sorted-neighborhood blocking, unigram LM scoring.
  */
class Round3BatchBSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new Timestamp(1700000000000L + sec * 1000L)

  test("equiDepthHist: boundaries split mass evenly, ties stay together") {
    val dir = java.nio.file.Files.createTempDirectory("edh").toString
    Seq.tabulate(100)(i => (i.toLong, (i + 1).toDouble))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.equiDepthHist(spark, dir, k = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // quartile boundaries of 1..100 at (25.75, 50.5, 75.25)
    assert(got(1L) == (25L, 1.0, 25.0))
    assert(got(2L) == (25L, 26.0, 50.0))
    assert(got(3L) == (25L, 51.0, 75.0))
    assert(got(4L) == (25L, 76.0, 100.0))
  }

  test("q22Shape: above-average balance without an excluded-class order") {
    val dir = java.nio.file.Files.createTempDirectory("q22").toString
    Seq((1L, 10.0, 7L), (2L, 200.0, 7L), (3L, 150.0, 8L), (4L, -5.0, 8L))
      .toDF("c_custkey", "c_acctbal", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    // pos_avg = (10+200+150)/3 = 120; customers 2 and 3 are above;
    // customer 2 has an urgent order, customer 3 only a medium one
    Seq((10L, 2L, "1-URGENT"), (11L, 3L, "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.q22Shape(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((8L, 1L, 150.0)))
  }

  test("timeWeightedAvg: weights by holding time, drops the last reading") {
    val dir = java.nio.file.Files.createTempDirectory("twa").toString
    Seq((0L, ts(0), 1L, 10.0), (1L, ts(10), 1L, 20.0), (2L, ts(30), 1L, 99.0))
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.timeWeightedAvg(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // (10*10 + 20*20) / 30 = 16.666667; the t=30 reading holds nothing
    assert(got(1L) == (16.666667, 2L))
  }

  test("latestSnapshot: latest per (user, type), ties to max event_id") {
    val dir = java.nio.file.Files.createTempDirectory("lww").toString
    Seq(
      (0L, ts(0), 1L, "view", 1.0), (1L, ts(50), 1L, "view", 2.0),
      (2L, ts(50), 1L, "view", 3.0), // same second as 1: higher id wins
      (3L, ts(9), 1L, "click", 4.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.latestSnapshot(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(4)))
      .toMap
    assert(got == Map((1L, "view") -> (2L, 3.0), (1L, "click") -> (3L, 4.0)))
  }

  test("sortedNeighborhood: near neighbors pair, distant rows do not") {
    val dir = java.nio.file.Files.createTempDirectory("snm").toString
    // one block ("apple ..."), sorted by text: docs 1,2 adjacent and
    // similar; doc 3 shares the block but no other tokens beyond it
    Seq(
      (1L, "apple banana cherry"), (2L, "apple banana date"),
      (3L, "apple zebra yak xylophone"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Dedup.sortedNeighborhood(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 0.5))) // {apple,banana} / 4 union
  }

  test("chiSquare: independent contingency table scores zero") {
    val dir = java.nio.file.Files.createTempDirectory("chi").toString
    def hr(h: Long, i: Long) =
      new Timestamp(java.sql.Timestamp.valueOf(s"2020-01-01 0$h:00:0$i").getTime)
    // identical hour distribution for both types -> observed == expected
    val rows = for {
      (t, per) <- Seq(("a", 2L), ("b", 3L)); h <- 0L to 1L; i <- 0L until per
    } yield (t.hashCode.toLong * 100 + h * 10 + i, hr(h, i), 1L, t, 1.0)
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.chiSquare(spark, dir).collect().head
    assert(got.getDouble(0) == 0.0 && got.getLong(1) == 4L)
  }

  test("momGrowth: percent change is consistent with monthly revenues") {
    val rows = Relational.momGrowth(spark, sf, Seq("NATION_3"))
      .orderBy("ship_month").collect()
    assert(rows.length > 2 && rows.head.isNullAt(3))
    val (prev, cur) = (rows(0).getDouble(2), rows(1).getDouble(2))
    val expect = BigDecimal((cur - prev) / prev * 100)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1).getDouble(3) == expect)
  }

  test("shardPlan: blobs pack greedily under the byte capacity") {
    val dir = java.nio.file.Files.createTempDirectory("shard").toString
    Seq((0L, "x" * 6), (1L, "y" * 6), (2L, "z" * 12))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Multimodal
      .shardPlan(spark, dir, buckets = 1, capacity = 10).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // 6 fits; 6+6 > 10 opens bin 1; the 12-byte blob overflows alone
    assert(got == Map(0L -> (0L, 6L), 1L -> (1L, 6L), 2L -> (2L, 12L)))
  }

  test("standardize: train-slice moments applied to every row") {
    val dir = java.nio.file.Files.createTempDirectory("std").toString
    // pctHash: 1→93, 2→86, 3→79, 4→72 — with trainPct=80, only ids
    // 3 and 4 fit the fit slice: mu=(1+3)/2=2, sigma_pop=1
    Seq((1L, Array(9.0f)), (2L, Array(7.0f)), (3L, Array(1.0f)),
      (4L, Array(3.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Curation.standardize(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got == Map(1L -> 7.0, 2L -> 5.0, 3L -> -1.0, 4L -> 1.0))
  }

  test("rollingActiveUsers: trailing window counts distinct users") {
    val dir = java.nio.file.Files.createTempDirectory("rau").toString
    def day(d: Int, u: Long) = (d * 100L + u,
      java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 10:00:00"), u, 1.0)
    // day 1: users 1,2; day 5: user 2; day 20: user 3
    Seq(day(1, 1L), day(1, 2L), day(5, 2L), day(20, 3L))
      .map { case (id, t, u, v) => (id, t, u, v) }
      .toDF("event_id", "ts", "user_id", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.rollingActiveUsers(spark, dir).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    // window ending day 5 spans days 1-5 -> users {1,2}; day 20 alone
    assert(got == Map("2024-01-01" -> 2L, "2024-01-05" -> 2L,
      "2024-01-20" -> 1L))
  }

  test("commonTrigrams: per-user paths, global counts, stable ties") {
    val dir = java.nio.file.Files.createTempDirectory("tri").toString
    val rows = Seq(
      (0L, ts(0), 1L, "a", 0.0), (1L, ts(1), 1L, "b", 0.0),
      (2L, ts(2), 1L, "c", 0.0), (3L, ts(3), 1L, "b", 0.0),
      (4L, ts(0), 2L, "a", 0.0), (5L, ts(1), 2L, "b", 0.0),
      (6L, ts(2), 2L, "c", 0.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.commonTrigrams(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("a>b>c", 2L), ("b>c>b", 1L)))
  }

  test("winsorize: group means clamp to the quantile band") {
    val dir = java.nio.file.Files.createTempDirectory("win").toString
    // 1..9 plus an outlier 1000: p05/p95 of the 10 values clamp it
    (Seq.tabulate(9)(i => ("A", (i + 1).toDouble)) :+ ("A", 1000.0))
      .toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.winsorize(spark, dir).collect().head
    assert(r.getString(0) == "A" && r.getLong(1) == 10L)
    assert(r.getDouble(3) < r.getDouble(2)) // clamping pulls the mean down
    assert(r.getDouble(2) == 104.5)
  }

  test("aspectBuckets: integer cross-multiplication classes") {
    val got = graft.operators.Multimodal.aspectBuckets(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keys.map(_._1).toSet == Set("image", "video"))
    assert(got.values.sum > 0)
  }

  test("skyline: dominance with price ties and exact duplicates") {
    val dir = java.nio.file.Files.createTempDirectory("sky").toString
    def od(day: Int) = java.sql.Timestamp.valueOf(f"1996-01-$day%02d 00:00:00")
    Seq(
      (1L, 100.0, od(10)), // dominated by 4 (higher price, earlier date)
      (2L, 200.0, od(5)),  // skyline
      (3L, 200.0, od(7)),  // price tie, later date -> dominated by 2
      (4L, 150.0, od(8)),  // dominated by 2
      (5L, 300.0, od(9)),  // skyline (highest price)
      (6L, 300.0, od(9)),  // exact duplicate of 5 -> coexists
      (7L, 50.0, od(1)))   // skyline (earliest date)
      .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = Relational.skyline(spark, dir).collect()
      .map(_.getLong(0)).toSet
    assert(got == Set(2L, 5L, 6L, 7L))
  }

  test("stringAgg: deterministic sorted group concatenation") {
    val got = Relational.stringAgg(spark, sf).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(got.nonEmpty)
    got.values.foreach { s =>
      val ks = s.split(",").map(_.toLong)
      assert(ks.sorted.sameElements(ks)) // sorted within each group
    }
  }

  test("revenueShare: shares sum to 100 and cumulative ends at 100") {
    val rows = Relational.revenueShare(spark, sf).collect()
    val total = rows.map(_.getDouble(2)).sum
    assert(math.abs(total - 100.0) < 0.01)
    val lastCum = rows.map(_.getDouble(3)).max
    assert(math.abs(lastCum - 100.0) < 0.01)
  }

  test("quantizeInt8: range-affine parameters and bounded error") {
    val dir = java.nio.file.Files.createTempDirectory("q8").toString
    import spark.implicits._
    Seq((1L, Array(0.0f, 255.0f, 100.25f)), (2L, Array(7.0f, 7.0f)))
      .toDF("vec_id", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.operators.Similarity.quantizeInt8(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      .toMap
    // vec 1: scale 1.0, endpoints exact, 100.25 -> q=100 -> err 0.25
    assert(got(1L) == (1.0, 0.0, 0.25))
    // constant vector: degenerate scale 1, zero error
    assert(got(2L) == (1.0, 7.0, 0.0))
  }

  test("rankNormalize: percent ranks within each source") {
    val dir = java.nio.file.Files.createTempDirectory("rn").toString
    import spark.implicits._
    Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L), (4L, "b", 99L))
      .toDF("doc_id", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Curation.rankNormalize(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    assert(got == Map(1L -> 0.0, 2L -> 0.5, 3L -> 1.0, 4L -> 0.0))
  }

  test("bestSurvivor: clusters keep their highest-quality member") {
    val dir = java.nio.file.Files.createTempDirectory("bs").toString
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (4L, base, "s"),            // near-dup of 5, lower quality
      (5L, base + " the", "s"),   // +1 stopword token -> higher quality
      (9L, "unrelated words entirely different content here", "s"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Dedup.bestSurvivor(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got(4L) == (4L, false)) // cluster canonical is min id...
    assert(got(5L) == (4L, true))  // ...but the keeper is the best doc
    assert(got(9L) == (9L, true))  // singleton keeps itself
  }

  test("leakageSafeSplit: near-duplicates never straddle the boundary") {
    val dir = java.nio.file.Files.createTempDirectory("ls").toString
    import spark.implicits._
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // pctHash(1)=93 (test), pctHash(3)=79 (valid) — but both docs are
    // duplicates, so both follow canonical id 1 into 'test'
    Seq((1L, t, "en"), (3L, t, "en"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.operators.Curation.leakageSafeSplit(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("test", "en") -> 2L))
  }

  test("rfmSegments: buckets partition customers; totals preserved") {
    val rows = Relational.rfmSegments(spark, sf).collect()
    val total = rows.map(_.getLong(3)).sum
    val nCust = graft.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(total == nCust)
    assert(rows.forall { r =>
      (1L to 5L).contains(r.getLong(0)) &&
        (1L to 5L).contains(r.getLong(1)) && (1L to 5L).contains(r.getLong(2))
    })
  }

  test("langConfusion: counts cover the corpus, diagonal non-empty") {
    val rows = graft.operators.TextStats.langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._3).sum ==
      graft.Tables.documents(spark, sf).count())
    // it's a report, not an accuracy claim — the synthetic corpus only
    // weakly carries language signal; just require SOME agreement
    assert(rows.filter(r => r._1 == r._2).map(_._3).sum > 0)
  }

  test("q11Shape: mean-relative cut keeps only above-mean parts") {
    val rows = Relational.q11Shape(spark, sf).collect()
    assert(rows.nonEmpty)
    val vals = graft.Tables.lineitem(spark, sf)
      .groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.round(
        org.apache.spark.sql.functions.sum("l_extendedprice"), 4)
        .as("v"))
      .collect().map(_.getDouble(1))
    val cut = vals.sum / vals.length * 1.25
    assert(rows.forall(_.getDouble(1) > cut))
    assert(rows.length == vals.count(_ > cut))
  }

  test("dauWauRatio: stickiness bounded by (0, 1], dau <= wau") {
    val rows = graft.operators.Events.dauWauRatio(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      r.getLong(1) <= r.getLong(2) &&
        r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0
    })
  }

  test("zipfFit: mechanics — non-positive slope, r2 in range") {
    val r = graft.operators.TextStats.zipfFit(spark, sf).collect().head
    assert(r.getLong(2) > 10L && r.getLong(2) <= 100L) // vocab-capped
    // frequencies are non-increasing in rank, so the fit can't rise;
    // the synthetic corpus is nearly UNIFORM (r2 ≈ 0.06 at sf0.001),
    // which is precisely the non-natural-text signal the operator
    // exists to surface — naturalness is not asserted here
    assert(r.getDouble(0) <= 0.0)
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) <= 1.0)
  }

  test("unigramLogProb: mean token log-probability under the corpus model") {
    val dir = java.nio.file.Files.createTempDirectory("ulp").toString
    Seq((1L, "a a"), (2L, "b"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextStats.unigramLogProb(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // model: a→2/3, b→1/3
    assert(got(1L) == (BigDecimal(math.log(2.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 2L))
    assert(got(2L) == (BigDecimal(math.log(1.0 / 3))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, 1L))
  }
}
