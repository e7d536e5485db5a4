package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, TextStats}

/** Invariants of the curation tier (values are oracle-checked by the
  * driver; these pin the semantic properties).
  */
class CurationSpec extends SparkSpec {

  test("stratified sample: only sampled strata shrink, determinism") {
    val once = Curation.stratifiedSample(spark, sf).collect()
    val again = Curation.stratifiedSample(spark, sf).collect()
    assert(once.map(_.getLong(0)).sorted.sameElements(
      again.map(_.getLong(0)).sorted), "hash sampling must be deterministic")
    val total = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = once.groupBy(_.getString(1)).map { case (l, rs) => l -> rs.length }
    // en sampled at 10%, rest at 40% — kept fraction must stay in a wide
    // band around the rate (hash is pseudo-uniform, fixtures are small)
    kept.foreach { case (lang, n) =>
      val rate = if (lang == "en") 0.10 else 0.40
      val frac = n.toDouble / total(lang)
      assert(frac > rate - 0.15 && frac < rate + 0.15,
        s"$lang kept $frac vs rate $rate")
    }
  }

  test("train/test split: partitions the corpus exactly") {
    val rows = Curation.trainTestSplit(spark, sf).collect()
    val total = rows.map(_.getLong(2)).sum
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total == nDocs, "every document lands in exactly one split")
    val splits = rows.map(_.getString(0)).toSet
    assert(splits.subsetOf(Set("train", "valid", "test")))
    val train = rows.filter(_.getString(0) == "train").map(_.getLong(2)).sum
    assert(train > total / 2, "80% band must dominate")
  }

  test("seq packing: greedy bin invariants per bucket") {
    val cap = 64
    val rows = Curation.packSequences(spark, sf, buckets = 4, capacity = cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      val ordered = docs.sortBy(_._1)
      // bins are contiguous from 0 and never decrease in doc order
      assert(ordered.head._3 == 0L)
      ordered.sliding(2).foreach {
        case Array((_, _, b1, f1), (id2, _, b2, f2)) =>
          assert(b2 == b1 || b2 == b1 + 1)
          if (b2 == b1) {
            // same bin: fill grew by the doc's tokens and respects cap
            assert(f2 >= f1 && f2 <= cap)
          } else {
            // new bin: previous bin genuinely could not fit this doc
            // (unless the doc alone exceeds cap, then it sits alone)
            assert(f1 + f2 - f1 >= 0) // fill resets to the doc's own size
            assert(f1 + f2 > cap || f2 > cap)
          }
        case _ =>
      }
    }
  }

  test("contamination: eval docs never flagged, counts positive") {
    val rows = Curation.contamination(spark, sf, n = 3).collect()
    assert(rows.forall(_.getLong(0) % 50 != 0), "eval slice excluded")
    assert(rows.forall(_.getInt(1) > 0))
  }

  test("contamination: driver-literal path ≡ distributed semi-join path") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // cutoff huge → SetProbeCount literal path; cutoff 0 → the eval set
    // "doesn't fit", forcing the explode + shuffle-join fallback
    val literal = asMap(Curation.contamination(spark, sf, n = 3,
      driverCutoff = Int.MaxValue - 1))
    val dist = asMap(Curation.contamination(spark, sf, n = 3,
      driverCutoff = 0))
    assert(literal.nonEmpty)
    assert(literal == dist,
      "both execution paths must flag identical (doc, n_shared) sets")
  }

  test("repetition fraction bounded in [0, 1)") {
    val rows = TextStats.repetitionFrac(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getDouble(2)
      assert(f >= 0.0 && f < 1.0)
    }
  }

  test("pattern scrub: lengths shrink exactly when matches exist") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), length(col("text")).as("len"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    TextStats.patternScrub(spark, sf).collect().foreach { r =>
      val (id, n, slen) = (r.getLong(0), r.getInt(1), r.getInt(2))
      if (n == 0) assert(slen == docs(id))
      else {
        // matches are 3..8 chars ("key".."customer"), replacement is 3:
        // each redaction shrinks the text by 0..5 chars
        assert(slen <= docs(id))
        assert(slen >= docs(id) - n * 5)
      }
    }
  }

  test("weighted sample: exact A-ES top-k per priority group") {
    val k = 5
    val got = Curation.weightedSample(spark, sf, k).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // recompute the Efraimidis–Spirakis keys driver-side
    val want = Tables.orders(spark, sf)
      .select("o_orderpriority", "o_orderkey", "o_totalprice").collect()
      .map { r =>
        val id = r.getLong(1)
        val u = ((id % 2147483648L) * 8388593L % 1048576L + 0.5) / 1048576.0
        (r.getString(0), id, -math.log(u) / r.getDouble(2))
      }
      .groupBy(_._1)
      .view.mapValues(_.sortBy(t => (t._3, t._2)).take(k).map(_._2).toSet)
      .toMap
    assert(got == want)
    got.values.foreach(ids => assert(ids.size <= k))
  }

  test("leading tokens: ranks dense per position, positions bounded") {
    val rows = TextStats.leadingTokens(spark, sf, lead = 3, k = 2).collect()
    val byPos = rows.groupBy(_.getInt(0))
    assert(byPos.keySet.subsetOf(Set(1, 2, 3)))
    byPos.values.foreach { rs =>
      assert(rs.map(_.getInt(3)).sorted.sameElements(1 to rs.length))
    }
  }
}
