package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Graph, Ml, Relational, Similarity}

/** Round-5 batch C: k-truss edge peeling, group-fairness audit. */
class Round5BatchCSpec extends SparkSpec {
  import spark.implicits._

  test("kTrussEdges: 3-truss drops pendant edges, keeps triangles") {
    // triangle {1,2,3} + pendant 3-4 + disjoint triangle {5,6,7}
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (5L, 6L), (5L, 7L), (6L, 7L)).toDF("u", "v")
    val hist = Graph.kTrussEdges(spark, e, k = 3, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // both triangles survive with support 1 each; the pendant is gone
    // (-1 is the survivor-total row)
    assert(hist == Map(-1L -> 6L, 1L -> 6L), s"got $hist")
  }

  test("kTrussEdges: K4 edges all have support 2; 4-truss keeps K4 only") {
    // K4 on {1..4} plus a triangle {4,5,6} hanging off vertex 4
    val k4 = for (a <- 1 to 4; b <- (a + 1) to 4) yield (a.toLong, b.toLong)
    val e = (k4 ++ Seq((4L, 5L), (4L, 6L), (5L, 6L))).toDF("u", "v")
    val t4 = Graph.kTrussEdges(spark, e, k = 4, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=4 needs support >= 2: only the K4's 6 edges qualify, and after
    // the hanging triangle is peeled each still closes 2 triangles
    assert(t4 == Map(-1L -> 6L, 2L -> 6L), s"got $t4")
  }

  test("kTrussEdges: cascade — peeling one edge starves the next round") {
    // two triangles sharing edge (2,3), plus (1,4) making {1,2,3,4}
    // NOT a K4 (edge (1,4) itself is in no triangle... it is: 1-2-4?
    // only if (2,4) exists — it does: {2,3,4} triangle). Build
    // explicitly: edges of two triangles {1,2,3}, {2,3,4}: shared edge
    // (2,3) has support 2, the other four have support 1.
    val e = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val t4 = Graph.kTrussEdges(spark, e, k = 4, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // k=4 drops the support-1 edges in round 1; (2,3) then has no
    // triangle left and drops in round 2 — empty truss, total row only
    assert(t4 == Map(-1L -> 0L), s"got $t4")
  }

  test("readability: hand-computed Flesch on a crafted document") {
    val dir = java.nio.file.Files.createTempDirectory("read").toString
    // w=5 tokens, 2 sentence terminators, 7 vowel groups:
    // one(2) two(1) three(1) four(1) five(2)
    Seq((1L, "One two three. Four five!", "en", "webA", 25L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = graft.operators.TextStats.readability(spark, dir)
      .collect().head
    assert(r.getLong(1) == 1L)
    assert(r.getDouble(2) == 2.5, s"w/s: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 1.4, s"syll/w: ${r.getDouble(3)}")
    val expected = 206.835 - 1.015 * 2.5 - 84.6 * 1.4
    assert(math.abs(r.getDouble(4) - expected) < 1e-4,
      s"flesch ${r.getDouble(4)} vs $expected")
  }

  test("readability: fixture profile is sane per source") {
    val rows = graft.operators.TextStats.readability(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 1.0, "at least one word per sentence floor")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 6.0)
      assert(r.getDouble(4) > -300 && r.getDouble(4) < 207)
    }
  }

  test("cold_start_audit: planted new users are counted exactly") {
    val dir = java.nio.file.Files.createTempDirectory("cold").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // users 1-10 active in both halves; users 11-15 appear only in the
    // second half, one event each
    val rows = (1 to 10).flatMap { u =>
      Seq((u.toLong * 2, new java.sql.Timestamp(base), u.toLong,
        "view", 1.0, "{}"),
        (u.toLong * 2 + 1, new java.sql.Timestamp(base + 10 * 86400000L),
          u.toLong, "view", 1.0, "{}"))
    } ++ (11 to 15).map { u =>
      (u.toLong * 100, new java.sql.Timestamp(base + 9 * 86400000L),
        u.toLong, "view", 1.0, "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.coldStartAudit(spark, dir).collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 15L && r.getLong(2) == 5L,
      s"got $r")
    assert(r.getDouble(3) == math.rint(5.0 / 15 * 1e6) / 1e6)
    assert(r.getDouble(4) == math.rint(5.0 / 15 * 1e6) / 1e6,
      "5 of 15 post events come from cold users")
  }

  test("seasonality_strength: a pure weekly pattern maxes F_seasonal") {
    val dir = java.nio.file.Files.createTempDirectory("seas").toString
    // counts cycle 1..7 by day-of-week for 8 weeks: after removing
    // the weekly component, residuals are (almost) flat
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val rows = (0 until 56).flatMap { d =>
      (0 until (d % 7) + 1).map { j =>
        (d.toLong * 10 + j, new java.sql.Timestamp(base + d * 86400000L),
          1L, "view", 1.0, "{}")
      }
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.seasonalityStrength(spark, dir).collect().head
    assert(r.getLong(0) == 56L)
    assert(r.getDouble(1) > 0.8,
      s"pure weekly pattern must score high F_seasonal: $r")
    assert(r.getDouble(1) > r.getDouble(2),
      "seasonal strength must dominate trend strength here")
  }

  test("peak_concurrency: stacked intervals count correctly") {
    val dir = java.nio.file.Files.createTempDirectory("conc").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime
    // three 10-minute intervals starting 0/2/4 min apart => all three
    // overlap from minute 4; two extra singleton intervals elsewhere
    val rows = Seq(
      (1L, new java.sql.Timestamp(base), 1L, "view", 600.0, "{}"),
      (2L, new java.sql.Timestamp(base + 120000L), 2L, "view", 600.0, "{}"),
      (3L, new java.sql.Timestamp(base + 240000L), 3L, "view", 600.0, "{}"),
      (4L, new java.sql.Timestamp(base + 7200000L), 4L, "view", 60.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.peakConcurrency(spark, dir).collect().head
    assert(r.getLong(1) == 3L, s"peak must be 3: $r")
    assert(r.getLong(0) == (base / 1000 + 240), "earliest full-overlap minute")
  }

  test("max_drawdown: hand-built peak-trough series") {
    val dir = java.nio.file.Files.createTempDirectory("dd").toString
    // daily totals: +10, +5, -12, -3, +20 => cum 10,15,3,0,20
    // runmax 10,15,15,15,20 => max drawdown 15 at the day of cum=0
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val vals = Seq(10.0, 5.0, -12.0, -3.0, 20.0)
    vals.zipWithIndex.map { case (v, i) =>
      (i.toLong, new java.sql.Timestamp(base + i * 86400000L), 1L,
        "view", v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.maxDrawdown(spark, dir).collect().head
    assert(r.getDouble(1) == 15.0, s"drawdown: $r")
    assert(r.getDouble(2) == 15.0 && r.getDouble(3) == 0.0)
  }

  test("diff_in_diff: cell means reproduce the estimator") {
    val rows = Events.diffInDiff(spark, sf).collect()
    assert(rows.length == 4)
    val m = rows.map(r =>
      (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    val did = rows.head.getDouble(4)
    val expect = (m(("a", "post")) - m(("a", "pre"))) -
      (m(("b", "post")) - m(("b", "pre")))
    assert(math.abs(did - expect) < 5e-6, s"did $did vs $expect")
    assert(rows.forall(_.getDouble(4) == did))
  }

  test("entropy_rate: deterministic chains have rate 0, uniform ln(k)") {
    val dir = java.nio.file.Files.createTempDirectory("erate").toString
    // users cycle a->b->a->b deterministically: every transition is
    // certain, so the entropy rate must be exactly 0
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    (0 until 400).map { i =>
      (i.toLong, new java.sql.Timestamp(base + i * 1000L),
        (i % 10).toLong, if ((i / 10) % 2 == 0) "a" else "b", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Events.entropyRate(spark, dir).collect()
    assert(rows.forall(_.getDouble(3) == 0.0),
      s"deterministic chain must have rate 0: ${rows.mkString(",")}")
    assert(rows.forall(_.getDouble(2) == 0.0))
  }

  test("entropy_rate: fixture rate is a convex mix of conditionals") {
    val rows = Events.entropyRate(spark, sf).collect()
    assert(rows.nonEmpty)
    val conds = rows.map(_.getDouble(2))
    val rate = rows.head.getDouble(3)
    assert(conds.forall(h => h >= 0.0 && h <= math.log(5) + 1e-6))
    assert(rate >= conds.min - 1e-9 && rate <= conds.max + 1e-9,
      s"rate $rate must sit inside [${conds.min}, ${conds.max}]")
  }

  test("ab_power: MDE shrinks with n and matches the closed form") {
    val r = Events.abPower(spark, sf).collect().head
    val (na, nb) = (r.getLong(0), r.getLong(1))
    val (sigma, mde) = (r.getDouble(3), r.getDouble(4))
    assert(na > 0 && nb > 0)
    val expect = 2.801585 * sigma * math.sqrt(1.0 / na + 1.0 / nb)
    assert(math.abs(mde - expect) < 2e-6, s"mde $mde vs $expect")
    assert(math.abs(r.getDouble(5) - mde / r.getDouble(2)) < 2e-6)
  }

  test("media_phash_buckets: identical blobs share a bucket, kinds split") {
    val dir = java.nio.file.Files.createTempDirectory("phash").toString
    // doc_ids 0,3,6.. are 'image': three identical image blobs must
    // land in ONE bucket of size 3; a distinct blob stays a singleton
    Seq(
      (0L, "abcdefghijklmnop", "en", "a", 16L),
      (3L, "abcdefghijklmnop", "en", "a", 16L),
      (6L, "abcdefghijklmnop", "en", "a", 16L),
      (9L, "zyxwvutsrqponmlk", "en", "a", 16L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Multimodal.mediaPhashBuckets(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // ascending text -> phash 255, descending -> 0: two buckets
    assert(rows.contains(("image", 3L, 1L)), s"got ${rows.mkString(",")}")
    assert(rows.contains(("image", 1L, 1L)))
  }

  test("window_funnel: deadline cuts a chain the lifetime funnel keeps") {
    val dir = java.nio.file.Files.createTempDirectory("wf").toString
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // user 1: full chain within 6h; user 2: purchase 20h after view
    // (beyond deadline, still a lifetime conversion); user 3: view only
    val rows = Seq(
      (1L, ts(1), 1L, "view", 1.0, "{}"), (2L, ts(2), 1L, "click", 1.0, "{}"),
      (3L, ts(3), 1L, "purchase", 1.0, "{}"),
      (4L, ts(1), 2L, "view", 1.0, "{}"), (5L, ts(2), 2L, "click", 1.0, "{}"),
      (6L, ts(21), 2L, "purchase", 1.0, "{}"),
      (7L, ts(1), 3L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val d = Events.windowFunnel(spark, dir).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(d == Map(1 -> 1L, 2 -> 1L, 3 -> 1L), s"got $d")
    // the lifetime funnel would credit user 2 with depth 3
    val lifetime = Events.funnel(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(lifetime(2L) == 3, "sanity: lifetime funnel keeps the late chain")
  }

  test("ips_eval: single-action log makes all three estimators agree") {
    // one action only: propensity 1, every event matches the modal
    // policy => direct mean == IPS == SNIPS == plain mean
    val dir = java.nio.file.Files.createTempDirectory("ips").toString
    (1 to 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        (i % 20).toLong, "view", (i % 4) * 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.ipsEval(spark, dir).collect().head
    assert(r.getLong(1) == 200L, "every event matches the only action")
    val mean = (1 to 200).map(i => (i % 4) * 1.0).sum / 200
    assert(math.abs(r.getDouble(2) - mean) < 1e-6)
    assert(math.abs(r.getDouble(3) - mean) < 1e-5, s"IPS ${r.getDouble(3)}")
    assert(math.abs(r.getDouble(4) - mean) < 1e-5, s"SNIPS ${r.getDouble(4)}")
  }

  test("ips_eval: fixture estimators are finite and consistent") {
    val r = Events.ipsEval(spark, sf).collect().head
    assert(r.getLong(1) > 0 && r.getLong(1) <= r.getLong(0))
    Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4)).foreach { v =>
      assert(!v.isNaN && !v.isInfinite)
    }
    // SNIPS is the self-normalized IPS: same sign, same order of magnitude
    assert(r.getDouble(4) >= 0.0 == r.getDouble(3) >= 0.0)
  }

  test("isotropy_audit: identical vectors are maximally anisotropic") {
    val dir = java.nio.file.Files.createTempDirectory("iso").toString
    (1 to 40).map(i => (i.toLong, Array(3.0f, 4.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val all = Similarity.isotropyAudit(spark, dir).collect()
      .find(_.getString(0) == "_all").get
    assert(all.getDouble(2) == 5.0, s"mean norm must be 5: $all")
    assert(all.getDouble(3) == 0.0, "identical norms have zero CV")
    assert(math.abs(all.getDouble(4) - 1.0) < 1e-6,
      s"one shared direction must give isotropy proxy 1, got $all")
  }

  test("isotropy_audit: fixture rows bounded and _all present") {
    val rows = Similarity.isotropyAudit(spark, sf).collect()
    assert(rows.exists(_.getString(0) == "_all"))
    rows.foreach { r =>
      assert(r.getDouble(2) > 0.0)
      assert(r.getDouble(3) >= 0.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0 + 1e-9,
        s"isotropy proxy out of range: $r")
    }
  }

  test("prf_expansion: co-occurring term expands its probe") {
    val dir = java.nio.file.Files.createTempDirectory("prf").toString
    // 'alpha' is the dominant probe; 'omega' co-occurs with it in every
    // feedback doc while 'noise' terms scatter
    val docs = (0 until 30).map { i =>
      val extra = if (i % 3 == 0) "omega omega" else s"nz$i"
      (i.toLong, s"alpha common filler $extra", "en", "a", 30L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Index.prfExpansion(spark, dir).collect()
    val alpha = rows.filter(_.getString(0) == "alpha")
    assert(alpha.nonEmpty, "dominant term must be a probe")
    assert(alpha.forall(_.getDouble(3) > 0.0), "RRF weights are positive")
    rows.groupBy(_.getString(0)).foreach { case (probe, g) =>
      assert(g.forall(_.getString(2) != probe), "probe never expands itself")
      assert(g.map(_.getInt(1)).sorted.sameElements(1 to g.length))
    }
  }

  test("stem_collisions: S-stemmer merges crafted plural families") {
    val dir = java.nio.file.Files.createTempDirectory("stem").toString
    Seq(
      (1L, "query queries table tables bus buses class classes", "en", "a", 40L),
      (2L, "query table value values window windows", "en", "a", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.TextStats.stemCollisions(spark, dir)
      .collect()
    val summary = rows.find(_.getString(0) == "_summary").get
    val byStem = rows.filterNot(_.getString(0) == "_summary")
      .map(r => r.getString(0) -> r.getString(3)).toMap
    // query/queries -> 'query' via ies->y; table/tables via s-strip
    assert(byStem.get("query").contains("queries,query"), s"$byStem")
    assert(byStem.get("table").contains("table,tables"))
    assert(byStem.get("value").contains("value,values"))
    assert(byStem.get("window").contains("window,windows"))
    // 'bus' (us) and 'class' (ss) are PROTECTED: no merge rows for them
    assert(!byStem.contains("bus") && !byStem.contains("clas") &&
      !byStem.contains("class"))
    // summary counts the merged surface forms (one per family above;
    // 'buses'->'buse' via es-rule is a lone form, no merge)
    assert(summary.getLong(1) == 4L, s"merged forms: $summary")
  }

  test("session_gap_sweep: 30-minute rung equals the real sessionizer") {
    val n30 = Events.sessionGapSweep(spark, sf).collect()
      .find(_.getInt(0) == 30).get.getLong(1)
    assert(n30 == Events.sessionize(spark, sf).count(),
      "sweep rung must equal an actual 30-min sessionization")
    val rows = Events.sessionGapSweep(spark, sf).collect()
      .sortBy(_.getInt(0)).map(_.getLong(1))
    assert(rows.zip(rows.tail).forall { case (a, b) => b <= a },
      "larger gaps can only merge sessions")
  }

  test("ctfidf_terms: a source-exclusive dominant term tops its source") {
    val dir = java.nio.file.Files.createTempDirectory("ctfidf").toString
    val docs = (0 until 10).map { i =>
      (i.toLong, "zebra zebra zebra common words here", "en", "srcA", 30L)
    } ++ (10 until 20).map { i =>
      (i.toLong, "common words here and more filler text", "en", "srcB", 30L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = graft.operators.Index.ctfidfTerms(spark, dir).collect()
      .filter(_.getString(0) == "srcA").minBy(_.getInt(1))
    assert(top.getString(2) == "zebra",
      s"srcA's top keyword must be its exclusive term, got $top")
  }

  test("ctfidf_terms: ranks dense per source, scores positive") {
    val rows = graft.operators.Index.ctfidfTerms(spark, sf).collect()
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(1)).sorted.sameElements(1 to g.length))
      assert(g.length <= 5)
    }
    assert(rows.forall(_.getDouble(4) > 0.0))
  }

  test("mmr_select: diversity — one pick per axis cluster, not top-k-by-rel") {
    val dir = java.nio.file.Files.createTempDirectory("mmr").toString
    // three tight orthogonal clusters; pure relevance would drain one
    // cluster, MMR must visit all three in the first three picks
    val vecs = (0 until 10).map(i => (i.toLong, Array(1.0f, i * 0.001f, 0.0f), 0)) ++
      (0 until 10).map(i => (100L + i, Array(0.0f, 1.0f, i * 0.001f), 1)) ++
      (0 until 10).map(i => (200L + i, Array(i * 0.001f, 0.0f, 1.0f), 2))
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.operators.Similarity.mmrSelect(spark, dir, k = 3)
      .collect()
    val clusters = rows.map(_.getLong(1) / 100).toSet
    assert(clusters == Set(0L, 1L, 2L),
      s"first 3 picks must span the 3 clusters, got ${rows.mkString(", ")}")
  }

  test("mmr_select: fixture ranks are 1..k with distinct ids") {
    val rows = graft.operators.Similarity.mmrSelect(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == (1 to 8))
    assert(rows.map(_.getLong(1)).distinct.length == 8)
    // NOTE: scores are NOT monotone — cosine to the selected set can
    // be negative, so an anti-correlated later pick may out-score an
    // earlier one. Scores are bounded by the objective's range though.
    val scores = rows.map(_.getDouble(3))
    assert(scores.forall(v => v >= -1.5 && v <= 1.0))
  }

  test("mutual_nn_pairs: planted twins pair up; hubs don't fake pairs") {
    val dir = java.nio.file.Files.createTempDirectory("mnn").toString
    // two tight twin pairs + background spread; twins must match
    val twins = Seq(
      (100L, Array(1.0f, 0.0f, 0.0f), 0), (101L, Array(0.999f, 0.001f, 0.0f), 0),
      (200L, Array(0.0f, 1.0f, 0.0f), 1), (201L, Array(0.001f, 0.999f, 0.0f), 1))
    val bg = (0 until 30).map(i =>
      (i.toLong, Array(0.5f + i * 0.01f, 0.5f - i * 0.01f, 0.3f), 2))
    (twins ++ bg).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Similarity.mutualNnPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((100L, 101L)), s"twin pair 100-101 missing: $got")
    assert(got.contains((200L, 201L)), s"twin pair 200-201 missing: $got")
  }

  test("mutual_nn_pairs: pairs are canonical, sims bounded, symmetric-free") {
    val rows = Similarity.mutualNnPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be canonical a<b")
      assert(r.getDouble(2) >= -1.0 && r.getDouble(2) <= 1.0)
    }
    val ids = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length == ids.length, "no duplicate pairs")
  }

  test("cohort_ltv: curve is cumulative and internally consistent") {
    val rows = Events.cohortLtv(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getDate(0)).foreach { case (_, cohort) =>
      val sorted = cohort.sortBy(_.getInt(1))
      val ltv = sorted.map(_.getDouble(4))
      assert(ltv.zip(ltv.tail).forall { case (a, b) => b >= a - 1e-9 },
        "per-user LTV must be nondecreasing in week offset")
      assert(sorted.map(_.getLong(2)).distinct.length == 1,
        "cohort size must be constant within a cohort")
    }
  }

  test("kmv_set_ops: identical user sets make intersection = union") {
    val dir = java.nio.file.Files.createTempDirectory("kmvso").toString
    (0 until 400).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        (i % 200).toLong, if (i < 200) "view" else "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.kmvSetOps(spark, dir).collect().head
    assert(r.getLong(2) == 200L && r.getLong(3) == 200L,
      s"exact union/inter must both be 200: $r")
    assert(r.getDouble(4) == r.getDouble(5),
      "identical sketches: est_inter must equal est_union exactly")
  }

  test("kmv_set_ops: fixture estimates are within sketch error") {
    val rows = Events.kmvSetOps(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (eu, ei) = (r.getLong(2), r.getLong(3))
      val (ku, ki) = (r.getDouble(4), r.getDouble(5))
      assert(eu >= ei && ei >= 0)
      assert(ku >= ki - 1e-9 && ki >= 0.0)
      // k=64 ⇒ σ ≈ 12.7%; allow 4σ + Jaccard-share noise
      assert(math.abs(ku - eu) / eu < 0.6, s"union est off: $r")
      if (ei >= 20)
        assert(math.abs(ki - ei) / ei < 1.0, s"inter est off: $r")
    }
  }

  test("rich_club: phi bounded, club monotonically shrinks with k") {
    val rows = Graph.richClub(spark, sf).collect()
    assert(rows.length == 6)
    val byK = rows.map(r =>
      (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    byK.foreach { case (_, n, e, phi) =>
      assert(phi >= 0.0 && phi <= 1.0, s"phi out of [0,1]: $phi")
      if (n > 1) assert(e <= n * (n - 1) / 2, "E_k exceeds complete graph")
    }
    // raising the degree bar can only shrink the club and its edges
    byK.sliding(2).foreach { case Array((_, n1, e1, _), (_, n2, e2, _)) =>
      assert(n2 <= n1 && e2 <= e1)
    }
  }

  test("fairness_audit: rates bounded, gaps match a driver recompute") {
    val rows = Ml.fairnessAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = Tables.documents(spark, sf).count()
    assert(rows.map(_.getLong(1)).sum == nDocs, "per-source n must cover corpus")
    val sel = rows.map(_.getDouble(4))
    assert(sel.forall(r => r >= 0.0 && r <= 1.0))
    val tprs = rows.flatMap(r => Option(r.get(5)).map(_ => r.getDouble(5)))
    val fprs = rows.flatMap(r => Option(r.get(6)).map(_ => r.getDouble(6)))
    assert((tprs ++ fprs).forall(r => r >= 0.0 && r <= 1.0))
    val parity = rows.head.getDouble(7)
    assert(math.abs(parity - (sel.max - sel.min)) < 1e-12)
    val eo = rows.head.getDouble(8)
    val expectEo = math.max(
      if (tprs.nonEmpty) tprs.max - tprs.min else Double.NegativeInfinity,
      if (fprs.nonEmpty) fprs.max - fprs.min else Double.NegativeInfinity)
    assert(math.abs(eo - expectEo) < 1e-12)
    // every row repeats the same board-level gaps
    assert(rows.forall(r => r.getDouble(7) == parity && r.getDouble(8) == eo))
  }

  test("cuped_adjust: perfectly correlated X/Y collapses the arm gap") {
    // every user has one pre-period and one identical post-period event
    // ⇒ Y = X per user ⇒ θ = 1, ρ² = 1, and the adjusted means of both
    // arms coincide at the pooled grand mean
    val dir = java.nio.file.Files.createTempDirectory("cuped").toString
    (1 to 100).flatMap { u =>
      Seq(
        (u.toLong * 2, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          u.toLong, "view", u * 1.5, "{}"),
        (u.toLong * 2 + 1, java.sql.Timestamp.valueOf("2024-01-02 00:00:00"),
          u.toLong, "view", u * 1.5, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = Events.cupedAdjust(spark, dir).collect()
    assert(rows.length == 2)
    assert(rows.forall(r => math.abs(r.getDouble(4) - 1.0) < 1e-9),
      "theta must be 1 when Y = X")
    assert(rows.forall(r => math.abs(r.getDouble(5) - 1.0) < 1e-9),
      "variance reduction must be total when Y = X")
    val adj = rows.map(_.getDouble(3))
    assert(math.abs(adj(0) - adj(1)) < 2e-6,
      s"adjusted means must coincide, got ${adj.mkString(", ")}")
    // and the raw means must NOT coincide (the hash split is uneven
    // in user value) — otherwise the test proves nothing
    val raw = rows.map(_.getDouble(2))
    assert(math.abs(raw(0) - raw(1)) > 1e-6)
  }

  test("cuped_adjust: fixture invariants") {
    val rows = Events.cupedAdjust(spark, sf).collect()
    assert(rows.map(_.getString(0)).sorted.sameElements(Array("a", "b")))
    val (theta, vr) = (rows.head.getDouble(4), rows.head.getDouble(5))
    assert(rows.forall(r => r.getDouble(4) == theta && r.getDouble(5) == vr),
      "pooled stats must repeat on both rows")
    assert(vr >= 0.0 && vr <= 1.0, s"rho^2 out of range: $vr")
    assert(rows.map(_.getLong(1)).sum ==
      Tables.events(spark, sf).filter(col("value").isNotNull)
        .select("user_id").distinct().count())
  }

  test("bootstrap_ci: constant prices give a zero-width interval") {
    val dir = java.nio.file.Files.createTempDirectory("boot").toString
    (1 to 500).map(i => (i.toLong, 42.0))
      .toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.bootstrapCi(spark, dir).collect().head
    assert(r.getLong(0) == 500L)
    assert(r.getDouble(1) == 42.0)
    assert(r.getDouble(2) == 42.0 && r.getDouble(3) == 42.0,
      s"CI must collapse on a constant: [${r.getDouble(2)}, ${r.getDouble(3)}]")
  }

  test("bootstrap_ci: fixture CI brackets the point estimate") {
    val r = Relational.bootstrapCi(spark, sf).collect().head
    val (mean, lo, hi) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    assert(lo <= hi)
    assert(lo <= mean && mean <= hi,
      s"95% CI [$lo, $hi] should bracket the mean $mean at n=${r.getLong(0)}")
    assert(r.getInt(4) == 100)
  }

  test("mahalanobis_outliers: a planted far vector ranks first") {
    val dir = java.nio.file.Files.createTempDirectory("mahal").toString
    val near = (1 to 50).map(i =>
      (i.toLong, Array(1.0f + (i % 5) * 0.01f, (i % 7) * 0.01f), 0))
    val planted = Seq((999L, Array(10.0f, 10.0f), 0))
    (near ++ planted).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.mahalanobisOutliers(spark, dir).collect()
    assert(rows.head.getLong(0) == 999L,
      s"planted outlier must rank first, got ${rows.head}")
    assert(rows.forall(_.getDouble(2) >= 0.0))
    assert(rows.head.getDouble(2) > rows(1).getDouble(2) * 10,
      "the planted vector should dominate the in-distribution scores")
  }

  test("mahalanobis_outliers: fixture scores are finite and sorted") {
    val rows = Similarity.mahalanobisOutliers(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(v => v >= 0.0 && !v.isNaN && !v.isInfinite))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }

  test("conformal_intervals: perfect predictor gives qhat=0, coverage=1") {
    // price is EXACTLY a function of item count ⇒ every residual is 0
    val dir = java.nio.file.Files.createTempDirectory("conf").toString
    val items = (1 to 400).flatMap { k =>
      (1 to (k % 3 + 1)).map(j => (k.toLong, j.toLong))
    }
    items.toDF("l_orderkey", "l_linenumber")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    items.groupBy(_._1).map { case (k, ls) => (k, ls.size * 100.0) }
      .toSeq.toDF("o_orderkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.conformalIntervals(spark, dir).collect().head
    assert(r.getDouble(3) == 0.0, s"qhat must be 0, got ${r.getDouble(3)}")
    assert(r.getDouble(4) == 1.0, s"coverage must be 1, got ${r.getDouble(4)}")
    assert(r.getLong(0) + r.getLong(1) + r.getLong(2) == 400L)
  }

  test("conformal_intervals: fixture coverage is near the 90% target") {
    val r = Relational.conformalIntervals(spark, sf).collect().head
    val cov = r.getDouble(4)
    // finite-sample guarantee: >= 0.9 in expectation; allow sampling slack
    assert(cov >= 0.82 && cov <= 1.0, s"coverage $cov implausible for alpha=0.1")
    assert(r.getDouble(3) > 0.0, "fixture residuals can't all be zero")
  }

  test("lof_audit: a density outlier beside a tight cluster tops the list") {
    val dir = java.nio.file.Files.createTempDirectory("lof").toString
    // 59 vectors tightly packed around [1, 0] + one at 45 degrees:
    // the outlier's neighbors are all dense-cluster members, so its
    // local density is far below theirs => LOF >> 1
    val cluster = (0 until 59).map { i =>
      (i.toLong, Array(1.0f, (i % 10) * 0.001f, (i % 7) * 0.001f), 0)
    }
    val outlier = Seq((999L, Array(0.8f, 0.6f, 0.0f), 0))
    (cluster ++ outlier).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = Similarity.lofAudit(spark, dir).collect()
    assert(rows.head.getLong(0) == 999L,
      s"density outlier must rank first, got ${rows.head}")
    assert(rows.head.getDouble(2) > 1.5,
      s"outlier LOF should be >> 1, got ${rows.head.getDouble(2)}")
    // in-cluster points sit at their neighbors' density: LOF ~ 1
    assert(rows.tail.forall(_.getDouble(2) < rows.head.getDouble(2)))
  }

  test("lof_audit: fixture scores are positive, finite and sorted") {
    val rows = Similarity.lofAudit(spark, sf).collect()
    assert(rows.length == 20)
    val scores = rows.map(_.getDouble(2))
    assert(scores.forall(v => v > 0.0 && !v.isNaN && !v.isInfinite))
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
  }

  test("stream_hll_replay: drained sketch equals the batch estimate") {
    val streamed = graft.streaming.StreamReplay.hllReplay(spark, sf, 4)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val batch = Events.hllErrorAudit(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(streamed == batch,
      s"streamed $streamed must equal batch $batch — register-max merge" +
        " is monotone, batching cannot matter")
  }

  test("stream_anomaly_replay: batching is invisible to the flags") {
    // state carries across micro-batches: a 1-batch drain and a 5-batch
    // drain must flag the exact same events
    val one = graft.streaming.StreamReplay.anomalyReplay(spark, sf, 1)
      .collect().map(_.toString).sorted
    val five = graft.streaming.StreamReplay.anomalyReplay(spark, sf, 5)
      .collect().map(_.toString).sorted
    assert(one.nonEmpty, "fixture should produce some flags")
    assert(one.sameElements(five),
      s"batch count changed the flags: ${one.length} vs ${five.length}")
  }

  test("permutation_test: per-user constants make every gap zero, p=1") {
    val dir = java.nio.file.Files.createTempDirectory("perm").toString
    // 40 users × exactly 5 events of the same value ⇒ every user's
    // total is identical ⇒ every permutation's arm gap is exactly 0
    (0 until 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"),
        (i % 40).toLong, "view", 7.25, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.permutationTest(spark, dir).collect().head
    assert(r.getDouble(2) == 1.0,
      s"all-equal user means must give p=1, got ${r.getDouble(2)}")
  }

  test("permutation_test: fixture p-value is a valid randomization share") {
    val r = Events.permutationTest(spark, sf).collect().head
    val p = r.getDouble(2)
    assert(p >= 0.01 - 1e-9, "p=0 always matches itself, so p >= 1/P")
    assert(p <= 1.0)
    assert(r.getDouble(1) >= 0.0)
    assert(r.getLong(0) ==
      Tables.events(spark, sf).filter(col("value").isNotNull)
        .select("user_id").distinct().count())
  }

  test("fairness_audit: confusion counts are internally consistent") {
    val rows = Ml.fairnessAudit(spark, sf).collect()
    rows.foreach { r =>
      val (n, nSel, nPos) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nSel <= n && nPos <= n)
      // sel_rate is exactly n_sel/n at 6dp
      assert(math.abs(r.getDouble(4) -
        math.rint(nSel.toDouble / n * 1e6) / 1e6) < 1e-9)
    }
  }
}
