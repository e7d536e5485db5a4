package graft

import org.apache.spark.sql.functions._
import graft.operators.TextStats

/** Round-5 additions: exercises the Heaps-law fit away from the
  * degenerate constant-vocabulary point the sf fixtures sit at.
  */
class Round5OpsSpec extends SparkSpec {
  import spark.implicits._

  /** 100 docs of 10 tokens each where token j of the corpus is
    * w_floor(sqrt(j)): V(n) ~ sqrt(n), so the fitted Heaps exponent
    * must land near 0.5 — a real slope, not the 0/0 cancellation.
    */
  private lazy val growingDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("heaps").toString
    (0 until 100).map { i =>
      val words = (0 until 10).map { k =>
        val j = i * 10 + k
        // digits spelled as letters: the tokenizer strips non-[a-z]
        // edges, so "w31" would collapse to "w"
        val id = math.sqrt(j.toDouble).toInt.toString
          .map(c => ('a' + (c - '0')).toChar).mkString
        s"w$id"
      }
      (i.toLong, words.mkString(" "))
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("heaps_law: growing vocab gives beta ~ 0.5, exact-int fit parity") {
    val rows = TextStats.heapsLaw(spark, growingDir).collect()
      .sortBy(_.getInt(0))
    assert(rows.length == 10)
    val ns = rows.map(_.getLong(1))
    val vs = rows.map(_.getLong(2))
    assert(ns.zip(ns.tail).forall { case (a, b) => a < b })
    // vocabulary genuinely grows at every checkpoint — the case the
    // sf fixtures (constant 31-type vocab) never reach
    assert(vs.zip(vs.tail).forall { case (a, b) => a < b },
      s"vocab not strictly growing: ${vs.mkString(",")}")
    val beta = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) == beta))
    assert(beta > 0.3 && beta < 0.8, s"V~sqrt(n) corpus fit beta=$beta")
    // independent exact-integer OLS on the returned checkpoints must
    // reproduce the operator's quantized slope bit-for-bit
    def q9(x: Double): BigInt = BigInt(math.floor(x * 1e9 + 0.5).toLong)
    val lx = ns.map(n => q9(math.log(n.toDouble)))
    val ly = vs.map(v => q9(math.log(v.toDouble)))
    val m = BigInt(lx.length)
    val sx = lx.sum; val sy = ly.sum
    val sxy = lx.zip(ly).map { case (a, b) => a * b }.sum
    val sxx = lx.map(a => a * a).sum
    val num = m * sxy - sx * sy
    val den = m * sxx - sx * sx
    val expect =
      math.floor(num.toDouble / den.toDouble * 1e6 + 0.5) / 1e6
    assert(beta == expect, s"got $beta, exact-int fit says $expect")
  }

  test("mode_agg: per-order partial aggregate sits below the join") {
    val p = operators.Relational.modeAgg(spark, sf)
      .queryExecution.executedPlan.toString
    // the hand-pushed partial agg keys on (l_orderkey, l_returnflag)
    // and must print BELOW (= after) the join that consumes it
    val agg = p.indexOf("HashAggregate(keys=[l_orderkey")
    assert(agg >= 0, s"no per-order aggregate below the join:\n$p")
    val join = p.indexOf("Join")
    assert(join >= 0 && join < agg,
      "per-order aggregate must feed the join, not follow it")
    // and the result is unchanged vs the direct join-then-agg shape
    val got = operators.Relational.modeAgg(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val li = Tables.lineitem(spark, sf)
    val od = Tables.orders(spark, sf)
    val naive = li.join(od, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority", $"l_returnflag")
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .groupBy(_._1).map { case (_, rs) =>
        rs.minBy(t => (-t._3, t._2))
      }.toSet
    assert(got == naive)
  }

  test("plan audits: bucketed join exchange-free, AQE coalesces") {
    val b = operators.PlanAudits.bucketedJoinAudit(spark, sf).collect()
    assert(b.length == 1)
    assert(b.head.getAs[Boolean]("exchange_free"),
      s"bucketed join shuffled: ${b.head}")
    assert(b.head.getAs[Boolean]("rows_match_unbucketed"))
    val a = operators.PlanAudits.aqeCoalesceAudit(spark, sf).collect()
    assert(a.length == 1)
    assert(a.head.getAs[Boolean]("aqe_enabled"))
    assert(a.head.getAs[Boolean]("coalesced"), s"no coalescing: ${a.head}")
    assert(a.head.getAs[Long]("n_groups") == 7L)
  }

  test("bpe_iter2: greedy merge application on a hand-checked corpus") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString
    // winning iteration-0 pair is (a,a): "aaa"->[aa,a], "aaaa"->[aa,aa]
    // (greedy left-to-right, the merged symbol can't re-merge as x)
    Seq((0L, "aaa aaaa banana"), (1L, "aaab aa"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = operators.TextStats.bpePairCounts(spark, dir, 1)
      .collect().head.getString(0)
    assert(top == "aa", s"expected (a,a) to win iteration 0, got $top")
    val got = operators.TextStats.bpeIter2Counts(spark, dir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // merged streams: aaa->[aa,a]; aaaa->[aa,aa]; banana->[b,a,n,a,n,a];
    // aaab->[aa,a,b]; aa->[aa] (dropped: single symbol)
    assert(got("aa+a") == 2L, s"got $got")   // from aaa and aaab
    assert(got("aa+aa") == 1L)               // from aaaa
    assert(got("a+b") == 1L)                 // from aaab
    assert(got("a+n") == 2L && got("n+a") == 2L && got("b+a") == 1L)
    assert(!got.contains("a+a"), "greedy merge must leave no (a,a) pair")
  }

  test("ranking_metrics: BM25 length-normalization vs graded ideal") {
    val dir = java.nio.file.Files.createTempDirectory("rank").toString
    // docA: rel 4 (tf 4) but 40 tokens long; docB: rel 2, 4 tokens.
    // BM25 length-normalizes, so B outranks A while the graded ideal
    // puts A first -> best_rank 2, rr 0.5, ndcg < 1. Six short filler
    // docs keep idf positive.
    val fillers = (2 until 8).map(i =>
      (i.toLong, s"f${('a' + i).toChar} fx fy fz"))
    (Seq(
      (0L, ("t " * 4) + (1 to 36).map(j => s"w$j").mkString(" ")),
      (1L, "t t b c")) ++ fillers)
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Index.rankingMetrics(spark, dir)
      .collect().map(r => r.getString(0) -> r).toMap
    val t = rows("t")
    assert(t.getAs[Long]("df") == 2L)
    assert(t.getAs[Int]("best_rank") == 2, s"got $t")
    assert(t.getAs[Double]("rr") == 0.5)
    val ndcg = t.getAs[Double]("ndcg")
    assert(ndcg > 0.0 && ndcg < 1.0, s"expected real degradation: $ndcg")
    // single-posting probe terms are trivially perfect
    rows.values.filter(_.getAs[Long]("df") == 1L).foreach { r =>
      assert(r.getAs[Double]("ndcg") == 1.0 && r.getAs[Double]("rr") == 1.0)
    }
  }

  test("ann_recall: bounded, and exhaustive probing recovers recall 1") {
    val rows = operators.Similarity.annRecall(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall")
      assert(rec >= 0.0 && rec <= 1.0)
      assert(r.getAs[Long]("hits") <= 5L)
    }
    // probing every inverted list IS brute force (same tiebreaks)
    val full = operators.Similarity
      .annRecall(spark, sf, nprobe = 16, numCentroids = 16).collect()
    assert(full.forall(_.getAs[Double]("recall") == 1.0),
      "nprobe == numCentroids must recover the exact top-k")
  }

  test("kmeans_ff_init: farthest-first radii are non-increasing") {
    val rows = operators.Similarity.farthestFirstInit(spark, sf)
      .collect().sortBy(_.getInt(0))
    assert(rows.length == 8)
    assert(rows.head.getInt(0) == 0 && rows.head.getLong(1) == 0L)
    assert(rows.head.isNullAt(2), "seed step has no radius")
    val ids = rows.map(_.getLong(1))
    assert(ids.distinct.length == ids.length, "centroids must be distinct")
    val radii = rows.tail.map(_.getDouble(2))
    // farthest-first theorem: each pick's coverage radius can only shrink
    assert(radii.zip(radii.tail).forall { case (a, b) => a >= b },
      s"radii not monotone: ${radii.mkString(",")}")
    assert(radii.forall(r => r >= 0.0 && r <= 2.0))
  }

  test("sgd model memo: memoized weights equal a fresh sequential train") {
    val fresh = operators.Ml
      .trainSgd(spark, operators.Ml.featurize(spark, sf))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // two memo reads (first may or may not be the populating call —
    // other specs share the session) must both equal the fresh fold
    (1 to 2).foreach { _ =>
      val memo = operators.Ml.trainedModel(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(memo == fresh, "memo must be bit-identical to a fresh train")
    }
  }

  test("chunk_plan: windows tile each doc with exact overlap") {
    val dir = java.nio.file.Files.createTempDirectory("chunk").toString
    // 130 letter-safe tokens -> chunks [0,128] and [96,34]
    val toks130 = (1 to 130).map(j =>
      "t" + j.toString.map(c => ('a' + (c - '0')).toChar)).mkString(" ")
    Seq((0L, toks130), (1L, "one two three"), (2L, "   "))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Curation.chunkPlan(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(rows.toList == List(
      (0L, 0L, 0L, 128L), (0L, 1L, 96L, 34L), (1L, 0L, 0L, 3L)),
      s"got ${rows.toList}")
    // invariants on the real fixture: coverage ends exactly at n,
    // consecutive windows advance by the stride
    val sf01 = operators.Curation.chunkPlan(spark, sf).collect()
      .groupBy(_.getLong(0))
    sf01.values.foreach { cs =>
      val sorted = cs.sortBy(_.getLong(1))
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(b.getLong(2) - a.getLong(2) == 96L)
        assert(a.getLong(2) + a.getLong(3) > b.getLong(2),
          "windows must overlap")
      }
      assert(sorted.init.forall(_.getLong(3) == 128L))
      assert(sorted.last.getLong(3) >= 1L)
    }
  }

  test("heaps_law: constant vocab cancels to beta == 0.0 exactly") {
    val dir = java.nio.file.Files.createTempDirectory("heapsC").toString
    (0 until 100).map(i => (i.toLong, "alpha beta gamma"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextStats.heapsLaw(spark, dir).collect()
    assert(rows.forall(_.getLong(2) == 3L))
    // exact decimal numerator cancels to literal zero — no double noise
    assert(rows.forall(_.getDouble(3) == 0.0))
  }

  test("tokenizer_fertility: punctuation-heavy lang shows fertility > 1") {
    val dir = java.nio.file.Files.createTempDirectory("fert").toString
    // plain: 2 words -> 2 subwords; noisy: 2 words -> 6 subwords
    // ("a.b" -> a . b, "c!" -> c !, "d" -> d)
    Seq((0L, "ab cd", "plain"), (1L, "a.b c! d", "noisy"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.TextStats.tokenizerFertility(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(rows("plain") == ((2L, 2L, 5L, 1.0)))
    val (ws, bpe, ch, fert) = rows("noisy")
    assert(ws == 3L && bpe == 6L && ch == 8L && fert == 2.0)
  }

  test("padding_waste: exact ceil-div layout and utilization identity") {
    val dir = java.nio.file.Files.createTempDirectory("pad").toString
    val toks130 = (1 to 130).map(j =>
      "t" + j.toString.map(c => ('a' + (c - '0')).toChar)).mkString(" ")
    Seq((0L, toks130), (1L, "one two three"), (2L, " "))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.Curation.paddingWaste(spark, dir, Seq(128)).collect()
    assert(r.length == 1)
    val row = r.head
    // ceil(130/128) + ceil(3/128) = 3 sequences, 133 real tokens
    assert(row.getLong(1) == 2L && row.getLong(2) == 133L &&
      row.getLong(3) == 3L && row.getLong(4) == 384L &&
      row.getLong(5) == 251L)
    // invariants on the real fixture: waste + real = padded, and the
    // one-doc-per-sequence utilization never beats a longer context
    val curve = operators.Curation.paddingWaste(spark, sf).collect()
      .sortBy(_.getLong(0))
    curve.foreach { c =>
      assert(c.getLong(5) + c.getLong(2) == c.getLong(4))
      assert(c.getLong(3) >= c.getLong(1))
    }
  }

  test("epoch_plan: repetition cap clamps the hungry source") {
    val dir = java.nio.file.Files.createTempDirectory("epoch").toString
    // tiny source would be replayed ~60x by its α-weight; cap = 4
    val small = (0 until 1).map(i => (i.toLong, "tok tok tok", "tiny"))
    val big = (0 until 200).map(i =>
      ((i + 10).toLong, Seq.fill(40)("w" + ('a' + i % 26).toChar).mkString(" "),
        "big"))
    (small ++ big).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Curation.epochPlan(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val tiny = rows("tiny")
    assert(tiny.getBoolean(5), "tiny source must hit the epoch cap")
    assert(tiny.getLong(4) == tiny.getLong(1) * 4,
      "clamped allocation = 4 epochs of the source")
    assert(tiny.getDouble(6) == 4.0)
    assert(!rows("big").getBoolean(5))
    // the clamp leaves budget unfilled, identically on every row
    val fills = rows.values.map(_.getDouble(7)).toSet
    assert(fills.size == 1 && fills.head < 1.0)
  }

  test("filter_funnel: each stage drops its designed offender") {
    val dir = java.nio.file.Files.createTempDirectory("funnel").toString
    val good = "the quick brown fox jumps over the lazy dog again " * 2
    val short3 = "one two three"
    val singles = Seq.fill(12)("a").mkString(" ")        // mean len 1 < 2
    val nostop = Seq.tabulate(12)(i =>
      "zx" + ('a' + i).toChar).mkString(" ")             // no stopword
    val repet = "the cat " * 20                          // maxf 20 of 40
    Seq((0L, good), (1L, short3), (2L, singles), (3L, nostop), (4L, repet))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Curation.filterFunnel(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(rows(0) == ((5L, 0L)))
    assert(rows(1) == ((4L, 1L)), "short3 drops at min_length")
    assert(rows(2) == ((4L, 0L)))
    assert(rows(3) == ((3L, 1L)), "singles drop at mean word len")
    assert(rows(4) == ((2L, 1L)), "nostop drops at has_stopword")
    assert(rows(5) == ((1L, 1L)), "repetition drops at top-token share")
  }

  test("minhash_est_error: identical docs estimate exactly, errors bounded") {
    val dir = java.nio.file.Files.createTempDirectory("mhe").toString
    val a = "alpha beta gamma delta epsilon zeta"
    Seq((0L, a), (1L, a), (2L, "totally different words here now"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.minhashEstError(spark, dir).collect()
    CacheScope.release(spark)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L)
    assert(r.getDouble(2) == 1.0 && r.getLong(3) == 16L &&
      r.getDouble(4) == 1.0 && r.getDouble(5) == 0.0)
    // fixture-wide: estimates stay within the k=16 resolution band
    val fix = operators.Dedup.minhashEstError(spark, sf).collect()
    CacheScope.release(spark)
    assert(fix.nonEmpty)
    fix.foreach { f =>
      assert(f.getLong(3) >= 0L && f.getLong(3) <= 16L)
      assert(math.abs(f.getDouble(5)) <= 1.0)
    }
    val meanAbs = fix.map(f => math.abs(f.getDouble(5))).sum / fix.length
    assert(meanAbs < 0.15, s"mean |est error| $meanAbs looks broken")
  }

  test("dedup_savings: removed token mass lands on the dup's source") {
    val dir = java.nio.file.Files.createTempDirectory("dsav").toString
    val dup = "alpha beta gamma delta epsilon zeta"
    Seq((0L, dup, "a"), (1L, dup, "a"),
      (2L, "other words entirely unrelated here", "a"),
      (3L, "solo document in source b", "b"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Dedup.dedupSavings(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    CacheScope.release(spark)
    val a = rows("a")
    // doc 1 is the non-canonical copy: 6 tokens of a's 17
    assert(a.getLong(1) == 3L && a.getLong(3) == 1L && a.getLong(4) == 6L)
    assert(a.getDouble(5) == math.floor(6.0 / 17 * 1e6 + 0.5) / 1e6)
    val b = rows("b")
    assert(b.getLong(3) == 0L && b.getDouble(5) == 0.0)
  }

  test("term_burstiness: clumped term scores high, spread term zero") {
    val dir = java.nio.file.Files.createTempDirectory("burst").toString
    val docs = (0 until 10).map { i =>
      val filler = "f" + ('a' + i).toChar
      val extra = if (i == 0) " " + Seq.fill(10)("bursty").mkString(" ")
        else ""
      (i.toLong, s"spread $filler$extra")
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.TextStats.termBurstiness(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // bursty: cf=10, df=1, Σc²=100 → F = 100/10 − 10/10 = 9
    assert(rows("bursty") == ((10L, 1L, 9.0)))
    // spread: one per doc → Poisson-degenerate, F = 10/10 − 10/10 = 0
    assert(rows("spread") == ((10L, 10L, 0.0)))
  }

  test("ngram_diversity: repetition collapses, short docs emit no grams") {
    val dir = java.nio.file.Files.createTempDirectory("ngd").toString
    Seq((0L, "a a a a", "rep"), (1L, "a b c d", "div"), (2L, "x", "short"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.TextStats.ngramDiversity(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(("rep", 1)) == ((4L, 1L, 0.25)))
    assert(rows(("rep", 2))._2 == 1L && rows(("rep", 3))._2 == 1L)
    assert(rows(("div", 1)) == ((4L, 4L, 1.0)))
    assert(rows(("div", 2)) == ((3L, 3L, 1.0)))
    assert(rows(("div", 3)) == ((2L, 2L, 1.0)))
    // a 1-token doc yields no bigrams/trigrams — no padded pseudo-gram
    assert(rows.contains(("short", 1)) && !rows.contains(("short", 2)) &&
      !rows.contains(("short", 3)))
  }

  test("ivf_balance: duplicate centroid yields an empty list, kept") {
    val dir = java.nio.file.Files.createTempDirectory("ivfb").toString
    // centroid 1 duplicates centroid 0, so every argmax tie resolves
    // to centroid 0 and list 1 must surface EMPTY (not vanish)
    Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.6f, 0.8f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = operators.Similarity.ivfBalance(spark, dir, numCentroids = 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(rows(0L) == ((3L, 1.0, 2.0)))
    assert(rows(1L) == ((0L, 0.0, 0.0)))
    // fixture-wide: shares sum to 1, every list accounted for
    val fix = operators.Similarity.ivfBalance(spark, sf).collect()
    assert(fix.length == 16)
    assert(fix.map(_.getLong(1)).sum > 0)
    val shareSum = fix.map(_.getDouble(2)).sum
    assert(math.abs(shareSum - 1.0) < 1e-4)
  }

  test("dedup_bias: band stats reconstruct the corpus-wide rate") {
    val rows = operators.Dedup.dedupBias(spark, sf).collect()
    CacheScope.release(spark)
    assert(rows.length == 3)
    val n = rows.map(_.getLong(1)).sum
    val r = rows.map(_.getLong(2)).sum
    assert(n > 0 && r > 0, "fixture must have near-dups to audit")
    val overall = r.toDouble / n
    rows.foreach { row =>
      val rate = row.getLong(2).toDouble / row.getLong(1)
      assert(math.abs(row.getDouble(3) - rate) < 1e-6)
      assert(math.abs(row.getDouble(4) - rate / overall) < 1e-5,
        "lift must be rate / corpus rate")
    }
  }

  test("rank_agreement: negative-idf BM25 reverses a zero-idf tf-idf tie") {
    val dir = java.nio.file.Files.createTempDirectory("ragree").toString
    // one term in every doc: tf-idf is ln(1)=0 for all (ties -> doc_id
    // order); BM25's idf ln(0.5/3.5) < 0 reverses the saturation order
    Seq((0L, "w w w"), (1L, "w w"), (2L, "w"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Index.rankAgreement(spark, dir).collect()
    CacheScope.release(spark)
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getString(0) == "w" && r.getLong(1) == 3L &&
      r.getDouble(2) == 0.3 && r.getLong(3) == 4L)
    assert(r.getDouble(4) == math.floor(4.0 / 27 * 1e6 + 0.5) / 1e6)
    // disjoint top-10s surface as rows with overlap 0 and NULL divergence
    val fix = operators.Index.rankAgreement(spark, sf).collect()
    CacheScope.release(spark)
    assert(fix.exists(_.getLong(1) == 0L))
    fix.filter(_.getLong(1) == 0L).foreach { f =>
      assert(f.getLong(3) == 0L && f.isNullAt(4))
    }
  }

  test("markov_attribution: hand-solved 3-path chain, exact credits") {
    val dir = java.nio.file.Files.createTempDirectory("markov").toString
    def ts(sec: Long) = new java.sql.Timestamp(1700000000000L + sec * 1000L)
    // u1: click -> purchase; u2: view -> (drop); u3: click -> view -> purchase
    Seq(
      (0L, ts(0), 1L, "click"), (1L, ts(1), 1L, "purchase"),
      (2L, ts(0), 2L, "view"),
      (3L, ts(0), 3L, "click"), (4L, ts(1), 3L, "view"),
      (5L, ts(2), 3L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // closed form: p(view)=1/2, p(click)=3/4, p(start)=2/3;
    // removal effects: click 3/4, view 1/2 -> shares 0.6 / 0.4
    val rows = operators.Events.markovAttribution(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3))).toMap
    assert(rows.keySet == Set("click", "view"))
    assert(rows("click") == ((0.666667, 0.75, 0.6)))
    assert(rows("view") == ((0.666667, 0.5, 0.4)))
  }

  test("stl_decompose: constant series decomposes to exact zeros") {
    val dir = java.nio.file.Files.createTempDirectory("stl").toString
    def ts(day: Int) = new java.sql.Timestamp(1700000000000L +
      day * 86400000L)
    (0 until 14).map(d => (d.toLong, ts(d), 1L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = operators.Events.stlDecompose(spark, dir).collect()
    CacheScope.release(spark)
    assert(rows.length == 14)
    rows.foreach { r =>
      assert(r.getLong(1) == 1L)
      assert(r.getDouble(2) == 1.0 && r.getDouble(3) == 0.0 &&
        r.getDouble(4) == 0.0)
    }
    // real fixture: the decomposition identity holds on the 1e-6 grid
    val fix = operators.Events.stlDecompose(spark, sf).collect()
    CacheScope.release(spark)
    assert(fix.nonEmpty)
    fix.foreach { r =>
      val recon = r.getDouble(2) + r.getDouble(3) + r.getDouble(4)
      assert(math.abs(recon - r.getLong(1)) < 1e-6,
        s"trend+seasonal+residual must reconstruct total, got $recon")
    }
  }

  test("int8_recall: well-separated directions survive quantization") {
    val dir = java.nio.file.Files.createTempDirectory("i8r").toString
    // 12 unit-ish 2D directions 25 degrees apart: inter-vector cosine
    // gaps (>= 0.09) dwarf the int8 grid error (<= ~0.006), so the
    // quantized ranking must equal the exact one on every query
    val vecs = (0 until 12).map { i =>
      val a = math.toRadians(25.0 * i)
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat), 0)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = operators.Similarity.int8Recall(spark, dir).collect()
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getDouble(2) == 1.0,
      s"query ${r.getLong(0)} lost recall under int8"))
    // real fixture: bounded, and the index is not garbage
    val fix = operators.Similarity.int8Recall(spark, sf).collect()
    assert(fix.length == 10)
    fix.foreach(r => assert(r.getLong(1) >= 0L && r.getLong(1) <= 5L))
    val mean = fix.map(_.getDouble(2)).sum / fix.length
    assert(mean >= 0.6, s"mean int8 recall $mean looks broken")
  }

  test("cv_metrics: separable corpus scores held-out AUC 1 on every fold") {
    val dir = java.nio.file.Files.createTempDirectory("cv").toString
    // disjoint vocab per class: every fold's held-out ranking separates
    val docs = (0 until 12).map { i =>
      if (i % 2 == 0) (i.toLong, "aaa aaa aaa", "en")
      else (i.toLong, "bbb bbb bbb", "de")
    }
    docs.toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Ml.cvMetrics(spark, dir).collect()
    CacheScope.release(spark)
    assert(rows.length == 3)
    assert(rows.map(_.getLong(1)).sum == 12L)
    rows.foreach { r =>
      assert(r.getLong(2) > 0L && r.getLong(2) < r.getLong(1))
      assert(r.getDouble(3) == 1.0,
        s"fold ${r.getInt(0)} held-out AUC ${r.getDouble(3)}")
    }
    // real fixture: folds partition the corpus, AUC stays a probability
    val fix = operators.Ml.cvMetrics(spark, sf).collect()
    CacheScope.release(spark)
    assert(fix.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$sf/documents.parquet").count())
    fix.foreach(r => assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
  }

  test("welch_ttest: identical samples t=0, shifted samples exact t") {
    val dir = java.nio.file.Files.createTempDirectory("welch").toString
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    val a = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      (i.toLong, ts(i), 1L, "a", v) }
    val b = Seq(1.0, 2.0, 3.0).zipWithIndex.map { case (v, i) =>
      ((i + 10).toLong, ts(i), 1L, "b", v) }
    val c = Seq(101.0, 102.0, 103.0).zipWithIndex.map { case (v, i) =>
      ((i + 20).toLong, ts(i), 1L, "c", v) }
    (a ++ b ++ c).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = operators.Events.welchTtest(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val ab = rows(("a", "b"))
    assert(ab.getDouble(4) == 2.0 && ab.getDouble(5) == 2.0)
    assert(ab.getDouble(6) == 0.0, "identical samples must give t = 0")
    assert(ab.getDouble(7) == 4.0, "equal-variance n=3 Welch df is 4")
    val ac = rows(("a", "c"))
    // -100 / sqrt(2/3), quantized on the 1e-6 grid
    assert(ac.getDouble(6) ==
      math.floor(-100.0 / math.sqrt(2.0 / 3) * 1e6 + 0.5) / 1e6)
  }

  test("betweenness_sample: matches driver-side Brandes on the grid") {
    val e = operators.Graph.customerSupplierEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    val maxHops = 4
    val bc = scala.collection.mutable.Map.empty[Long, Long]
    for (src <- Seq(1L, 2L, 3L)) {
      var dist = Map(src -> 0)
      var sigma = Map(src -> 1L)
      var frontier = Seq(src)
      val levels = scala.collection.mutable.Map(0 -> frontier)
      for (h <- 1 to maxHops) {
        val contrib = scala.collection.mutable.Map.empty[Long, Long]
        for (u <- frontier; v <- adj.getOrElse(u, Array.empty[Long])
             if !dist.contains(v))
          contrib(v) = contrib.getOrElse(v, 0L) + sigma(u)
        dist ++= contrib.keys.map(_ -> h)
        sigma ++= contrib
        frontier = contrib.keys.toSeq
        levels(h) = frontier
      }
      var delta = levels(maxHops).map(_ -> 0L).toMap
      for (lvl <- (maxHops - 1) to 0 by -1) {
        val nd = scala.collection.mutable.Map.empty[Long, Long]
        for (v <- levels(lvl)) {
          var acc = 0L
          for (w <- adj.getOrElse(v, Array.empty[Long])
               if dist.get(w).contains(lvl + 1))
            acc += math.floor(sigma(v).toDouble / sigma(w) *
              (1000000000L + delta(w)) + 0.5).toLong
          nd(v) = acc
        }
        delta = nd.toMap
        for ((v, d) <- nd if v != src)
          bc(v) = bc.getOrElse(v, 0L) + d
      }
    }
    val want = bc.toMap.map { case (id, b) =>
      id -> math.floor(b.toDouble / 1e9 * 1e6 + 0.5) / 1e6
    }
    val got = operators.Graph
      .betweennessSample(spark, sf, k = 1000000).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    CacheScope.release(spark)
    assert(got.size == want.size)
    assert(got == want)
  }

  test("modularity: matches driver-side Newman Q over the same labels") {
    val e = operators.Graph.customerSupplierEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = e.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2) }
    var lbl = adj.keys.map(id => id -> id).toMap
    for (_ <- 1 to 3) {
      lbl = adj.map { case (id, nbrs) =>
        val counts = nbrs.map(lbl).groupBy(identity)
          .map { case (l, xs) => l -> xs.length }
        // modal label, ties to the smallest label (cnt DESC, lbl ASC)
        id -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val de = e.length.toLong
    val inc = e.filter { case (u, v) => lbl(u) == lbl(v) }
      .groupBy { case (u, _) => lbl(u) }.map { case (l, xs) => l -> xs.length.toLong }
    val dc = e.groupBy { case (u, _) => lbl(u) }
      .map { case (l, xs) => l -> xs.length.toLong }
    val qsum = dc.map { case (l, d) =>
      val i = inc.getOrElse(l, 0L)
      math.floor((i.toDouble / de -
        (d.toDouble / de) * (d.toDouble / de)) * 1e12 + 0.5).toLong
    }.sum
    val wantQ = math.floor(qsum.toDouble / 1e12 * 1e6 + 0.5) / 1e6
    val row = operators.Graph.modularity(spark, sf).collect().head
    CacheScope.release(spark)
    assert(row.getLong(0) == dc.size.toLong)
    assert(row.getLong(1) == de / 2)
    assert(row.getDouble(2) == wantQ,
      s"got ${row.getDouble(2)}, driver-side Q is $wantQ")
  }

  test("l_diversity: k-anonymous but value-homogeneous class is caught") {
    val dir = java.nio.file.Files.createTempDirectory("ldiv").toString
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    // class A: 10 users, values spread across deciles (diverse);
    // class B: 3 users who ALL share one extreme value — k-anonymity
    // with k=3 passes it, l-diversity must not
    val a = (1 to 10).map(u =>
      (u.toLong, ts(u), u.toLong, "view", u * 10.0))
    val b = (11 to 13).map(u =>
      ((u + 100).toLong, ts(u), u.toLong, "click", 999.0))
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = operators.Events.lDiversity(spark, dir).collect().head
    CacheScope.release(spark)
    assert(row.getLong(0) == 2L, s"expected 2 QI classes: $row")
    assert(row.getLong(1) == 1L, "the homogeneous class must be flagged")
    assert(row.getLong(2) == 1L, "its distinct-sensitive count is 1")
    assert(row.getDouble(3) ==
      math.floor(3.0 / 13 * 1e6 + 0.5) / 1e6)
    // real fixture: uniform synthetic values are fully diverse — the
    // audit's zero finding is itself exact
    val fix = operators.Events.lDiversity(spark, sf).collect().head
    CacheScope.release(spark)
    assert(fix.getLong(1) == 0L && fix.getDouble(3) == 0.0)
  }

  test("kaplan_meier: hand-computed curve with censoring") {
    val dir = java.nio.file.Files.createTempDirectory("km").toString
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2024-01-${day + 1}%02d").getTime + 3600000L)
    // u1: enters d0, purchase d2 (t=2 death); u2: enters d0, never
    // purchases (censored at horizon d5, t=5); u3: first event IS a
    // purchase (t=0 death); u4: enters d0, purchase d5 (t=5 death)
    val rows = Seq(
      (1L, ts(0), 1L, "view", 1.0), (2L, ts(2), 1L, "purchase", 1.0),
      (3L, ts(0), 2L, "view", 1.0), (4L, ts(3), 2L, "click", 1.0),
      (5L, ts(1), 3L, "purchase", 1.0),
      (6L, ts(0), 4L, "view", 1.0), (7L, ts(5), 4L, "purchase", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Events.kaplanMeier(spark, dir).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5))))
    CacheScope.release(spark)
    val m = got.toMap
    assert(got.map(_._1).toSeq == Seq(0L, 2L, 5L))
    assert(m(0L)._1 == 4L && m(0L)._2 == 1L && m(0L)._3 == 0L)
    assert(m(2L)._1 == 3L && m(2L)._2 == 1L)
    assert(m(5L)._1 == 2L && m(5L)._2 == 1L && m(5L)._3 == 1L)
    // survival drops 3/4 → 1/2 → 1/4 — EXACT on the integer s6 chain
    // (750000·2/3 = 500000, 500000·1/2 = 250000; clean fractions)
    assert(m(0L)._4 == 0.75)
    assert(m(2L)._4 == 0.5)
    assert(m(5L)._4 == 0.25)
    // fixture sanity: survival is non-increasing in t
    val fix = operators.Events.kaplanMeier(spark, sf).collect()
      .map(_.getDouble(5))
    CacheScope.release(spark)
    assert(fix.zip(fix.tail).forall { case (a, b) => b <= a })
  }

  test("holt_forecast: exact tracking on a perfectly linear series") {
    val dir = java.nio.file.Files.createTempDirectory("holt").toString
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2024-01-${day + 1}%02d").getTime + 60000L)
    // x_t = 10 + 2t: Holt's level locks to x_t and trend to exactly 2
    // from step 2 on, so fits and forecasts are exact integers
    val rows = (0 until 10).map(d =>
      (d.toLong, ts(d), 1L, "view", 10.0 + 2 * d))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Events.holtForecast(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double]), r.getDouble(3)))
    CacheScope.release(spark)
    assert(got.length == 17)
    val inS = got.filter(_._2 == 0L)
    // one-step-ahead fit equals the actual from day 2 onward
    inS.drop(2).foreach { case (d, _, a, f) =>
      assert(a.contains(10.0 + 2 * d) && f == 10.0 + 2 * d) }
    val fc = got.filter(_._2 > 0L)
    fc.foreach { case (d, h, a, f) =>
      assert(d == 9 + h && a.isEmpty && f == 10.0 + 2 * d) }
  }

  test("pca_power: rank-1 corpus recovers its generating direction") {
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    // x_k = k·(0.6, 0.8, 0, …): covariance is rank one, so the top
    // component IS (0.6, 0.8, 0, …) and it explains all the variance
    val rows = (-5 to 5).map { k =>
      val v = Array.fill(8)(0.0f)
      v(0) = (k * 0.6).toFloat; v(1) = (k * 0.8).toFloat
      (k.toLong + 10, v.toSeq, 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = operators.Similarity.pcaPower(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    CacheScope.release(spark)
    assert(math.abs(got(0)._2 - 0.6) < 1e-4)
    assert(math.abs(got(1)._2 - 0.8) < 1e-4)
    got.drop(2).foreach(r => assert(math.abs(r._2) < 1e-4))
    assert(math.abs(got.head._3 - 1.0) < 1e-4, s"share ${got.head._3}")
  }

  test("isotonic_calibration: matches a sequential PAV and is monotone") {
    val rows = operators.Ml.isotonicCalibration(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    CacheScope.release(spark)
    // monotone non-decreasing in bin
    val iso = rows.map(_._4)
    assert(iso.zip(iso.tail).forall { case (a, b) => b >= a }, iso.toSeq)
    // classic pool-adjacent-violators on the same (weight, rate) bins
    // must agree with the closed-form window lattice
    val pav = scala.collection.mutable.ArrayBuffer
      .empty[(Double, Double)] // (weight, value)
    rows.foreach { case (_, n, rate, _) =>
      pav += ((n.toDouble, rate))
      while (pav.length >= 2 && pav(pav.length - 2)._2 > pav.last._2) {
        val (w2, v2) = pav.remove(pav.length - 1)
        val (w1, v1) = pav.remove(pav.length - 1)
        pav += ((w1 + w2, (w1 * v1 + w2 * v2) / (w1 + w2)))
      }
    }
    val expanded = pav.flatMap { case (w, v) =>
      Seq.fill(math.round(w).toInt)(v) }
    val gotExpanded = rows.flatMap { case (_, n, _, i) =>
      Seq.fill(n.toInt)(i) }
    assert(expanded.length == gotExpanded.length)
    expanded.zip(gotExpanded).foreach { case (e, g) =>
      assert(math.abs(e - g) < 1e-4, s"PAV $e vs lattice $g") }
  }

  test("hashing_collisions: load histogram conserves buckets and vocab") {
    val rows = operators.Ml.hashingCollisions(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    CacheScope.release(spark)
    assert(rows.map(_._2).sum == 10007L, "bucket count conserved")
    val vocab = rows.map(r => r._1 * r._2).sum
    assert(vocab > 0)
    // token shares sum to 1 (each token sits at exactly one load)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
  }

  test("textrank_keywords: hub token wins; rank mass is conserved") {
    val dir = java.nio.file.Files.createTempDirectory("trank").toString
    // "hub" is adjacent to four distinct words, each of them only to
    // hub — the co-occurrence star graph where the center must rank top
    Seq((1L, "hub aa"), (2L, "hub bb"), (3L, "hub cc"), (4L, "hub dd"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = operators.Cooccur.textrank(spark, dir).collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    CacheScope.release(spark)
    assert(got.head._1 == "hub", got.toSeq)
    // no dangling nodes → every round preserves total rank mass 1
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-6)
    assert(got.tail.map(_._2).distinct.length == 1,
      "the four leaves are symmetric and must tie exactly")
  }

  test("cusum_changepoint: locates a clean level shift") {
    val dir = java.nio.file.Files.createTempDirectory("cusum").toString
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2024-01-${day + 1}%02d").getTime + 60000L)
    // 10,10,10,20,20,20: C_t = (-5,-10,-15,-10,-5,0)·1 ⇒ the max-|C|
    // split is after day 2, exactly the shift boundary
    val rows = (0 until 6).map(d =>
      (d.toLong, ts(d), 1L, "view", if (d < 3) 10.0 else 20.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = operators.Events.cusumChangepoint(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    CacheScope.release(spark)
    assert(got.map(_._2).toSeq ==
      Seq(-5.0, -10.0, -15.0, -10.0, -5.0, 0.0))
    assert(got.filter(_._3).map(_._1).toSeq == Seq(2L))
  }

  test("rrf_fusion: docs on both ranked lists dominate single-list docs") {
    val rows = operators.Index.rrfFusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    CacheScope.release(spark)
    // per term: ranks are 1..≤10 and rrf is non-increasing
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1L to g.length).toSeq)
      val vs = sorted.map(_._4)
      assert(vs.zip(vs.tail).forall { case (a, b) => b <= a })
    }
    // K=60, k=10: worst both-lists score 2/70 beats best single-list
    // score 1/61, so every two-ranker doc must outrank one-ranker docs
    val thresh = 2.0 / 70
    rows.groupBy(_._1).foreach { case (_, g) =>
      val ranks = g.sortBy(_._3).map(_._4)
      val firstSingle = ranks.indexWhere(_ < thresh - 1e-9)
      if (firstSingle >= 0)
        assert(ranks.drop(firstSingle).forall(_ < thresh - 1e-9))
    }
  }

  test("theil_sen: one wild outlier day cannot move the median slope") {
    val dir = java.nio.file.Files.createTempDirectory("tsen").toString
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2024-01-${day + 1}%02d").getTime + 60000L)
    // x_t = 5 + 3t with day 5 replaced by 1000: 36 of 45 pairwise
    // slopes are exactly 3, so the median is 3 and the median
    // residual (intercept) is 5 — OLS would be dragged far off both
    val rows = (0 until 10).map { d =>
      val v = if (d == 4) 1000.0 else 5.0 + 3 * (d + 1)
      (d.toLong, ts(d), 1L, "view", v)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = operators.Events.theilSen(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(0) == 10L && r.getLong(1) == 45L)
    assert(r.getDouble(2) == 3.0, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) == 5.0, s"intercept ${r.getDouble(3)}")
  }

  test("ks_statistic: agrees with a driver-side scan of the scored set") {
    val scored = operators.Ml.applyQuery(spark, sf).collect()
      .map(r => (r.getDouble(2), r.getDouble(1)))
    val got = operators.Ml.ksStatistic(spark, sf).collect().head
    CacheScope.release(spark)
    val byS = scored.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (s0, g) =>
        (s0, g.count(_._2 == 1.0).toLong, g.count(_._2 == 0.0).toLong) }
    val np = byS.map(_._2).sum
    val nn = byS.map(_._3).sum
    var (cp, cn, best, bestS) = (0L, 0L, -1L, Double.MaxValue)
    byS.foreach { case (s0, p, n) =>
      cp += p; cn += n
      val gap = math.abs(cp * nn - cn * np)
      if (gap > best) { best = gap; bestS = s0 }
    }
    val ks = math.floor(best.toDouble / (np.toDouble * nn) * 1e6
      + 0.5) / 1e6
    assert(got.getDouble(0) == ks)
    assert(got.getDouble(1) == bestS)
    assert(got.getLong(2) == np && got.getLong(3) == nn)
  }

  test("knn_label_consistency: flags exactly the planted mislabel") {
    val dir = java.nio.file.Files.createTempDirectory("knnlc").toString
    // two well-separated clusters; vec 23 sits in cluster 0's region
    // but carries label 1 — the only vector whose neighborhood
    // majority disagrees with its label
    def vec(axis: Int, i: Int): Seq[Float] = {
      val v = Array.fill(8)(0.0f)
      v(axis) = 1.0f; v(2 + (i % 3)) = 0.01f * (i + 1)
      v.toSeq
    }
    val a = (0 until 12).map(i => (i * 2L, vec(0, i), 0))
    val b = (0 until 11).map(i => (i * 2L + 1, vec(1, i), 1))
    val planted = Seq((23L, vec(0, 20), 1))
    (a ++ b ++ planted).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = operators.Similarity.knnLabelConsistency(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3))).toMap
    CacheScope.release(spark)
    assert(got(0L)._1 == 12L && got(0L)._3 == 0.0,
      s"cluster 0 clean: ${got(0L)}")
    assert(got(1L)._1 == 12L)
    assert(got(1L)._3 == math.floor(1.0 / 12 * 1e6 + 0.5) / 1e6,
      s"exactly the planted point flagged: ${got(1L)}")
  }

  test("gains_table: capture is monotone to 1.0 and mass conserves") {
    val rows = operators.Ml.gainsTable(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    CacheScope.release(spark)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val caps = rows.map(_._4)
    assert(caps.zip(caps.tail).forall { case (a, b) => b >= a })
    assert(caps.last == 1.0 && rows.last._5 == 1.0)
    assert(rows.map(_._2).sum == rows.map(_._2).sum)
    // a better-than-random classifier front-loads positives
    assert(rows.head._5 >= 1.0)
  }

  test("forecast_backtest: Holt is exact on a linear series (MASE 0)") {
    val dir = java.nio.file.Files.createTempDirectory("fbt").toString
    def ts(day: Int) = new java.sql.Timestamp(
      java.sql.Date.valueOf(f"2024-01-${day + 1}%02d").getTime + 60000L)
    val rows = (0 until 10).map(d =>
      (d.toLong, ts(d), 1L, "view", 10.0 + 2 * d))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = operators.Events.forecastBacktest(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 0.0, s"holt MAE ${r.getDouble(1)}")
    assert(r.getDouble(2) == 2.0, "naive-1 error is the slope")
    assert(r.getDouble(3) == 14.0, "seasonal-7 error is 7 slopes")
    assert(r.getDouble(4) == 0.0 && r.getDouble(5) == 7.0)
  }

  test("silhouette_labels: separated clusters score near 1, no misfits") {
    val dir = java.nio.file.Files.createTempDirectory("silh").toString
    def vec(axis: Int, i: Int): Seq[Float] = {
      val v = Array.fill(8)(0.0f)
      v(axis) = 1.0f; v(2 + (i % 3)) = 0.01f * (i + 1)
      v.toSeq
    }
    val rows = (0 until 12).map(i => (i * 2L, vec(0, i), 0)) ++
      (0 until 12).map(i => (i * 2L + 1, vec(1, i), 1))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = operators.Similarity.silhouetteLabels(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3)))
    CacheScope.release(spark)
    assert(got.length == 2)
    got.foreach { case (_, n, s0, mis) =>
      assert(n == 12L && s0 > 0.8 && mis == 0.0, (n, s0, mis))
    }
  }

  test("hill_tail_index: matches a driver-side replay of the estimator") {
    val got = operators.Graph.hillTailIndex(spark, sf).collect().head
    val degs = operators.Graph.customerSupplierEdges(spark, sf)
      .groupBy("src").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    CacheScope.release(spark)
    val top = degs.sortBy { case (id, d) => (-d, id) }.take(50).map(_._2)
    val dmin = top.min
    val sl = top.map(d =>
      math.floor(math.log(d.toDouble / dmin) * 1e9 + 0.5).toLong).sum
    val alpha = if (sl > 0)
      math.floor(50.0 / (sl.toDouble / 1e9) * 1e6 + 0.5) / 1e6 else 0.0
    assert(got.getLong(0) == 50L)
    assert(got.getLong(1) == dmin)
    assert(got.getDouble(2) == alpha)
  }

  test("dedup_threshold_sweep: a j=0.6 pair drops out above 0.6") {
    val dir = java.nio.file.Files.createTempDirectory("dts").toString
    // A and B share 3 of 5 distinct shingles → Jaccard exactly 0.6;
    // C is unrelated
    Seq((1L, "a b c d e f"), (2L, "a b c d e g"),
        (3L, "q r s t u v"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = operators.Dedup.dedupThresholdSweep(spark, dir).collect()
      .map(r => r.getDouble(0) -> (r.getLong(1), r.getLong(2))).toMap
    CacheScope.release(spark)
    assert(m(0.5) == ((1L, 2L)) && m(0.6) == ((1L, 2L)), m)
    assert(m(0.7) == ((0L, 0L)) && m(0.9) == ((0L, 0L)), m)
  }

  test("spearman_corr: perfectly monotone length–quality gives rho 1") {
    val dir = java.nio.file.Files.createTempDirectory("spear").toString
    // all-stopword docs of distinct lengths < 100: quality = n/100,
    // strictly increasing in length → Spearman exactly 1
    (1 to 10).map(n => (n.toLong, Seq.fill(n)("the").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextStats.spearmanCorr(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(0) == 10L)
    assert(r.getDouble(1) == 1.0, s"rho ${r.getDouble(1)}")
  }

  test("countmin_audit: est >= exact always; wide vocab collides") {
    val dir = java.nio.file.Files.createTempDirectory("cm").toString
    // 2000 singleton tokens + one hot term: width 256 forces cell
    // sharing, so the hot term's estimate absorbs colliders. Token
    // ids spell digits as letters — the tokenizer strips non-[a-z]
    def w(n: Int) =
      "w" + n.toString.map(c => ('a' + (c - '0')).toChar)
    val docs = (0 until 200).map { i =>
      val toks = (0 until 10).map(j => w(i * 10 + j)) :+ "hot"
      (i.toLong, toks.mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.TextStats.countMinAudit(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    CacheScope.release(spark)
    assert(rows.length == 20)
    rows.foreach { case (t, ex, est, over) =>
      assert(est >= ex, s"CM guarantee violated for $t")
      assert(over == est - ex)
    }
    assert(rows.head._1 == "hot" && rows.head._2 == 200L)
    // 2001 terms into 256 cells: collisions are certain somewhere
    assert(rows.map(_._4).sum > 0, "expected at least one overestimate")
  }

  test("bloom_fpr_audit: loaded filter shows real false positives") {
    val dir = java.nio.file.Files.createTempDirectory("bloom").toString
    def w(n: Int) =
      "w" + n.toString.map(c => ('a' + (c - '0')).toChar)
    val docs = (0 until 300).map { i =>
      (i.toLong, (0 until 10).map(j => w(i * 10 + j)).mkString(" "))
    }
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = operators.TextStats.bloomFprAudit(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(0) == 3000L)
    assert(r.getLong(1) > 0L)
    val (fpr, theory) = (r.getDouble(3), r.getDouble(4))
    // 3000 keys × 3 hashes into 4096 bits: theory ≈ 0.5; the affine
    // family is imperfect, so only band-check the measurement
    assert(theory > 0.3 && theory < 0.8, s"theory $theory")
    assert(r.getLong(2) > 0L && fpr > 0.1 && fpr <= 1.0, s"fpr $fpr")
  }

  test("hll_error_audit: estimate lands within sketch error bounds") {
    val dir = java.nio.file.Files.createTempDirectory("hll").toString
    def ts(i: Int) = new java.sql.Timestamp(1700000000000L + i * 1000L)
    val rows = (1 to 5000).map(u =>
      (u.toLong, ts(u), u.toLong, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = operators.Events.hllErrorAudit(spark, dir).collect().head
    CacheScope.release(spark)
    assert(r.getLong(1) == 5000L)
    // m=16 registers → σ ≈ 26%; band-check at ±2.5σ
    val err = r.getDouble(3)
    assert(math.abs(err) < 0.65, s"rel_err $err outside sketch bounds")
    assert(r.getDouble(2) > 0.0)
  }

  test("eval_alloc: zero-variance stratum gets zero eval quota") {
    val dir = java.nio.file.Files.createTempDirectory("neyman").toString
    val flat = (0 until 10).map(i => (i.toLong, "one two three", "flat"))
    val wide = Seq((100L, "a b", "wide"),
      (101L, Seq.fill(10)("w").mkString(" "), "wide"))
    (flat ++ wide).toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = operators.Curation.evalAlloc(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val f = rows("flat")
    assert(f.getDouble(3) == 0.0 && f.getDouble(4) == 0.0 &&
      f.getLong(5) == 0L)
    val w = rows("wide")
    // lengths 2 and 10: mean 6, population std exactly 4
    assert(w.getDouble(2) == 6.0 && w.getDouble(3) == 4.0)
    assert(w.getDouble(4) == 1.0 && w.getLong(5) == 100L)
  }
}
