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
}
