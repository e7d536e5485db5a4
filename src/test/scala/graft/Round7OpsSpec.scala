package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, TextStats}

/** Brute-force in-memory oracles for the round-7 operator batch
  * (crawl-slice novelty, SimHash radius sweep, tail-token mass,
  * quality drift). The driver hash-checks values against DuckDB;
  * these pin semantics on the tiny fixture without DuckDB.
  */
class Round7OpsSpec extends SparkSpec {

  /** (doc_id, shingle) occurrences exactly as ngramNovelty sees them. */
  private def shingleOcc(): Array[(Long, String)] =
    Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(array_distinct(Dedup.shingles(
          graft.functions.TextFns.tokenize(col("text")), 3))).as("sh"))
      .collect().map(r => (r.getLong(0), r.getString(1)))

  test("ngram_novelty: matches driver-side first-occurrence fold") {
    val occ = shingleOcc()
    val lo = occ.map(_._1).min
    val hi = occ.map(_._1).max
    val first = occ.groupBy(_._2).map { case (sh, xs) =>
      sh -> xs.map(_._1).min
    }
    def slice(id: Long): Long =
      math.min(10L * (id - lo) / (hi - lo + 1), 9L)
    val bySlice = occ.groupBy { case (id, _) => slice(id) }
    val want = (0L to 9L).map { sl =>
      val xs = bySlice.getOrElse(sl, Array.empty[(Long, String)])
      val nNovel = xs.count { case (id, sh) => first(sh) == id }
      (sl, xs.map(_._1).distinct.length.toLong, xs.length.toLong,
        nNovel.toLong)
    }
    val got = TextStats.ngramNovelty(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want)
    // occurrence-mass invariant: every distinct shingle is novel exactly
    // once, so the novel column sums to the distinct-shingle count
    assert(got.map(_._4).sum == first.size)
  }

  test("ngram_novelty: novelty_rate is the quantized ratio") {
    val rows = TextStats.ngramNovelty(spark, sf).collect()
    rows.foreach { r =>
      val (occ, novel, rate) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      val want = if (occ == 0) 0.0
        else math.floor(novel.toDouble / occ * 1e6 + 0.5) / 1e6
      assert(rate == want, s"slice ${r.getLong(0)}")
    }
  }

  test("simhash_radius_sweep: matches the pair set's distance histogram") {
    val dists = Dedup.simhashPairs(spark, sf, 3).collect()
      .map(_.getInt(2))
    val got = Dedup.simhashRadiusSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    got.foreach { case (r, cum, at) =>
      assert(cum == dists.count(_ <= r), s"radius $r cumulative")
      assert(at == dists.count(_ == r), s"radius $r exact")
    }
    // cumulative counts are monotone and end at the full pair set
    assert(got.map(_._2).toSeq == got.map(_._2).sorted.toSeq)
    assert(got.last._2 == dists.length)
  }

  test("tail_token_mass: matches driver-side head-set computation") {
    val toks = Tables.documents(spark, sf)
      .select(col("lang"),
        explode(graft.functions.TextFns.tokenize(col("text"))).as("t"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val counts = toks.groupBy(_._2).map { case (t, xs) =>
      t -> xs.length.toLong
    }
    val top = counts.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(1000).map(_._1).toSet
    val want = toks.groupBy(_._1).map { case (lang, xs) =>
      val tail = xs.count(x => !top.contains(x._2)).toLong
      lang -> (xs.length.toLong, tail)
    }
    val got = TextStats.tailTokenMass(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, tail) = want(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == tail, r.getString(0))
      assert(r.getDouble(3) ==
        math.floor(tail.toDouble / n * 1e6 + 0.5) / 1e6)
    }
  }

  test("quality_drift: matches driver-side quarter means and drift sign") {
    val q6 = TextStats.quality(spark, sf)
      .select(col("doc_id"),
        floor(col("quality") * lit(1e6) + lit(0.5)).cast("long").as("q6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val srcs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, _) => q6.contains(id) }
    val lo = srcs.map(_._1).min
    val hi = srcs.map(_._1).max
    def quarter(id: Long): Long =
      math.min(4L * (id - lo) / (hi - lo + 1), 3L)
    val want = srcs.groupBy(_._2).map { case (src, xs) =>
      val firstQ = xs.filter(x => quarter(x._1) == 0L)
      val lastQ = xs.filter(x => quarter(x._1) == 3L)
      def mean(q: Array[(Long, String)]): Double =
        if (q.isEmpty) 0.0
        else math.floor(q.map(x => q6(x._1)).sum.toDouble / q.length /
          1e6 * 1e6 + 0.5) / 1e6
      src -> (xs.length.toLong, firstQ.length.toLong, lastQ.length.toLong,
        mean(firstQ), mean(lastQ))
    }
    val got = TextStats.qualityDrift(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, nf, nl, mf, ml) = want(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((n, nf, nl)),
        r.getString(0))
      assert(r.getDouble(4) == mf && r.getDouble(5) == ml, r.getString(0))
      assert(r.getDouble(6) ==
        math.floor((ml - mf) * 1e6 + 0.5) / 1e6, r.getString(0))
    }
  }

  test("lsh_band_sweep: prefix-filtered truth equals the unpruned join") {
    // the W494 truth stage now rides the W172 lossless prefix filter;
    // recall at 16 bands over the 16-hash signature must still be
    // computed against the SAME exact-Jaccard truth the unpruned
    // shared-shingle self-join produced — pin n_true to the exact
    // integer-threshold pair count computed brute-force
    val occ = shingleOcc()
    val byDoc = occ.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(_._2).toSet
    }
    val docs = byDoc.keys.toArray.sorted
    var nTrue = 0L
    for {
      i <- docs.indices
      j <- (i + 1) until docs.length
      a = byDoc(docs(i)); b = byDoc(docs(j))
      inter = (a & b).size
      if inter > 0 && inter * 100L >= (a.size + b.size - inter) * 80L
    } nTrue += 1
    val got = Dedup.lshBandSweep(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(3) == nTrue, "n_true"))
  }

  test("residual_dup_audit: matches driver-side closure + survivor count") {
    val occ = shingleOcc()
    val byDoc = occ.groupBy(_._1).map { case (id, xs) =>
      id -> xs.map(_._2).toSet
    }
    val docs = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val ids = byDoc.keys.toArray.sorted
    def pairsAt(t: Double): Seq[(Long, Long)] = for {
      i <- ids.indices
      j <- (i + 1) until ids.length
      a = byDoc(ids(i)); b = byDoc(ids(j))
      inter = (a & b).size.toDouble
      if inter / (a.size + b.size - inter) >= t
    } yield (ids(i), ids(j))
    // union-find over the 0.8 pairs; canonical = component min
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairsAt(0.8).foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val losers = docs.filter(d => find(d) != d).toSet
    val nSurv = docs.length - losers.size
    val resid = pairsAt(0.7).count { case (a, b) =>
      !losers(a) && !losers(b)
    }
    val row = Dedup.residualDupAudit(spark, sf).collect().head
    assert(row.getLong(0) == docs.length)
    assert(row.getLong(1) == nSurv)
    assert(row.getLong(2) == resid)
  }

  test("minhash_k_sweep: error shrinks with k and k=16 matches est_error") {
    val sweep = Dedup.minhashKSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(sweep.map(_._1).toSeq == Seq(4L, 8L, 16L))
    // one candidate set serves every k
    assert(sweep.map(_._2).distinct.length == 1)
    // the MinHash variance bound j(1-j)/k: mean abs error at k=16 must
    // not exceed the k=4 error (sampling noise shrinks with k)
    assert(sweep.last._3 <= sweep.head._3 + 1e-9)
    // cross-check the k=16 row against minhashEstError's per-pair rows
    val errs = Dedup.minhashEstError(spark, sf).collect()
      .map(r => math.floor(math.abs(r.getDouble(4) - r.getDouble(2))
        * 1e6 + 0.5).toLong)
    val want = math.floor(
      errs.sum.toDouble / errs.length / 1e6 * 1e6 + 0.5) / 1e6
    assert(sweep.last._3 == want)
  }

  test("recall_at_k_sweep: hits bounded by k·queries, k=10@nprobe=4 " +
      "matches annRecall") {
    val got = graft.operators.Similarity.recallAtKSweep(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(got.map(_._1).toSeq == Seq(1L, 5L, 10L))
    got.foreach { case (k, hits, recall) =>
      assert(hits <= 10 * k)
      assert(recall ==
        math.floor(hits.toDouble / (10.0 * k) * 1e6 + 0.5) / 1e6)
    }
    // the k=10 cutoff is exactly annRecall's recall@10 at nprobe=4,
    // summed over queries
    val ann = graft.operators.Similarity
      .annRecall(spark, sf, k = 10, nprobe = 4).collect()
      .map(_.getLong(1)).sum
    assert(got.last._2 == ann)
  }

  test("pq_m_sweep: per-m totals reconcile with pq_codebook's groups") {
    import graft.operators.Similarity
    // the sweep's m=2 row must aggregate exactly the vectors the
    // per-code table covers, and more subspaces must not increase the
    // per-vector distortion (finer partitions can only fit better or
    // equal under the same init rule)
    val codes = Similarity.pqCodebook(spark, sf, m = 2, k = 4).collect()
    val nVec = codes.filter(_.getLong(0) == 0L).map(_.getLong(2)).sum
    val sweep = Similarity.pqMSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(sweep.map(_._1).toSeq == Seq(2L, 4L))
    assert(sweep.map(_._2).toSeq == Seq(4L, 8L)) // m * log2(4)
    sweep.foreach { case (_, _, n, _) => assert(n == nVec) }
    assert(sweep.last._4 <= sweep.head._4 + 1e-9,
      s"m=4 must not be worse: $sweep")
  }

  test("ivf_centroid_sweep: C=16 row matches recallAtKSweep's k=10 " +
      "point; candidate volume shrinks as C grows") {
    import graft.operators.Similarity
    val sweep = Similarity.centroidSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(sweep.map(_._1).toSeq == Seq(8L, 16L, 32L))
    sweep.foreach { case (_, nc, hits, recall) =>
      assert(hits <= 100L)
      assert(recall == math.floor(hits.toDouble / 100.0 * 1e6 + 0.5) / 1e6)
      assert(nc > 0)
    }
    // finer lists at a fixed probe budget scan fewer candidates
    assert(sweep.map(_._2).toSeq == sweep.map(_._2).sortBy(-_).toSeq,
      s"candidates must not grow with C: $sweep")
    // the C=16, nprobe=4, k=10 point is exactly recallAtKSweep's k=10 row
    val rk = Similarity.recallAtKSweep(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(sweep(1)._3 == rk(10L))
  }

  test("dedup_policy_compare: matches a driver-side fold over clusters") {
    val assigned = Dedup.assignCanonical(spark, sf,
      Dedup.jaccardPairs(spark, sf, 0.8)).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val q6 = graft.operators.TextStats.quality(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("quality") * 1e6 + 0.5)
          .cast("long").as("q6"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val clusters = assigned.groupBy(_._2).filter(_._2.length >= 2)
    var agree = 0L
    var gain = 0L
    clusters.foreach { case (canon, members) =>
      val ms = members.map { case (id, _) => (id, q6.getOrElse(id, 0L)) }
      val best = ms.minBy { case (id, qq) => (-qq, id) }
      if (best._1 == canon) agree += 1
      gain += best._2 - ms.minBy(_._1)._2
    }
    val row = Dedup.dedupPolicyCompare(spark, sf).collect().head
    assert(row.getLong(0) == clusters.size)
    assert(row.getLong(1) == agree)
    if (clusters.nonEmpty) {
      assert(row.getDouble(3) == math.floor(
        gain.toDouble / clusters.size / 1e6 * 1e6 + 0.5) / 1e6)
    }
  }
}
