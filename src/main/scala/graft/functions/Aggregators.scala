package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (the UDAF surface the reference lacked,
  * SURVEY §2.10).
  *
  * `TopKAgg` keeps the k best (value, id) pairs per group in a bounded
  * buffer — a one-pass partial-aggregating alternative to the
  * window+rank top-k: the shuffle carries at most k rows per group per
  * map task instead of the group's full contents, and no per-partition
  * sort is needed. (Spark's own WindowGroupLimit now gets close for the
  * rank-filter shape; the aggregator form also composes inside a single
  * `agg` with other measures.)
  */
object Aggregators {

  /** Inner-level alias for [[MpQuantileAgg]]'s ladder: the wide
    * `scala.collection.Seq` so the level-0 fill buffer can be a
    * mutable ArrayBuffer appended in place between encoder
    * round-trips while levels >= 1 stay immutable sorted runs.
    */
  type CSeq[A] = scala.collection.Seq[A]

  /** Ordering: value desc, then id asc — matches the window top-k
    * tiebreak so both forms return identical rows.
    */
  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  class TopKAgg(k: Int)
      extends Aggregator[(Long, Double), Seq[(Double, Long)], Seq[(Double, Long)]] {
    override def zero: Seq[(Double, Long)] = Seq.empty

    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortWith(better).take(k)

    override def reduce(buf: Seq[(Double, Long)],
                        in: (Long, Double)): Seq[(Double, Long)] =
      trim(buf :+ ((in._2, in._1)))

    override def merge(a: Seq[(Double, Long)],
                       b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      trim(a ++ b)

    override def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      ExpressionEncoder()
  }

  /** Misra-Gries heavy-hitter summary with `m` counters: a mergeable,
    * bounded-state sketch whose candidate set is guaranteed to contain
    * every item with true frequency > N/(m+1). Partial buffers merge by
    * summing counts then subtracting the (m+1)-th largest count from
    * all (Agarwal et al., "Mergeable Summaries"), which preserves the
    * undercount bound — so the map-side partials stay ≤ m entries and
    * the shuffle carries O(m) rows total, never the token stream.
    * Output is the candidate *set*; exact counts come from a follow-up
    * verification pass (see `TextStats.heavyHitters`), making the final
    * result independent of sketch internals.
    */
  class MisraGriesAgg(m: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long],
                        tok: String): Map[String, Long] =
      buf.get(tok) match {
        case Some(c)              => buf.updated(tok, c + 1)
        case None if buf.size < m => buf.updated(tok, 1L)
        case None => // decrement-all step; drop counters that hit zero
          buf.collect { case (k, c) if c > 1 => k -> (c - 1) }
      }

    override def merge(a: Map[String, Long],
                       b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (sum.size <= m) sum
      else {
        val cut = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse)(m)
        sum.collect { case (k, c) if c > cut => k -> (c - cut) }
      }
    }

    override def finish(r: Map[String, Long]): Seq[String] =
      r.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[String]] =
      ExpressionEncoder()
  }

  /** Munro–Paterson deterministic mergeable quantile summary: a ladder
    * of sorted buffers, one per level, each held under `2b` values
    * (a full 2b collapses upward; after any reduce or merge the carry
    * loop re-checks each level until the bound holds again). A full
    * level collapses into level L+1 by merge-sort + take-every-2nd
    * (fixed parity — no randomness, so the sketch is a pure function
    * of the multiset + merge tree). A level-L element
    * represents 2^L inputs; rank error after collapsing through
    * `levels` levels is ≤ Σ 2^(L-1) per collapse ≈ N·levels/(2b) — at
    * b = 512 and a 2^30-row group that is ~3% rank error, constant
    * memory. The shuffle carries O(b·log(N/b)) values per group per
    * map task, never the column. This is the classic deterministic
    * member of the mergeable-summaries family (Agarwal et al.),
    * alongside the [[MisraGriesAgg]] frequency sketch above.
    */
  class MpQuantileAgg(b: Int) extends Aggregator[
      Double, Seq[CSeq[Double]], Seq[(Double, Double)]] {

    import scala.collection.mutable.ArrayBuffer

    override def zero: Seq[CSeq[Double]] = Seq.empty

    /** Odd-indexed half of a sorted run — fixed parity, so the sketch
      * stays a pure function of the multiset + merge tree. */
    private def promote(sorted: Array[Double]): CSeq[Double] = {
      val out = new Array[Double](sorted.length / 2)
      var i = 1; var j = 0
      while (i < sorted.length) { out(j) = sorted(i); j += 1; i += 2 }
      scala.collection.immutable.ArraySeq.unsafeWrapArray(out)
    }

    // level 0 is an UNSORTED fill buffer; levels >= 1 are sorted runs.
    // A merge can land up to 4b-2 items on one level and a single
    // collapse only removes 2b, so RE-CHECK the same level until it is
    // under threshold before moving up — otherwise the <=2b-per-level
    // buffer bound (and the O(b log(N/b)) shuffle-size claim) fails on
    // merge-heavy trees.
    private def carry(levels: Seq[CSeq[Double]]): Seq[CSeq[Double]] = {
      var ls = levels
      var l = 0
      while (l < ls.length) {
        if (ls(l).length >= 2 * b) {
          val arr = ls(l).toArray
          if (l == 0) java.util.Arrays.sort(arr) // fill is unsorted
          val promoted = promote(arr.take(2 * b))
          ls = ls.updated(l, scala.collection.immutable.ArraySeq
            .unsafeWrapArray(arr.drop(2 * b))) // keep overflow here
          ls = if (l + 1 < ls.length)
            ls.updated(l + 1, merge2(ls(l + 1), promoted))
          else ls :+ promoted
        } else l += 1
      }
      ls
    }

    private def merge2(a: CSeq[Double], bs: CSeq[Double]): CSeq[Double] =
      (a ++ bs).sorted

    override def reduce(buf: Seq[CSeq[Double]], v: Double): Seq[CSeq[Double]] = {
      // Level 0 is a MUTABLE fill buffer appended in place: the
      // aggregator owns the buffer object between encoder round-trips,
      // so the former per-row immutable cons + full-ladder rescan (the
      // mp_quantiles hot path: one allocation per input row) collapses
      // to an amortized O(1) append. The ladder above only changes when
      // the fill buffer reaches exactly 2b.
      val ls: Seq[CSeq[Double]] =
        if (buf.isEmpty) Seq(new ArrayBuffer[Double](2 * b)) else buf
      val l0 = ls.head match {
        case ab: ArrayBuffer[Double @unchecked] => ab
        case s => // first touch after a deserialize: re-materialize once
          val ab = new ArrayBuffer[Double](2 * b); ab ++= s; ab
      }
      l0 += v
      val base = if (l0 eq ls.head) ls else ls.updated(0, l0)
      if (l0.length < 2 * b) base
      else if (l0.length == 2 * b) {
        // the common path: fill hit exactly 2b (one row at a time) —
        // sort it, promote the odd half, clear IN PLACE, cascade above
        val arr = l0.toArray
        java.util.Arrays.sort(arr)
        val promoted = promote(arr)
        l0.clear()
        carry(if (base.length > 1)
          base.updated(1, merge2(base(1), promoted))
        else base :+ promoted)
      } else carry(base) // oversized fill (merged buffer): general carry
    }

    override def merge(a: Seq[CSeq[Double]],
                       b2: Seq[CSeq[Double]]): Seq[CSeq[Double]] = {
      val n = math.max(a.length, b2.length)
      val merged = (0 until n).map { l =>
        val x: CSeq[Double] = if (l < a.length) a(l) else Seq.empty
        val y: CSeq[Double] = if (l < b2.length) b2(l) else Seq.empty
        if (l == 0) x ++ y else merge2(x, y)
      }
      carry(merged)
    }

    /** Returns (p, estimate) for p in 0.1…0.9: weighted rank over the
      * ladder (level L values count 2^L). */
    override def finish(r: Seq[CSeq[Double]]): Seq[(Double, Double)] = {
      val weighted = r.zipWithIndex.flatMap { case (vs, l) =>
        val sorted = if (l == 0) vs.sorted else vs
        sorted.map(v => (v, 1L << l))
      }.sortBy(_._1)
      if (weighted.isEmpty) return Seq.empty
      val total = weighted.map(_._2).sum
      val cum = weighted.scanLeft(0L)(_ + _._2).tail
      (1 to 9).map { i =>
        val p = i / 10.0
        val target = math.ceil(p * total).toLong
        val idx = cum.indexWhere(_ >= target)
        (p, weighted(if (idx < 0) weighted.length - 1 else idx)._1)
      }
    }

    override def bufferEncoder: Encoder[Seq[CSeq[Double]]] =
      ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[(Double, Double)]] =
      ExpressionEncoder()
  }
}
