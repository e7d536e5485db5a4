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
}
