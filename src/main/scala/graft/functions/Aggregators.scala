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
}
