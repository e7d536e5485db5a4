package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope

/** Distributed exact global ranking (round-8 plan hardening): total-order
  * row ranks and running sums WITHOUT an unpartitioned WindowExec — the
  * scale-safe restatement of
  * `row_number().over(Window.orderBy(value, tie))`, which funnels every
  * row through ONE window partition (Spark's own "No Partition Defined"
  * warning; at corpus scale it is the plan's death).
  *
  * Shape: (1) B−1 approx-percentile split points of `value` in one
  * aggregate, broadcast; (2) one scan assigns each row its range bucket
  * (count of split points strictly below `value`); (3) per-bucket
  * counts/sums roll up to a ≤B-row spine whose exclusive prefix offsets
  * come from a broadcast non-equi self-join (≤B² pairs — no window at
  * all); (4) rank = bucket offset + row_number over a window PARTITIONED
  * by bucket. Ties on `value` always share a bucket (strict comparison
  * against value-only split points), so the within-bucket (value, tie)
  * sort reproduces the single-window total order exactly; split-point
  * placement — and any approx_percentile nondeterminism — moves only
  * bucket BALANCE, never a rank. Size `buckets` to the cluster: each
  * bucket is one window partition (~n/B rows; 64 suits local[32], a
  * 1000-executor corpus wants ~rows/2^26). A heavily repeated value
  * collapses all its ties into one bucket — the usual skew caveat; AQE
  * skew handling or a pre-salted tiebreak bucketing covers it if a real
  * corpus hits it.
  */
object Ranks {

  /** Exact integer division `a div b` for non-negative longs. The SQL
    * `/` operator promotes integrals to DOUBLE, whose quotient can
    * misround past 2^53; subtracting the remainder first makes the
    * dividend an exact multiple, so the double division is exact. */
  def exactDiv(a: Column, b: Column): Column =
    ((a - pmod(a, b)) / b).cast("long")

  /** SQL `NTILE(k)` restated from an exact global rank `r` over `n`
    * rows — the first `n mod k` tiles take ⌊n/k⌋+1 rows, the rest
    * ⌊n/k⌋ — so tiling needs no window once [[ranked]] has assigned
    * ranks. Matches Spark's and DuckDB's NTILE bit-for-bit. */
  def ntileFromRank(r: Column, n: Column, k: Int): Column = {
    val base = exactDiv(n, lit(k.toLong))
    val rem = n - base * k
    val cut = rem * (base + lit(1L))
    when(base === 0, r) // n < k: NTILE gives every row its own tile
      .otherwise(when(r <= cut, exactDiv(r - 1, base + 1) + 1)
        .otherwise(rem + exactDiv(r - lit(1L) - cut, base) + 1))
  }

  /** `df` plus an exact 1..n global rank `rankCol` under the total
    * order (`valueCol` asc, `tieCol` asc) and, for each
    * (srcCol → dstCol) in `runningSums`, the exact inclusive running
    * sum of srcCol under the same order — value-identical to the
    * single-window formulation (parity is spec-pinned in
    * Round8OpsSpec). `valueCol` must be numeric (it is bucketed
    * through its double image; the double cast is monotone and ties
    * stay together, so exact-typed order is preserved); `tieCol` may
    * be any orderable type. The input is persisted via [[CacheScope]]
    * — the boundary aggregate and the bucketed scan both read it, and
    * the cache-materializing count doubles as the sizing pass:
    * `buckets = 0` (the default) auto-sizes to ~2^16 rows per bucket,
    * clamped to [4, 4096], so one window partition stays
    * executor-sized at ANY corpus scale without a hand-tuned knob
    * (bucket placement never affects the ranks, only balance).
    */
  def ranked(df: DataFrame, valueCol: String, tieCol: String,
             rankCol: String, runningSums: Seq[(String, String)] = Nil,
             buckets: Int = 0): DataFrame = {
    val in = df.persist()
    val n = in.count() // materializes the cache AND sizes the buckets
    CacheScope.track(in)
    val autoB = math.max(4L, math.min(4096L, n >> 16)).toInt
    val nb = if (buckets > 0) buckets else autoB
    rankedWith(in, valueCol, tieCol, rankCol, runningSums, nb)
  }

  private def rankedWith(in: DataFrame, valueCol: String, tieCol: String,
                         rankCol: String,
                         runningSums: Seq[(String, String)],
                         buckets: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    val qs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val bounds = in.agg(coalesce(
      approx_percentile(v, qs, lit(10000)),
      array().cast("array<double>")).as("__g_bs"))
    val bucketed = in.crossJoin(broadcast(bounds))
      .withColumn("__g_bkt", aggregate(col("__g_bs"), lit(0),
        (acc, b) => acc + when(v > b, 1).otherwise(0)))
      .drop("__g_bs")
    val perB = bucketed.groupBy("__g_bkt").agg(
      count(lit(1)).as("__g_c"),
      runningSums.map { case (src, _) =>
        sum(col(src)).as(s"__g_s_$src") }: _*)
    val rhs = perB.select(
      col("__g_bkt").as("__g_b2") +: col("__g_c").as("__g_c2") +:
        runningSums.map { case (src, _) =>
          col(s"__g_s_$src").as(s"__g_s2_$src") }: _*)
    val offs = perB.join(broadcast(rhs),
        col("__g_b2") < col("__g_bkt"), "left")
      .groupBy("__g_bkt")
      .agg(coalesce(sum(col("__g_c2")), lit(0L)).as("__g_off"),
        runningSums.map { case (src, _) =>
          sum(col(s"__g_s2_$src")).as(s"__g_soff_$src") }: _*)
    val w = Window.partitionBy("__g_bkt")
      .orderBy(col(valueCol), col(tieCol))
    val out = bucketed.join(broadcast(offs), "__g_bkt")
      .withColumn(rankCol,
        (col("__g_off") + row_number().over(w)).cast("long"))
    runningSums.foldLeft(out) { case (d, (src, dst)) =>
      d.withColumn(dst,
        coalesce(col(s"__g_soff_$src"), lit(0)) +
          sum(col(src)).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    }.drop("__g_bkt" +: "__g_off" +:
      runningSums.map { case (src, _) => s"__g_soff_$src" }: _*)
  }
}
