package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.CacheScope

/** Distributed exact global ranking (round-8 plan hardening, round-9
  * scale lift): total-order row ranks and running sums WITHOUT an
  * unpartitioned WindowExec — the scale-safe restatement of
  * `row_number().over(Window.orderBy(value, tie))`, which funnels every
  * row through ONE window partition (Spark's own "No Partition Defined"
  * warning; at corpus scale it is the plan's death).
  *
  * Shape: (1) rows are assigned a range bucket — for B ≤ 4096 via B−1
  * approx-percentile split points broadcast into a map-side scan (zero
  * extra shuffle); for larger B via `repartitionByRange(B, value, tie)`
  * + `spark_partition_id()`, which reuses Spark's own sampled range
  * bounds and binary-search assignment (an extra data shuffle, but no
  * O(B)-per-row scan and no O(B) literal array); (2) per-bucket
  * counts/sums roll up to a ≤B-row spine; (3) exclusive bucket prefix
  * offsets come from a TWO-LEVEL rollup — ⌈√B⌉-sized super-buckets get
  * offsets from a broadcast non-equi self-join (≤B pairs), buckets get
  * within-super offsets from a window PARTITIONED by super (≤⌈√B⌉ rows
  * per partition) — O(B) total, no B² join, no global window; (4) rank
  * = bucket offset + row_number over a window PARTITIONED by bucket.
  *
  * In the percentile path, ties on `value` always share a bucket
  * (strict comparison against value-only split points), so the
  * within-bucket (value, tie) sort reproduces the single-window total
  * order exactly. In the range path the bounds respect the FULL
  * (value, tie) order — every row of bucket i sorts before every row
  * of bucket i+1 — so the order is exact there too, and a heavily
  * repeated value splits across buckets by `tie` instead of skewing
  * one. Split placement — and any sampling nondeterminism — moves only
  * bucket BALANCE, never a rank.
  *
  * `buckets = 0` (the default) auto-sizes to ~2^16 rows per bucket,
  * UNCAPPED (round-9; the old 4096 cap made rows-per-bucket grow
  * linearly past ~2.7×10⁸ input rows): one window partition stays
  * ~2^16 rows at any corpus scale, and the spine work grows O(B) =
  * O(n/2^16). Pass `buckets` explicitly to tune balance vs spine
  * size for a known cluster.
  */
object Ranks {

  /** Buckets at which [[ranked]] switches from the broadcast
    * percentile-bounds scan (O(B) per row, O(B) literal array) to
    * `repartitionByRange` bucketing. */
  private[graft] val ScanPathMaxBuckets = 4096

  /** Auto-sized bucket count for an `n`-row input: ~2^16 rows per
    * bucket, at least 4, uncapped (round-9 — the 4096 clamp is gone;
    * 10^12 rows now auto-size to ~15M buckets of ~65k rows instead of
    * 244M-row buckets). */
  private[graft] def autoBuckets(n: Long): Long =
    math.max(4L, n >> 16)

  /** Exact integer division `a div b` for longs: SQL's integral `div`
    * operator (Catalyst `IntegralDivide`), which never round-trips
    * through DOUBLE — exact past 2^53, where the old
    * `(a - pmod(a,b)) / b` double quotient could misround (ADVICE r8).
    */
  def exactDiv(a: Column, b: Column): Column =
    call_function("div", a, b)

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
    * Round8OpsSpec/Round9OpsSpec). `valueCol` must be numeric in the
    * percentile path (it is bucketed through its double image; the
    * double cast is monotone and ties stay together, so exact-typed
    * order is preserved); `tieCol` may be any orderable type. The
    * input is persisted via [[CacheScope]] — the bucketing pass and
    * the bucketed scan both read it, and the cache-materializing
    * count doubles as the sizing pass (see [[autoBuckets]]; bucket
    * placement never affects the ranks, only balance).
    */
  def ranked(df: DataFrame, valueCol: String, tieCol: String,
             rankCol: String, runningSums: Seq[(String, String)] = Nil,
             buckets: Int = 0): DataFrame = {
    val in = df.persist()
    val n = in.count() // materializes the cache AND sizes the buckets
    CacheScope.track(in)
    val autoB = math.min(autoBuckets(n), Int.MaxValue.toLong).toInt
    val nb = if (buckets > 0) buckets else autoB
    if (nb <= ScanPathMaxBuckets)
      rankedWith(bucketedByScan(in, valueCol, nb), valueCol, tieCol,
        rankCol, runningSums, nb)
    else
      rankedWith(bucketedByRange(in, valueCol, tieCol, nb), valueCol,
        tieCol, rankCol, runningSums, nb)
  }

  /** Range-partitioned bucketing for tests: forces the
    * `repartitionByRange` path regardless of bucket count, so its
    * parity is pinnable at spec-sized inputs. */
  private[graft] def rankedRange(df: DataFrame, valueCol: String,
                                 tieCol: String, rankCol: String,
                                 runningSums: Seq[(String, String)] = Nil,
                                 buckets: Int = 8): DataFrame =
    rankedWith(bucketedByRange(df, valueCol, tieCol, buckets), valueCol,
      tieCol, rankCol, runningSums, buckets)

  /** Map-side bucket assignment: B−1 value-only approx-percentile split
    * points in one aggregate, broadcast; each row's bucket is the count
    * of split points strictly below its value. No data shuffle, but
    * O(B) work per row and an O(B) literal — the ≤4096-bucket path. */
  private def bucketedByScan(in: DataFrame, valueCol: String,
                             buckets: Int): DataFrame = {
    val v = col(valueCol).cast("double")
    val qs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val bounds = in.agg(coalesce(
      approx_percentile(v, qs, lit(10000)),
      array().cast("array<double>")).as("__g_bs"))
    in.crossJoin(broadcast(bounds))
      .withColumn("__g_bkt", aggregate(col("__g_bs"), lit(0),
        (acc, b) => acc + when(v > b, 1).otherwise(0)))
      .drop("__g_bs")
  }

  /** Shuffle-based bucket assignment: Spark's own RangePartitioner
    * samples (value, tie) bounds and binary-searches each row into a
    * partition — the partition id IS the bucket. One extra data
    * shuffle, but per-row cost is O(log B) inside Spark's machinery
    * and bounds respect the full total order (skew-proof: a repeated
    * value splits by tie). The B > 4096 path.
    *
    * PERSISTED (ADVICE r9): the bucketed frame feeds two plan branches
    * (per-bucket spine and the final offset join), and its bucket ids
    * come from `spark_partition_id()` after a SAMPLED range exchange —
    * if each branch recomputed the exchange (exchange reuse disabled,
    * or canonicalization broken by a refactor), RangePartitioner's
    * per-RDD sampling could yield DIFFERENT bounds per branch and
    * silently corrupt ranks. Persisting pins one materialization of
    * the sampled bounds; correctness no longer rides exchange reuse. */
  private[graft] def bucketedByRange(in: DataFrame, valueCol: String,
                                     tieCol: String, buckets: Int): DataFrame =
    CacheScope.track(
      in.repartitionByRange(buckets, col(valueCol), col(tieCol))
        .withColumn("__g_bkt", spark_partition_id())
        .persist())

  private def rankedWith(bucketed: DataFrame, valueCol: String,
                         tieCol: String, rankCol: String,
                         runningSums: Seq[(String, String)],
                         buckets: Int): DataFrame = {
    val perB = bucketed.groupBy("__g_bkt").agg(
      count(lit(1)).as("__g_c"),
      runningSums.map { case (src, _) =>
        sum(col(src)).as(s"__g_s_$src") }: _*)
    // two-level exclusive prefix over the ≤B-row spine (round-9 — the
    // old broadcast non-equi self-join was B² pairs): super-buckets of
    // ~⌈√B⌉ get offsets from a ≤B-pair broadcast join; buckets get
    // within-super offsets from a window PARTITIONED by super (≤⌈√B⌉
    // rows per partition — bounded, never corpus-proportional).
    val sup = math.max(1, math.ceil(math.sqrt(buckets.toDouble)).toInt)
    val withSup = perB.withColumn("__g_sup",
      exactDiv(col("__g_bkt").cast("long"), lit(sup.toLong)))
    val perS = withSup.groupBy("__g_sup").agg(
      sum(col("__g_c")).as("__g_sc"),
      runningSums.map { case (src, _) =>
        sum(col(s"__g_s_$src")).as(s"__g_ss_$src") }: _*)
    val rhsS = perS.select(
      col("__g_sup").as("__g_sup2") +: col("__g_sc").as("__g_sc2") +:
        runningSums.map { case (src, _) =>
          col(s"__g_ss_$src").as(s"__g_ss2_$src") }: _*)
    val supOff = perS.join(broadcast(rhsS),
        col("__g_sup2") < col("__g_sup"), "left")
      .groupBy("__g_sup")
      .agg(coalesce(sum(col("__g_sc2")), lit(0L)).as("__g_supoff"),
        runningSums.map { case (src, _) =>
          sum(col(s"__g_ss2_$src")).as(s"__g_supsoff_$src") }: _*)
    val wSup = Window.partitionBy("__g_sup").orderBy("__g_bkt")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = runningSums.foldLeft(
      withSup.join(broadcast(supOff), "__g_sup")
        .withColumn("__g_off", col("__g_supoff") +
          coalesce(sum(col("__g_c")).over(wSup), lit(0L)))) {
        case (d, (src, _)) =>
          d.withColumn(s"__g_soff_$src",
            coalesce(col(s"__g_supsoff_$src"), lit(0)) +
              coalesce(sum(col(s"__g_s_$src")).over(wSup), lit(0)))
      }
      .select(col("__g_bkt") +: col("__g_off") +:
        runningSums.map { case (src, _) => col(s"__g_soff_$src") }: _*)
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
