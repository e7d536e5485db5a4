package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators._

/** Round-9 scale lift of [[Ranks]] (VERDICT r8 #4 / ADVICE r8): the
  * 4096-bucket clamp is gone (auto-size is a rows-per-bucket target,
  * uncapped), the B² spine offset join became a two-level rollup, the
  * B > 4096 regime buckets via `repartitionByRange` instead of an
  * O(B)-per-row broadcast scan, and `exactDiv` is a true integral
  * divide (exact past 2^53, where the old double quotient misrounded).
  */
class Round9OpsSpec extends SparkSpec {

  private def globalWindows(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case w: LWindow if w.partitionSpec.isEmpty => w
    }.size

  private def rows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("Ranks auto-size is uncapped: rows-per-bucket stays ~2^16 at " +
    "any corpus scale") {
    // the old clamp made 10^12 rows auto-size to 4096 buckets (~244M
    // rows in ONE window partition); the lift keeps buckets = n >> 16
    assert(Ranks.autoBuckets(1000L) == 4L)
    assert(Ranks.autoBuckets(1L << 28) == (1L << 12))
    assert(Ranks.autoBuckets(1L << 40) == (1L << 24)) // would clamp at 4096 before
    assert(Ranks.autoBuckets(1_000_000_000_000L) == 15258789L)
  }

  test("Ranks.exactDiv is exact past 2^53 (true integral divide)") {
    // (a - pmod(a,b)) / b through DOUBLE rounds 2^53+2 div 1 to 2^53;
    // IntegralDivide does not
    val big = (1L << 53) + 2L
    val df = spark.range(1).select(lit(big).as("a"), lit(1L).as("b"),
      lit(big).as("c"), lit(3L).as("d"))
    val r = df.select(Ranks.exactDiv(col("a"), col("b")).as("q1"),
      Ranks.exactDiv(col("c"), col("d")).as("q2")).head()
    assert(r.getLong(0) == big)
    assert(r.getLong(1) == big / 3L)
  }

  test("Ranks range-path bucketing: rank and running sum match the " +
    "single-window formulation, including heavy ties") {
    // the >4096-bucket regime, forced at spec size: buckets come from
    // repartitionByRange(value, tie) + spark_partition_id, so bounds
    // respect the FULL total order and repeated values split by tie
    val df = spark.range(1000).select(
      (col("id") % 7).cast("double").as("v"), // 7 tie blocks of ~143
      concat(lit("k"), format_string("%04d", col("id"))).as("k"),
      (col("id") % 11).cast("long").as("x"))
    val w = Window.orderBy(col("v"), col("k"))
    val want = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("x"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val got = Ranks.rankedRange(df, "v", "k", "r",
      runningSums = Seq("x" -> "c"), buckets = 16)
    assert(rows(got) == rows(want))
    assert(globalWindows(got) == 0,
      "range path must not plan a global window")
  }

  test("Ranks.ranked dispatches to the range path above " +
    "ScanPathMaxBuckets and stays exact") {
    // buckets > 4096 on a small frame: most range partitions are
    // empty — offsets must still line up bucket by bucket
    val df = spark.range(500).select(
      (col("id") * 37 % 101).cast("double").as("v"),
      col("id").as("k"), lit(1L).as("x"))
    val w = Window.orderBy(col("v"), col("k"))
    val want = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("x"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val got = Ranks.ranked(df, "v", "k", "r",
      runningSums = Seq("x" -> "c"), buckets = Ranks.ScanPathMaxBuckets + 4)
    assert(rows(got) == rows(want))
    assert(globalWindows(got) == 0)
    CacheScope.release(spark)
  }

  test("Ranks two-level spine rollup: exact at bucket counts that " +
    "exercise uneven super-buckets") {
    // buckets not a perfect square and not divisible by ceil(sqrt(B)):
    // the super-offset join + partitioned within-super prefix must
    // still produce the exact exclusive offsets
    for (b <- Seq(2, 3, 5, 12, 27)) {
      val df = spark.range(200).select(
        (col("id") % 13).cast("double").as("v"),
        col("id").as("k"), (col("id") % 5).cast("long").as("x"))
      val w = Window.orderBy(col("v"), col("k"))
      val want = df
        .withColumn("r", row_number().over(w).cast("long"))
        .withColumn("c", sum(col("x"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      val got = Ranks.ranked(df, "v", "k", "r",
        runningSums = Seq("x" -> "c"), buckets = b)
      assert(rows(got) == rows(want), s"buckets=$b")
      CacheScope.release(spark)
    }
  }
}
