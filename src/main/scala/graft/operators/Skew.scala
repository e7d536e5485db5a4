package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (100-TB posture, SURVEY §7.4): when a
  * handful of keys dominate a `groupBy`, the single reducer holding the
  * hot key becomes the stage's critical path. Salting splits each key
  * into `salts` sub-keys for the first (partial) aggregation and
  * re-merges in a second, cheap aggregation over at most
  * `distinct_keys × salts` rows.
  *
  * AQE's skew-join splitting handles the *join* case at runtime; this
  * covers skewed aggregations, which AQE does not rebalance.
  */
object Skew {

  /** Two-phase salted count per key. Equivalent to
    * `df.groupBy(key).count()` for any data, robust to hot keys.
    */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 32): DataFrame =
    df.select(key.as("k"),
        (pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(salts))).as("salt"))
      .groupBy("k", "salt")
      .agg(count(lit(1)).as("c"))
      .groupBy("k")
      .agg(sum("c").as("cnt"))

  /** Two-phase salted sum of `value` per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                salts: Int = 32): DataFrame =
    df.select(key.as("k"), value.as("v"),
        (pmod(spark_partition_id() + monotonically_increasing_id(),
          lit(salts))).as("salt"))
      .groupBy("k", "salt")
      .agg(sum("v").as("s"))
      .groupBy("k")
      .agg(sum("s").as("sum_value"))

  /** Salted replicate join for hot probe keys: the build side is
    * replicated `salts` times (one copy per salt), the probe side gets a
    * deterministic row-identity salt, and the join key becomes
    * (key, salt) — a hot key's rows now spread over `salts` reducers
    * instead of serializing on one. The result set is identical to the
    * plain join for any salt assignment, which is what the oracle
    * checks. Trade-off: build side shuffles `salts`× its size — worth it
    * exactly when one probe key dominates a reducer (AQE's skew-join
    * split covers sort-merge joins at runtime; this form also covers
    * pre-partitioned/bucketed layouts where AQE cannot re-split).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, bigKey: String,
                 smallKey: String, salts: Int = 8): DataFrame = {
    val sSmall = small.withColumn("salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val sBig = big.withColumn("salt",
      pmod(spark_partition_id() + monotonically_increasing_id(),
        lit(salts.toLong)))
    sBig.join(sSmall,
        sBig(bigKey) === sSmall(smallKey) && sBig("salt") === sSmall("salt"))
      .drop(sBig("salt")).drop(sSmall("salt"))
  }
}
