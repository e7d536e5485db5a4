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
}
