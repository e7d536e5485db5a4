package graft

import org.apache.spark.sql.functions._

/** Evidence that AQE's runtime re-planning actually engages for the
  * engine's plans (SCALING.md leans on it): a small shuffle declared
  * with many partitions must coalesce at runtime.
  */
class AqeSpec extends SparkSpec {

  test("AQE coalesces a tiny shuffle below the declared partition count") {
    val declared = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val agg = spark.range(0, 1000)
      .select((col("id") % 7).as("k"))
      .groupBy("k").count()
    val n = agg.rdd.getNumPartitions // finalized adaptive plan
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
    assert(n < declared || declared == 1,
      s"expected runtime coalescing below $declared partitions, got $n")
    assert(agg.count() == 7)
  }
}
