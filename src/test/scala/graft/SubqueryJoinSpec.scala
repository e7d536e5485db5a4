package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Relational}

/** Semantics of the round-3 subquery/join surface: each SQL subquery
  * form is cross-checked against its hand-built DataFrame equivalent on
  * the same fixtures, and the physical plan is asserted to carry the
  * decorrelated join shape (not a per-row loop).
  */
class SubqueryJoinSpec extends SparkSpec {

  test("EXISTS decorrelates to a semi join and matches it") {
    val viaSql = Relational.existsSubquery(spark, sf)
    assert(viaSql.queryExecution.executedPlan.toString.contains("Semi"),
      "EXISTS should plan as a left-semi join")
    val o = spark.read.parquet(s"$sf/orders.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_returnflag") === "R").select("l_orderkey")
    val manual = o
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01"))
      .join(li, o("o_orderkey") === li("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
    assert(viaSql.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      manual.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("NOT IN matches anti join on a non-null key") {
    val viaSql = Relational.notInSubquery(spark, sf)
    val p = spark.read.parquet(s"$sf/part.parquet")
    val shipped = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(col("l_shipdate") >= lit("2000-06-01") &&
        col("l_shipdate") < lit("2000-07-01"))
      .select(col("l_partkey"))
    val manual = p.join(shipped, p("p_partkey") === shipped("l_partkey"),
        "left_anti")
      .groupBy("p_brand").agg(count(lit(1)).as("n_parts"))
    assert(viaSql.collect().map(r => (r.getString(0), r.getLong(1))).toSet ==
      manual.collect().map(r => (r.getString(0), r.getLong(1))).toSet)
  }

  test("scalar subquery matches explicit avg-join formulation") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val p = spark.read.parquet(s"$sf/part.parquet")
    val avgQ = li.groupBy(col("l_partkey").as("ak"))
      .agg(avg("l_quantity").as("aq"))
    val manual = li.join(p, col("p_partkey") === col("l_partkey"))
      .join(avgQ, col("ak") === col("p_partkey"))
      .filter(col("l_quantity") < col("aq") * 0.2)
      .groupBy("p_brand")
      .agg(round(sum("l_extendedprice") / 7.0, 4).as("avg_yearly"))
    val got = Relational.scalarSubquery(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    manual.collect().foreach { r =>
      assert(math.abs(got(r.getString(0)) - r.getDouble(1)) < 1e-3)
    }
  }

  test("outer-join histogram covers every customer exactly once") {
    val rows = Relational.outerJoinHist(spark, sf).collect()
    val custCount = rows.map(_.getLong(1)).sum
    assert(custCount ==
      spark.read.parquet(s"$sf/customer.parquet").count())
    // cross-check the full histogram against a driver-side computation
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy("o_custkey").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect()
      .map(r => orders.getOrElse(r.getLong(0), 0L))
      .groupBy(identity).map { case (c, xs) => c -> xs.length.toLong }
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == expected)
  }

  test("null-safe join keeps the NULL bucket") {
    val rows = Events.nullsafeJoin(spark, sf).collect()
    assert(rows.exists(_.isNullAt(0)),
      "low-value events form a NULL bucket that must join with itself")
    assert(rows.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0))
  }

  test("first/last/nth window: frame-exact per user") {
    val rows = Events.firstLastWindow(spark, sf).collect()
    val ev = spark.sessionState // touch to keep session lazy-val warm
    val byUser = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .groupBy(_.getLong(0))
    rows.foreach { r =>
      // TIMESTAMP_NTZ surfaces as LocalDateTime; it is Comparable, so
      // chronological order needs no epoch conversion
      val seq = byUser(r.getLong(0)).sortBy(x =>
        (x.getAs[java.time.LocalDateTime](1), x.getLong(2)))(
        Ordering.Tuple2(Ordering.ordered[java.time.LocalDateTime],
          Ordering.Long))
      assert(r.getString(1) == seq.head.getString(3))
      assert(r.getString(2) == seq.last.getString(3))
      if (seq.length >= 2) assert(r.getString(3) == seq(1).getString(3))
      else assert(r.isNullAt(3))
    }
  }
}
