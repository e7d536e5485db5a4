package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Graph, Relational}

/** Round-5 batch G: PIT join, permutation importance, degree
  * anonymity, deletion impact.
  */
class Round5BatchGSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)

  test("pitJoin: ship-time version wins over order-time priority") {
    val dir = java.nio.file.Files.createTempDirectory("pit").toString
    // cust 1: priority P1 from day 0, P2 from day 50
    Seq((1L, 1L, "P1", day(0)), (2L, 1L, "P2", day(50)))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    // item on order 1 (P1) shipping day 60 → valid version is P2;
    // item on order 1 shipping day 10 → still P1
    Seq((1L, day(60), 100.0), (1L, day(10), 40.0))
      .toDF("l_orderkey", "l_shipdate", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.pitJoin(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3))).toMap
    assert(got("P2") == ((1L, 100.0, 1L)), s"got $got")
    assert(got("P1") == ((1L, 40.0, 0L)))
  }

  test("permImportance: planted y = 2x₁ — permuting x₁ destroys the fit") {
    val dir = java.nio.file.Files.createTempDirectory("permi").toString
    val rows = (1 to 40).map { i =>
      (i.toLong, i, i.toDouble, 0.1 + 0.02 * (i % 7),
        2.0 * i + 5.0)
    }
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
      "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.permImportance(spark, dir).collect().head
    val (full, p1, imp1) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(3))
    assert(full > 0.99, s"r2_full $full")
    assert(p1 < 0.5, s"r2 with x1 permuted $p1")
    assert(imp1 > 0.5, s"imp_quantity $imp1")
  }

  test("permImportance: permuting can't beat the true pairing") {
    // the synthetic fixture's extendedprice is (deliberately) nearly
    // independent of quantity/discount — r2 sits near 0 and both
    // importances are noise-level, but permutation must never
    // SYSTEMATICALLY improve the fit
    val r = Relational.permImportance(spark, sf).collect().head
    assert(r.getDouble(0) >= 0.0 && r.getDouble(0) <= 1.0)
    assert(r.getDouble(1) <= r.getDouble(0) + 0.01)
    assert(r.getDouble(2) <= r.getDouble(0) + 0.01)
  }

  test("degreeAnonymity: structural twins share a class") {
    val dir = java.nio.file.Files.createTempDirectory("danon").toString
    // edges c1–A, c1–B, c2–A, c2–B, c3–A (suppliers offset +1e6 inside)
    Seq((1L, 1L, day(0)), (2L, 1L, day(0)), (3L, 2L, day(0)),
      (4L, 2L, day(0)), (5L, 3L, day(0)))
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (2L, 11L), (3L, 10L), (4L, 11L), (5L, 10L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.degreeAnonymity(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // c1,c2 are twins (deg 2, nbr degs [2,3]); A, B, c3 each unique
    assert(got == Map(1L -> ((3L, 3L)), 2L -> ((1L, 2L))), s"got $got")
  }

  test("deletionImpact: cascade counts reconcile with direct joins") {
    val r = Curation.deletionImpact(spark, sf).collect().head
    val cohort = Tables.customer(spark, sf)
      .filter(pmod(pmod(col("c_custkey"), lit(2147483648L)) *
        lit(8388593L), lit(100L)) < 5)
    val nOrd = Tables.orders(spark, sf)
      .join(cohort, col("o_custkey") === col("c_custkey"), "left_semi")
      .count()
    assert(r.getLong(0) == cohort.count())
    assert(r.getLong(2) == nOrd)
    assert(r.getDouble(4) > 0.0 && r.getDouble(4) < 1.0)
  }
}
