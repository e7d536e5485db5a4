package graft

import java.sql.{Date, Timestamp}
import graft.operators.{Events, Relational}

/** Round-5 batch AJ: zero-inflation score test, Theil decomposition,
  * price indices, demand classification.
  */
class Round5BatchAJSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("zeroInflation: a never-buyer block flags; Poisson-ish accepts") {
    val dir = java.nio.file.Files.createTempDirectory("zi").toString
    // 40 users: 20 with exactly 2 purchases, 20 with none → λ = 1,
    // Poisson expects 40·e⁻¹ ≈ 14.7 zeros, we observe 20
    var id = 0L
    val rows = (1L to 20L).flatMap(u => (0 until 2).map { _ =>
      id += 1; (id, day(0), u, "purchase", 1.0) }) ++
      (21L to 40L).map { u => id += 1; (id, day(0), u, "view", 1.0) }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.zeroInflation(spark, dir).collect().head
    assert(r.getLong(0) == 40L && r.getDouble(1) == 1.0, s"lam: $r")
    assert(r.getLong(2) == 20L, s"obs0: $r")
    val p0 = math.floor(math.exp(-1.0) * 1e9 + 0.5) / 1e9
    assert(r.getDouble(3) == q(40 * p0, 2), s"exp0: $r")
    assert(r.getLong(5) == 1L, s"flag: $r")
  }

  test("theilDecomposition: nations of equal-spend customers") {
    val dir = java.nio.file.Files.createTempDirectory("th").toString
    // nation 1: two customers at 100; nation 2: two at 300 →
    // zero within-nation inequality, all of T is between
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L))
      .toDF("c_custkey", "c_nationkey")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    Seq((1L, 1L, 100.0), (2L, 2L, 100.0), (3L, 3L, 300.0),
      (4L, 4L, 300.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val r = Relational.theilDecomposition(spark, dir).collect().head
    assert(r.getLong(0) == 4L, s"n: $r")
    assert(r.getDouble(1) == r.getDouble(2), s"T == between: $r")
    assert(r.getDouble(3) == 0.0 && r.getDouble(4) == 0.0,
      s"within: $r")
  }

  test("priceIndex: pure 10% inflation on a fixed basket") {
    val dir = java.nio.file.Files.createTempDirectory("pi").toString
    // part 1: month 1 → 10 units at 100.00; month 12 → 10 at 110.00
    val rows = Seq(
      (1L, Date.valueOf("2024-01-15"), 1000.0, 10.0),
      (1L, Date.valueOf("2024-12-15"), 1100.0, 10.0),
      (2L, Date.valueOf("2024-01-15"), 500.0, 5.0),
      (2L, Date.valueOf("2024-12-15"), 550.0, 5.0))
    rows.toDF("l_partkey", "l_shipdate", "l_extendedprice",
      "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.priceIndex(spark, dir).collect().head
    assert(r.getLong(0) == 2L, s"n: $r")
    assert(r.getDouble(1) == 1.1 && r.getDouble(2) == 1.1 &&
      r.getDouble(3) == 1.1, s"indices: $r")
  }

  test("demandClassification: steady vs spiky vs sparse parts") {
    val dir = java.nio.file.Files.createTempDirectory("dc").toString
    // span = 10 months. part 1: demand every month, constant qty →
    // smooth (ADI 1, CV² 0). part 2: demand in 2 months → ADI 5 →
    // intermittent (equal sizes, CV² 0). part 3: every month but one
    // huge spike → erratic (ADI 1, CV² high).
    val months = (1 to 10).map(m => Date.valueOf(f"2024-$m%02d-15"))
    val rows =
      months.map(d => (1L, d, 100.0, 5.0)) ++
      Seq((2L, months.head, 100.0, 5.0), (2L, months.last, 100.0, 5.0)) ++
      months.zipWithIndex.map { case (d, i) =>
        (3L, d, 100.0, if (i == 0) 100.0 else 1.0) }
    rows.toDF("l_partkey", "l_shipdate", "l_extendedprice",
      "l_quantity")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Relational.demandClassification(spark, dir).collect().head
    assert(r.getLong(0) == 3L, s"n: $r")
    assert(r.getLong(1) == 1L, s"smooth: $r")
    assert(r.getLong(2) == 1L, s"intermittent: $r")
    assert(r.getLong(3) == 1L, s"erratic: $r")
    assert(r.getLong(4) == 0L, s"lumpy: $r")
  }
}
