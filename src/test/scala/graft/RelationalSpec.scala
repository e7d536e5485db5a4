package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("dateMatch: component equality, not numeric or string prefix") {
    val df = Seq("1996-01-05", "1996-10-05", "1996-11-01", "1995-01-05")
      .toDF("d").select(to_timestamp($"d").as("d"))
    def n(spec: String): Long =
      df.filter(Relational.dateMatch($"d", spec)).count()
    assert(n("1996") == 3)
    assert(n("1996-01") == 1)
    assert(n("1996-1") == 0)   // reference semantics: "1" != "01"
    assert(n("1996-01-05") == 1)
    assert(n("1996-01-06") == 0)
    assert(n("1995") == 1)
    assert(n("1996-13") == 0)      // impossible month folds to false
    assert(n("1996-02-30") == 0)   // impossible day folds to false
  }

  test("q1 counts only the requested window") {
    val cnt = Relational.q1FilterCount(spark, sf, "1996-03")
      .collect()(0).getLong(0)
    val expect = spark.read.parquet(s"$sf/lineitem.parquet")
      .filter(year($"l_shipdate") === 1996 && month($"l_shipdate") === 3)
      .count()
    assert(cnt == expect && expect > 0)
  }

  test("q6 grouped aggregate is complete and avg*count==sum") {
    val rows = Relational.q6MultiAgg(spark, sf, "1996").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sumQty = r.getAs[Double]("sum_qty")
      val avgQty = r.getAs[Double]("avg_qty")
      val n = r.getAs[Long]("count_order")
      assert(math.abs(sumQty - avgQty * n) / math.max(1.0, sumQty) < 1e-4)
    }
  }

  test("q7 is sorted by revenue desc and limited") {
    val rows = Relational.q7TopRevenue(spark, sf, "1998-06-01", 10).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b })
  }

  test("q5 monthly counts cover only the two requested nations") {
    val rows = Relational.q5Monthly(spark, sf, Seq("NATION_3", "NATION_24"))
      .collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).toSet.subsetOf(Set("NATION_3", "NATION_24")))
  }
}
