package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Events, Graph}

/** Round-5 batch I: Holt–Winters seasonal forecast, OBF sequential
  * monitor, weighted SSSP.
  */
class Round5BatchISpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)

  test("hwForecast: learns a pure weekly pattern — late errors shrink") {
    val dir = java.nio.file.Files.createTempDirectory("hw").toString
    // 2024-01-01 epoch base: one event per day, value 10 + (day%7)
    val rows = (0 until 56).map { d =>
      (d.toLong, day(d), 1L, "view", 10.0 + (d % 7))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val fit = Events.hwForecast(spark, dir).collect()
    val inS = fit.filter(_.getLong(1) == 0L)
    val fc = fit.filter(_.getLong(1) > 0L)
    assert(inS.length == 56 && fc.length == 7)
    def mae(rs: Seq[org.apache.spark.sql.Row]) =
      rs.map(r => math.abs(r.getDouble(2) - r.getDouble(3))).sum /
        rs.length
    val early = mae(inS.slice(7, 14))   // after seeding
    val late = mae(inS.slice(49, 56))
    assert(late < early, s"late $late !< early $early")
    // the 7-day forecast keeps tracking the weekly shape: its value
    // at horizon h should be closer to the pattern than a flat mean
    fc.foreach { r =>
      val expect = 10.0 + (r.getLong(0) % 7)
      assert(math.abs(r.getDouble(3) - expect) < 2.0,
        s"day ${r.getLong(0)} fitted ${r.getDouble(3)} vs $expect")
    }
  }

  test("obfSequential: identical arms never cross; boundaries exact") {
    val dir = java.nio.file.Files.createTempDirectory("obf").toString
    def armA(u: Long) = ((u % 2147483648L) * 8388593L) % 100L < 50L
    val as = (1L to 400L).filter(armA).take(40)
    val bs = (1L to 400L).filterNot(armA).take(40)
    // identical value sequences in both arms, spread over the span
    val rows = (as.zipWithIndex.map { case (u, i) =>
      (i.toLong, day(i % 20), u, "view", 1.0 + (i % 5) * 0.5)
    } ++ bs.zipWithIndex.map { case (u, i) =>
      (1000L + i, day(i % 20), u, "view", 1.0 + (i % 5) * 0.5)
    })
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.obfSequential(spark, dir).collect()
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(got.length == 4)
    got.foreach { r =>
      val k = r.getLong(0)
      assert(r.getDouble(6) == q6(2.024 * math.sqrt(4.0 / k)),
        s"boundary at look $k: ${r.getDouble(6)}")
      // identical arm value sequences → exact integer mean gap is 0
      assert(r.getLong(3) == 0L, s"d6 at look $k: ${r.getLong(3)}")
      assert(r.getDouble(5) == 0.0, s"z at look $k: ${r.getDouble(5)}")
      assert(r.getLong(7) == 0L)
    }
  }

  test("weightedSssp: hand graph with exact ln-grid distances") {
    val dir = java.nio.file.Files.createTempDirectory("sssp").toString
    // c1–s10 cnt 2 (max), s10–c2 cnt 2, c1–s11 cnt 1
    Seq((1L, 1L), (2L, 1L), (3L, 2L), (4L, 2L), (5L, 1L))
      .map { case (ok, ck) => (ok, ck, day(0)) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L), (5L, 11L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.weightedSssp(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ln2 = math.floor(math.log(2.0) * 1e9 + 0.5).toLong
    assert(got(1L) == 0L, s"got $got")
    assert(got(1000010L) == 0L)   // strength-2 edge costs ln(2/2)=0
    assert(got(2L) == 0L)         // via the two free edges
    assert(got(1000011L) == ln2)  // the weaker cnt-1 edge pays ln 2
  }
}
