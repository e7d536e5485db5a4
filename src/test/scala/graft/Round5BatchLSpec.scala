package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Events

/** Round-5 batch L: SRM guardrail, Mann–Kendall trend test. */
class Round5BatchLSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)

  test("abSrmCheck: balanced hash arms pass; a planted 4:1 split flags") {
    val dir = java.nio.file.Files.createTempDirectory("srm").toString
    def armA(u: Long) = ((u % 2147483648L) * 8388593L) % 100L < 50L
    // planted mismatch: 80 arm-A users, 20 arm-B users
    val as = (1L to 2000L).filter(armA).take(80)
    val bs = (1L to 2000L).filterNot(armA).take(20)
    (as ++ bs).zipWithIndex.map { case (u, i) =>
      (i.toLong, day(0), u, "view", 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.abSrmCheck(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1)) == ((80L, 20L)))
    // χ² = 60²/100 = 36 ≫ 3.841
    assert(r.getDouble(2) == 36.0 && r.getLong(3) == 1L, s"got $r")
  }

  test("mannKendall: strictly increasing series — S = n(n−1)/2, flagged") {
    val dir = java.nio.file.Files.createTempDirectory("mk").toString
    // day d gets d+1 events → strictly increasing daily counts
    val rows = (0 until 15).flatMap { d =>
      (0 to d).map(i => (d * 100L + i, day(d), 1L, "view", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.mannKendall(spark, dir).collect().head
    val n = 15L
    assert(r.getLong(0) == n && r.getLong(1) == n * (n - 1) / 2)
    val s = n * (n - 1) / 2
    val var18 = n * (n - 1) * (2 * n + 5)
    val z = math.floor((s - 1).toDouble /
      math.sqrt(var18.toDouble / 18.0) * 1e6 + 0.5) / 1e6
    assert(r.getDouble(2) == z && r.getLong(3) == 1L, s"got $r")
  }

  test("mannKendall: constant series — S = 0, no trend") {
    val dir = java.nio.file.Files.createTempDirectory("mk0").toString
    val rows = (0 until 12).flatMap { d =>
      (0 until 3).map(i => (d * 10L + i, day(d), 1L, "view", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.mannKendall(spark, dir).collect().head
    assert(r.getLong(1) == 0L && r.getDouble(2) == 0.0
      && r.getLong(3) == 0L, s"got $r")
  }
}
