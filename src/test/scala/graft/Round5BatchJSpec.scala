package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Events, Ml, PlanAudits}

/** Round-5 batch J: Bradley–Terry, ts motif/discord, observe metrics. */
class Round5BatchJSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)

  test("bradleyTerry: unanimous a>b>c ordering recovers ordered strengths") {
    val dir = java.nio.file.Files.createTempDirectory("bt").toString
    val rows = (1L to 4L).flatMap { u =>
      Seq((u * 10, day(0), u, "a", 3.0), (u * 10 + 1, day(0), u, "b", 2.0),
        (u * 10 + 2, day(0), u, "c", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Ml.bradleyTerry(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("a")._1 == 8L && got("b")._1 == 4L && got("c")._1 == 0L,
      s"wins $got")
    assert(got("a")._2 > got("b")._2, s"strengths $got")
    assert(got("b")._2 > got("c")._2 && got("c")._2 == 0.0)
  }

  test("bradleyTerry: symmetric preferences tie") {
    val dir = java.nio.file.Files.createTempDirectory("bt2").toString
    // users 1,2 prefer a; users 3,4 prefer b — perfectly symmetric
    val rows = Seq(
      (1L, day(0), 1L, "a", 2.0), (2L, day(0), 1L, "b", 1.0),
      (3L, day(0), 2L, "a", 2.0), (4L, day(0), 2L, "b", 1.0),
      (5L, day(0), 3L, "a", 1.0), (6L, day(0), 3L, "b", 2.0),
      (7L, day(0), 4L, "a", 1.0), (8L, day(0), 4L, "b", 2.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Ml.bradleyTerry(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("a") == got("b"), s"got $got")
  }

  test("tsMotif: periodic base repeats (motif 0), corrupted week is discord") {
    val dir = java.nio.file.Files.createTempDirectory("tsm").toString
    val pattern = Array(10, 20, 30, 20, 10, 5, 15)
    def y(d: Int) = pattern(d % 7) + (if (d == 17) 100 else 0)
    val rows = (0 until 35).flatMap { d =>
      (0 until y(d)).map(i => (d * 1000L + i, day(d), 1L, "view", 1.0))
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = Events.tsMotif(spark, dir).collect().head
    assert(r.getDouble(2) == 0.0, s"motif dist ${r.getDouble(2)}")
    // the discord window must overlap the corrupted day 17 (window
    // starts are epoch days; the fixture starts at epoch day 19723)
    val base = 1704067200L / 86400L
    val di = r.getLong(3)
    assert(di >= base + 11 && di <= base + 17,
      s"discord window start $di (base $base)")
    assert(r.getDouble(5) > 0.0)
  }

  test("observeMetrics: observe() agrees with direct aggregation") {
    val dir = java.nio.file.Files.createTempDirectory("obsm").toString
    Seq(
      (1L, day(0), 1L, "view", Some(1.0), """{"k": 1}"""),
      (2L, day(0), 1L, "view", None, """{"k": 2}"""),
      (3L, day(1), 2L, "click", Some(-2.0), """{"x": 3}"""),
      (9L, day(1), 2L, "click", Some(4.0), """{"k": 4}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = PlanAudits.observeMetrics(spark, dir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((4L, 1L, 1L, 1L, 9L)), s"got $r")
  }
}
