package graft

import java.sql.Timestamp
import graft.operators.{Events, TextStats}

/** Round-5 batch AM: Hill diversity profile, k-anonymity
  * generalization sweep.
  */
class Round5BatchAMSpec extends SparkSpec {
  import spark.implicits._

  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("hillNumbers: balanced sources make all three D's equal") {
    val dir = java.nio.file.Files.createTempDirectory("hn").toString
    (1L to 9L).map(i => (i, "txt", "en", s"src${i % 3}", 3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.hillNumbers(spark, dir).collect().head
    assert(r.getLong(0) == 9L && r.getLong(1) == 3L, s"d0: $r")
    // three equal sources: ¹D = e^{ln 3} ≈ 3, ²D = 81/27 = 3 exactly
    val h9 = 3 * math.floor(-(1.0 / 3) * math.log(1.0 / 3) * 1e9 + 0.5)
    assert(r.getDouble(2) == q(math.exp(h9 / 1e9), 4), s"d1: $r")
    assert(r.getDouble(3) == 3.0, s"d2: $r")
  }

  test("hillNumbers: one dominant source pulls ²D below ¹D below ⁰D") {
    val dir = java.nio.file.Files.createTempDirectory("hn2").toString
    ((1L to 8L).map(i => (i, "txt", "en", "big", 3L)) ++
      Seq((9L, "txt", "en", "tiny", 3L)))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextStats.hillNumbers(spark, dir).collect().head
    assert(r.getLong(1) == 2L, s"d0: $r")
    assert(r.getDouble(3) < r.getDouble(2) &&
      r.getDouble(2) < 2.0, s"order: $r")
  }

  test("anonymitySweep: coarsening buckets empties the violation list") {
    val dir = java.nio.file.Files.createTempDirectory("as").toString
    // 6 users all active in hour 0 AND hour 1 of day 0 (each hour
    // cell holds 6 ≥ k=5 users)... instead: spread so hourly cells
    // are tiny but the daily cell is big: user u hits hour u only
    val rows = (0 until 6).map { u =>
      (u.toLong + 1, new Timestamp(1704067200000L + u * 3600000L),
        u.toLong + 1, "view", 1.0)
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.anonymitySweep(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // hour: 6 singleton cells, all violating, every user at risk
    assert(got("hour") == ((6L, 6L, 1.0)), s"hour: $got")
    // 4hour: cells {h0-3} = 4 users < 5 (violating), {h4-7} = 2
    assert(got("4hour") == ((2L, 2L, 1.0)), s"4hour: $got")
    // day: one cell of 6 users ≥ 5 — nobody at risk
    assert(got("day") == ((1L, 0L, 0.0)), s"day: $got")
  }
}
