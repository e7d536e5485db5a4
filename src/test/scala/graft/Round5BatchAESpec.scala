package graft

import java.sql.Timestamp
import graft.operators.{Events, Graph}

/** Round-5 batch AE: Markov absorption probabilities, Newman-weighted
  * projection, configuration-model edge surprise.
  */
class Round5BatchAESpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)

  test("markovAbsorption: deterministic chain hits, closed loop never") {
    val dir = java.nio.file.Files.createTempDirectory("ma").toString
    // user 1 alternates view→purchase; user 2 loops error→error
    val rows =
      (0 until 6).map(i => (i.toLong, ts(i), 1L,
        if (i % 2 == 0) "view" else "purchase", 1.0)) ++
      (10 until 14).map(i => (i.toLong, ts(i), 2L, "error", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.markovAbsorption(spark, dir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == Map("view" -> 1.0, "error" -> 0.0), s"h: $got")
  }

  test("newmanProjection: exclusive orders outweigh crowded ones") {
    val dir = java.nio.file.Files.createTempDirectory("np").toString
    // o1 = {1,2} (credit 1e9 each), o2 = {1,2,3} (credit 5e8)
    Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Graph.newmanProjection(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(got((1L, 2L)) == ((2L, 1500000000L)), s"pair12: $got")
    assert(got((1L, 3L)) == ((1L, 500000000L)), s"pair13: $got")
    assert(got((2L, 3L)) == ((1L, 500000000L)), s"pair23: $got")
  }

  test("edgeSurprise: lift = w·2m/(k_i·k_j) on exact integers") {
    val dir = java.nio.file.Files.createTempDirectory("es").toString
    // five {1,2} orders (w=5, passes minW) + one {1,3} (w=1, filtered)
    val rows = (1L to 5L).flatMap(o => Seq((o, 1L), (o, 2L))) ++
      Seq((6L, 1L), (6L, 3L))
    rows.toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val r = Graph.edgeSurprise(spark, dir).collect()
    assert(r.length == 1, s"rows: ${r.mkString(",")}")
    // k1 = 6, k2 = 5, 2m = 12 → lift = 5·12/30 = 2.0
    assert(r.head.getLong(0) == 1L && r.head.getLong(1) == 2L &&
      r.head.getLong(2) == 5L && r.head.getDouble(3) == 2.0,
      s"lift: ${r.head}")
  }
}
