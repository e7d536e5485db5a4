package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Curation, Events, Index, Ml}

/** Round-5 batch K: Dirichlet QL retrieval, temperature scaling,
  * Neyman allocation, randomized response.
  */
class Round5BatchKSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1704067200000L + d * 86400000L)

  test("lmDirichletTopk: higher tf at equal length ranks first") {
    val dir = java.nio.file.Files.createTempDirectory("lmd").toString
    Seq((1L, "aa aa aa bb", "en", "s", 11L),
      (2L, "aa bb bb bb", "en", "s", 11L),
      (3L, "cc cc cc cc", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rowsA = Index.lmDirichletTopk(spark, dir).collect()
      .filter(_.getString(0) == "aa")
      .sortBy(-_.getDouble(2))
    assert(rowsA.map(_.getLong(1)).toSeq == Seq(1L, 2L), s"${rowsA.toSeq}")
    // log-probabilities are negative
    assert(rowsA.forall(_.getDouble(2) < 0.0))
  }

  test("temperatureScaling: full grid, single argmin, matches surfaced NLL") {
    val rows = Ml.temperatureScaling(spark, sf).collect()
    assert(rows.length == 16)
    assert(rows.count(_.getLong(2) == 1L) == 1)
    val best = rows.filter(_.getLong(2) == 1L).head
    val minNll = rows.map(_.getDouble(1)).min
    assert(best.getDouble(1) == minNll)
    assert(rows.forall(_.getDouble(1) > 0.0))
  }

  test("neymanAllocation: zero-variance stratum gets zero Neyman budget") {
    val dir = java.nio.file.Files.createTempDirectory("ney").toString
    // type a: constant value (σ=0, many rows); type b: wild spread
    val rows = (0 until 90).map(i =>
      (i.toLong, day(0), 1L, "a", 5.0)) ++
      (0 until 10).map(i =>
        (100L + i, day(0), 2L, "b", if (i % 2 == 0) 0.0 else 100.0))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Events.neymanAllocation(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toMap
    assert(got("a")._2 == 0L, s"got $got")      // σ=0 → no budget
    assert(got("b")._2 == 1000L)                // takes everything
    assert(got("a")._3 == 900L && got("b")._3 == 100L) // proportional
    assert(got("a")._4 >= 1.0)                  // design effect ≥ 1
  }

  test("randomizedResponse: debias formula reconstructs, ε = ln 3") {
    val r = Curation.randomizedResponse(spark, sf).collect().head
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(r.getDouble(5) == q6(math.log(3.0)))
    // the surfaced debiased rate must equal the formula applied to
    // the EXACT counts (re-derive from reported_rate within 1 ulp of
    // the shared quantization)
    val viaFormula = (r.getDouble(2) - 0.25) / 0.5
    assert(math.abs(r.getDouble(3) - viaFormula) < 2e-6,
      s"debiased ${r.getDouble(3)} vs $viaFormula")
    // hash flips ~25% of rows; the debiased estimate should sit much
    // closer to the true rate than the raw reported rate does
    val rawErr = math.abs(r.getDouble(2) - r.getDouble(1))
    assert(r.getDouble(4) < rawErr, s"abs_err ${r.getDouble(4)} vs $rawErr")
  }
}
