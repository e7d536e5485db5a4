package graft

import org.apache.spark.sql.functions._
import graft.operators.{Events, Relational, TextStats}

/** Round-5 batch B: t-closeness EMD, KMV sketch audit, FD/key audit,
  * per-source KL divergence.
  */
class Round5BatchBSpec extends SparkSpec {
  import spark.implicits._

  test("t_closeness: fixture invariants and summary shape") {
    val r = Events.tCloseness(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val (nc, vc) = (row.getLong(0), row.getLong(1))
    val (maxT, risk) = (row.getDouble(2), row.getDouble(3))
    assert(nc > 0 && vc >= 0 && vc <= nc)
    assert(maxT >= 0.0 && maxT <= 1.0, s"EMD out of [0,1]: $maxT")
    assert(risk >= 0.0 && risk <= 1.0)
    // violation flag is the integer test 5·num > 9·cd ⟺ t > 0.2, so a
    // violating class count of 0 forces max_t ≤ 0.2 (+ quantization)
    if (vc == 0) assert(maxT <= 0.200001)
  }

  test("t_closeness: a single class IS the corpus, so t = 0 exactly") {
    val dir = java.nio.file.Files.createTempDirectory("tclose").toString
    (1 to 200).map { i =>
      (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 07:00:${i % 60}%02d"),
        (i % 17).toLong, "view", i.toDouble * 1.5, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val row = Events.tCloseness(spark, dir).collect().head
    assert(row.getLong(0) == 1L, "one (type, hour) class expected")
    assert(row.getLong(1) == 0L)
    assert(row.getDouble(2) == 0.0,
      s"single class must match the corpus distribution, t=${row.getDouble(2)}")
    assert(row.getDouble(3) == 0.0)
  }

  test("kmv_error_audit: estimator within sketch error, sparse branch exact") {
    val rows = Events.kmvErrorAudit(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getLong(1)
      val est = r.getDouble(2)
      val rel = r.getDouble(3)
      assert(exact > 0 && est > 0.0)
      // k=64 ⇒ σ ≈ 1/√(k−2) ≈ 12.7%; 4σ plus hash-collision slack
      assert(math.abs(rel) < 0.6, s"${r.getString(0)}: rel_err $rel")
      assert(math.abs((est - exact) / exact - rel) < 2e-6)
    }
  }

  test("fd_audit: keys hold, non-keys measure violations, g3 consistent") {
    val rows = Relational.fdAudit(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toMap
    assert(rows.size == 5)
    // o_orderkey is a true key in the fixture, so its FD must hold;
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data
    // (the generator doesn't enforce TPC-H's composite key), which is
    // exactly what the audit should surface — measured, not assumed
    val (_, v1, g1, h1) = rows("o_orderkey->o_custkey")
    assert(h1 && v1 == 0 && g1 == 0)
    rows.values.foreach { case (lhs, viol, g3, holds) =>
      assert(viol <= lhs)
      assert((viol == 0) == holds)
      assert((g3 == 0) == holds, "g3 must be 0 exactly when the FD holds")
    }
    // independent driver-side g3 recomputation for one non-key FD
    val pairs = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey").as[(Long, Long)].collect()
    val byLhs = pairs.groupBy(_._1)
    val g3Expect = pairs.length - byLhs.values
      .map(g => g.groupBy(_._2).values.map(_.size).max).sum
    val violExpect = byLhs.values.count(g => g.map(_._2).distinct.size > 1)
    val (lhsG, violG, g3G, _) = rows("l_partkey->l_suppkey")
    assert(lhsG == byLhs.size.toLong)
    assert(violG == violExpect.toLong)
    assert(g3G == g3Expect.toLong)
  }

  test("source_kl: non-negative on the fixture; single source ⇒ KL = 0") {
    val rows = TextStats.sourceKlDivergence(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(3) >= -1e-6,
        s"KL(${r.getString(0)}) negative: ${r.getDouble(3)}")
      assert(r.getLong(1) >= r.getLong(2),
        "token count below vocab size")
    }
    val dir = java.nio.file.Files.createTempDirectory("skl").toString
    (1 to 50).map(i =>
        (i.toLong, s"alpha beta gamma tok$i", "en", "only", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val one = TextStats.sourceKlDivergence(spark, dir).collect()
    assert(one.length == 1)
    assert(one.head.getDouble(3) == 0.0,
      "a lone source's distribution IS the corpus: every ln ratio is 0")
  }
}
