package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Structural properties of the round-2 gap-list operators (values are
  * oracle-checked by the driver; these pin the invariants).
  */
class RelationalExtrasSpec extends SparkSpec {

  test("cube covers rollup: every rollup group appears in the cube") {
    val cube = Relational.cubeAgg(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)))).toSet
    // (flag, status), (flag, null), (null, null) must all be present;
    // cube adds (null, status)
    assert(cube.exists { case (f, s) => f.isDefined && s.isDefined })
    assert(cube.exists { case (f, s) => f.isDefined && s.isEmpty })
    assert(cube.exists { case (f, s) => f.isEmpty && s.isDefined })
    assert(cube.contains((None, None)))
  }

  test("grouping sets: gid marks the null pattern; totals reconcile") {
    val rows = Relational.groupingSetsAgg(spark, sf).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)),
        r.getLong(2), r.getLong(3)))
    // gid 1 = by-flag (status aggregated), 2 = by-status, 3 = grand total
    rows.foreach {
      case (f, s, 1L, _) => assert(f.isDefined && s.isEmpty)
      case (f, s, 2L, _) => assert(f.isEmpty && s.isDefined)
      case (f, s, 3L, _) => assert(f.isEmpty && s.isEmpty)
      case other => fail(s"unexpected gid: $other")
    }
    val total = rows.collect { case (_, _, 3L, c) => c }.sum
    assert(rows.collect { case (_, _, 1L, c) => c }.sum == total)
    assert(rows.collect { case (_, _, 2L, c) => c }.sum == total)
    assert(total > 0)
  }

  test("rank_fns: percent_rank/cume_dist bounds, ntile balance") {
    val rows = Relational.rankFns(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pr, cd, q) = (r.getDouble(3), r.getDouble(4), r.getInt(5))
      assert(pr >= 0.0 && pr <= 1.0)
      assert(cd > 0.0 && cd <= 1.0)
      assert(q >= 1 && q <= 4)
    }
  }

  test("pivot totals equal the plain groupBy totals") {
    val pivoted = Relational.pivotAgg(spark, sf).collect()
      .map(r => r.getString(0) ->
        (Option(r.get(1)).fold(0.0)(_.asInstanceOf[Double]) +
          Option(r.get(2)).fold(0.0)(_.asInstanceOf[Double]))).toMap
    val plain = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(round(sum("l_quantity"), 4).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    plain.foreach { case (k, v) =>
      assert(math.abs(pivoted(k) - v) < 1e-6, s"flag $k: ${pivoted(k)} vs $v")
    }
  }

  test("window_topk returns at most k rows per group, sorted") {
    val rows = Relational.windowTopk(spark, sf, 3).collect()
    rows.groupBy(_.getString(0)).values.foreach { g =>
      assert(g.length <= 3)
      val prices = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(prices.zip(prices.tail).forall { case (a, b) => a >= b })
    }
  }

  test("except and intersect respect set semantics") {
    val ex = Relational.exceptOp(spark, sf, "1998-06-01").collect()
      .map(_.getLong(0)).toSet
    val after = Tables.orders(spark, sf)
      .filter(col("o_orderdate") >= to_timestamp(lit("1998-06-01")))
      .select("o_custkey").collect().map(_.getLong(0)).toSet
    assert((ex & after).isEmpty)
    val inter = Relational.intersectOp(spark, sf, "1996-03", "1996-04")
      .collect().map(_.getLong(0))
    assert(inter.length == inter.distinct.length)
  }

  test("hash sampling is deterministic and within a loose band") {
    val a = Relational.sampleHash(spark, sf, 10).collect().map(_.getLong(0))
    val b = Relational.sampleHash(spark, sf, 10).collect().map(_.getLong(0))
    assert(a.sorted.toSeq == b.sorted.toSeq)
    val total = Tables.orders(spark, sf).count()
    val frac = a.length.toDouble / total
    assert(frac > 0.02 && frac < 0.3, s"fraction $frac out of band")
  }

  test("approx aggregates land within their declared tolerances") {
    val rows = Relational.approxAgg(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(3), s"HLL outside 10% for ${r.getString(0)}")
      assert(r.getBoolean(4), s"approx p50 outside 5% for ${r.getString(0)}")
      assert(r.getLong(1) > 0)
    }
  }

  test("numeric hist: buckets partition the rows, mass adds up") {
    val li = Tables.lineitem(spark, sf)
    val rows = Relational.numericHist(spark, sf).collect()
    assert(rows.map(_.getInt(0)).forall(b => b >= 0 && b <= 19))
    assert(rows.map(_.getLong(1)).sum == li.count())
    val total = li.agg(sum("l_extendedprice")).head.getDouble(0)
    // per-bucket masses rounded to 4dp: 20 buckets of <=0.5e-4 error
    assert(math.abs(rows.map(_.getDouble(2)).sum - total) < 1e-3)
  }

  test("bloom semi join equals the plain semi join") {
    val got = Relational.bloomSemiJoin(spark, sf).collect()
      .map(_.getLong(0)).sorted.toSeq
    val want = Tables.orders(spark, sf).join(
        Tables.customer(spark, sf).filter(col("c_acctbal") > 9000)
          .select("c_custkey"),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .collect().map(_.getAs[Number]("o_orderkey").longValue).sorted.toSeq
    assert(got == want && got.nonEmpty)
  }

  test("fkAudit: child counts match tables; generated fixture has no orphans") {
    val rows = Relational.fkAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows.keySet == Set("lineitem->orders", "orders->customer",
      "lineitem->supplier", "customer->nation", "supplier->nation"))
    val li = spark.read.parquet(s"$sf/lineitem.parquet").count()
    assert(rows("lineitem->orders")._1 == li)
    assert(rows("lineitem->supplier")._1 == li)
    rows.values.foreach { case (n, orphans) =>
      assert(n > 0 && orphans == 0)
    }
  }
}
