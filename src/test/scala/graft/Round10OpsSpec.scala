package graft

import org.apache.spark.sql.functions._
import graft.operators.{Curation, Events, Graph, Relational, Spatial}

/** Round-10 operators: Kalman local-level filter (W539), Markov
  * communicating classes (W540), deterministic hash walks (W541),
  * grid-blocked spatial radius join (W542), frequency-sketch rollup
  * (W543), try_* arithmetic surface (W544), cross-source quantile
  * normalization (W545).
  */
class Round10OpsSpec extends SparkSpec {

  test("kalman_filter matches a sequential scalar replay at 1e-9") {
    val got = Events.kalmanFilter(spark, sf).collect()
    val daily = spark.read.parquet(s"$sf/events.parquet")
      .select(datediff(to_date(col("ts")), lit("2024-01-01")).as("day"),
        floor(col("value") * lit(1e6) + lit(0.5)).cast("long").as("v6"))
      .groupBy("day").agg((sum(col("v6")).cast("double") / lit(1e6)).as("x"))
      .orderBy("day").collect()
      .map(r => (r.getInt(0).toLong, r.getDouble(1)))
    // sequential scalar Kalman, identical op order
    val (qv, rv) = (0.5, 2.0)
    var (level, p) = (daily.head._2, rv)
    val expected = daily.zipWithIndex.map { case ((d, x), i) =>
      if (i == 0) { level = x; p = rv; (d, x, x, 1.0) }
      else {
        val pp = p + qv
        val k = pp / (pp + rv)
        val pred = level
        level = level + k * (x - level)
        p = (1.0 - k) * pp
        (d, x, pred, k)
      }
    }
    assert(got.length == expected.length)
    def q6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    got.sortBy(_.getLong(0)).zip(expected).foreach { case (r, (d, x, pred, k)) =>
      assert(r.getLong(0) == d)
      assert(math.abs(r.getDouble(1) - q6(x)) < 1e-9, s"actual day $d")
      assert(math.abs(r.getDouble(2) - q6(pred)) < 1e-9, s"pred day $d")
      assert(math.abs(r.getDouble(4) - q6(k)) < 1e-9, s"gain day $d")
    }
    // the gain relaxes monotonically from 1 toward the Riccati fixed
    // point — the property constant-alpha smoothers lack
    val gains = got.sortBy(_.getLong(0)).map(_.getDouble(4))
    assert(gains.head == 1.0)
    gains.sliding(2).foreach { case Array(a, b) => assert(b <= a + 1e-12) }
  }

  test("markov_classes: classes partition the types; ids are minima") {
    val rows = Events.markovClasses(spark, sf).collect()
    val types = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).toSet == types)
    // class_id is the min member, so id <= member for every row, and
    // each class's size is consistent across its members
    rows.foreach(r => assert(r.getString(1) <= r.getString(0)))
    val bySize = rows.groupBy(_.getString(1))
    bySize.foreach { case (cid, ms) =>
      assert(ms.map(_.getLong(2)).toSet.size == 1)
      assert(ms.length == ms.head.getLong(2), s"class $cid size")
      assert(ms.map(_.getString(0)).min == cid)
      assert(ms.map(_.getLong(3)).toSet.size == 1) // shared verdict
    }
    // classes partition: per-class member counts sum to all types
    assert(bySize.values.map(_.length).sum == rows.length)
  }

  test("hash_walks: deterministic, neighbor-consistent, full-length") {
    val w1 = Graph.hashWalks(spark, sf).collect()
    val w2 = Graph.hashWalks(spark, sf).collect()
    assert(w1.map(_.toString).sorted.sameElements(
      w2.map(_.toString).sorted)) // replayable: no RNG anywhere
    val seeds = w1.filter(_.getLong(1) == 0L).map(_.getLong(0)).toSet
    assert(seeds.nonEmpty)
    // every seed walks all 5 levels (undirected graph: no dead ends)
    val bySeed = w1.groupBy(_.getLong(0))
    bySeed.foreach { case (s, rs) =>
      assert(rs.map(_.getLong(1)).toSet == Set(0L, 1L, 2L, 3L, 4L), s"$s")
    }
    // each step moves along a real edge
    val edges = Graph.customerSupplierEdges(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    bySeed.foreach { case (_, rs) =>
      val path = rs.sortBy(_.getLong(1)).map(_.getLong(2))
      path.sliding(2).foreach { case Array(a, b) =>
        assert(edges.contains((a, b)), s"non-edge $a->$b")
      }
    }
  }

  test("geo_radius_join equals the brute-force all-pairs census") {
    val got = Spatial.geoRadiusJoin(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    // brute force: no cells, no neighborhood — proves the 3x3
    // blocking loses nothing and admits nothing
    val mix = (k: Long, salt: Long) => {
      var h = (k * 1000003L + salt) % 1099511627776L
      for (_ <- 1 to 2) {
        val m = (h * 8388593L) % 1099511627776L
        h = m ^ (m >> 20)
      }
      h % 10000L
    }
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1), mix(r.getLong(0), 1L),
        mix(r.getLong(0), 2L)))
    val supp = spark.read.parquet(s"$sf/supplier.parquet")
      .select("s_suppkey").collect()
      .map(r => (r.getLong(0), mix(r.getLong(0), 3L), mix(r.getLong(0), 4L)))
    val pairs = for {
      (cid, seg, cx, cy) <- cust
      (_, sx, sy) <- supp
      d2 = (cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)
      if d2 <= 150L * 150L
    } yield (seg, cid, d2)
    val want = pairs.groupBy(_._1).map { case (seg, ps) =>
      seg -> ((ps.length.toLong, ps.map(_._2).distinct.length.toLong,
        ps.map(_._3).sum, ps.map(_._3).min))
    }
    assert(got == want, s"got $got want $want")
  }

  test("topk_sketch_rollup in the exact regime equals the census") {
    val got = Relational.topkSketchRollup(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want)
  }

  test("try_arithmetic null boundaries sit exactly at the guards") {
    val rows = Relational.tryArithmetic(spark, sf).collect()
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_returnflag", "l_extendedprice", "l_linenumber")
      .collect()
      .map(r => (r.getString(0),
        math.floor(r.getDouble(1) * 100 + 0.5).toLong, r.getInt(2)))
    val cut = Long.MaxValue / 2000000000000L
    rows.foreach { r =>
      val flag = r.getString(0)
      val g = li.filter(_._1 == flag)
      assert(r.getLong(1) == g.length)
      assert(r.getLong(2) == g.count(_._2 > cut), s"$flag overflow")
      assert(r.getLong(4) == g.count(_._3 == 1), s"$flag div-null")
      val okMul = g.filter(_._2 <= cut).map(_._2 * 2000000000000L)
      assert(r.getLong(3) == okMul.max, s"$flag mul_max")
    }
  }

  test("quantile_normalize: equal-size sources share one census") {
    val rows = Curation.quantileNormalize(spark, sf).collect()
    val perSource = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows.map(_.getString(0)).toSet == perSource.keySet)
    rows.foreach(r => assert(r.getLong(1) == perSource(r.getString(0))))
    // the fixture's sources are equal-sized, so normalization maps
    // every source onto the SAME pooled quantile set — identical
    // census across sources is the op's defining invariant
    if (perSource.values.toSet.size == 1) {
      val censuses = rows.map(r =>
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
      assert(censuses.size == 1, s"censuses differ: $censuses")
    }
    // normalized values are pooled order statistics: min/max must be
    // actual n_chars values from the corpus
    val vals = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("n_chars").cast("long")).collect()
      .map(_.getLong(0)).toSet
    rows.foreach { r =>
      assert(vals.contains(r.getLong(3)) && vals.contains(r.getLong(4)))
    }
  }

  test("hitting_time matches an exact-integer sequential replay") {
    val got = Events.hittingTime(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val tr = spark.read.parquet(s"$sf/events.parquet")
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("cur"), col("nxt"))
      .agg(count(lit(1)).as("c")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
    val tc = tr.groupBy(_._1._1).map { case (s0, xs) => s0 -> xs.map(_._2).sum }
    val states = tr.map(_._1._1).distinct.sorted
    var h = states.map(_ -> 0L).toMap
    for (_ <- 1 to 12) {
      h = states.map { s0 =>
        if (s0 == "purchase") s0 -> 0L
        else {
          val num = tr.filter(_._1._1 == s0)
            .map { case ((_, t), c) => c * h(t) }.sum
          s0 -> (1000000L + num / tc(s0))
        }
      }.toMap
    }
    assert(got == h, s"got $got want $h")
    assert(got("purchase") == 0L)
  }

  test("conductance equals a brute-force recount of cut and volume") {
    val got = Graph.conductance(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    val grp = (spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").as("id"),
        col("c_nationkey").cast("long").as("g"))
      .unionAll(spark.read.parquet(s"$sf/supplier.parquet")
        .select((col("s_suppkey") + 1000000L).as("id"),
          col("s_nationkey").cast("long").as("g"))))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val edges = Graph.customerSupplierEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val vtot = edges.length.toLong
    val per = edges.groupBy(e => grp(e._1)).map { case (g, es) =>
      val vol = es.length.toLong
      val cut = es.count(e => grp(e._2) != g).toLong
      g -> ((vol, cut, cut * 1000000L / math.min(vol, vtot - vol)))
    }
    assert(got == per)
  }

  test("effective_diameter: N(t) monotone, saturates, r0 near exact") {
    val rows = Graph.effectiveDiameter(spark, sf).collect()
      .sortBy(_.getLong(0))
    val n6 = rows.map(_.getLong(1))
    n6.sliding(2).foreach { case Array(a, b) => assert(b >= a) }
    assert(rows.last.getLong(2) == 1000000000L) // final frac = 1
    // reached90 is monotone in t (neighborhood function is monotone)
    val flags = rows.map(_.getBoolean(3))
    flags.sliding(2).foreach { case Array(a, b) => assert(!a || b) }
    // round 0 estimates |B(v,0)| = 1 per node: the sum is an m=16 HLL
    // estimate of... each node's own singleton — per-node est is
    // deterministic near 1; sum/1e6 must be within 20% of node count
    val n = Graph.customerSupplierEdges(spark, sf)
      .select("src").distinct().count()
    val est0 = n6.head.toDouble / 1e6
    assert(math.abs(est0 - n) / n < 0.2, s"est0 $est0 vs n $n")
  }

  test("Ranks range path under a >50%-dominant value: exact parity " +
    "AND ties split across buckets (no skewed bucket)") {
    // VERDICT r9 #4: the claim "a heavily repeated value splits by
    // tie" was argued, not measured. Fixture: ONE value owns 60% of
    // all rows; ranks must still match the single-window formulation
    // and no range bucket may exceed 2x the even-split target — i.e.
    // RangePartitioner's (value, tie) bounds really do cut THROUGH
    // the tie block instead of funneling it into one bucket.
    import org.apache.spark.sql.expressions.Window
    import graft.operators.Ranks
    val n = 2000L
    val buckets = 16
    val df = spark.range(n).select(
      when(col("id") < 1200, lit(5.0)) // 60% of rows share v=5.0
        .otherwise((col("id") % 40).cast("double")).as("v"),
      concat(lit("k"), format_string("%05d", col("id"))).as("k"),
      (col("id") % 9).cast("long").as("x"))
    val w = Window.orderBy(col("v"), col("k"))
    val want = df
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("c", sum(col("x"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .collect().map(_.toString).toSeq.sorted
    val got = Ranks.rankedRange(df, "v", "k", "r",
      runningSums = Seq("x" -> "c"), buckets = buckets)
      .collect().map(_.toString).toSeq.sorted
    assert(got == want)
    // balance: measure the actual bucket census of the SAME bucketing
    // the rank path used
    val sizes = Ranks.bucketedByRange(df, "v", "k", buckets)
      .groupBy("__g_bkt").count().collect().map(_.getLong(1))
    val target = n.toDouble / buckets
    info(s"bucket sizes (target $target): ${sizes.sorted.mkString(",")}" +
      s" — max/target = ${sizes.max / target}")
    assert(sizes.max <= 2 * target,
      s"max bucket ${sizes.max} vs target $target (sizes: ${
        sizes.sorted.mkString(",")})")
    CacheScope.release(spark)
  }

  test("hll_sketch_rollup: unions from different partial layouts " +
    "agree within tolerance; estimates near the known cardinality") {
    // known cardinality per group: g = id%2, u = id%1000 over 5000
    // ids → even ids hit even u, odd ids odd u → 500 distinct each.
    // NOTE measured here: DataSketches estimates are NOT
    // layout-independent (direct sketches keep the HIP estimator,
    // non-trivial unions use the composite one), so the contract is
    // tolerance, not equality — byMod vs byRange differed by up to 7
    // counts at 500 when this spec was written.
    val df = spark.range(5000).select(
      (col("id") % 2).as("g"), (col("id") % 1000).as("u"))
    def est(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("g").agg(hll_sketch_estimate(
        hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val byMod = est(df.groupBy(col("g"), expr("u % 7"))
      .agg(hll_sketch_agg(col("u")).as("sk")))
    val byRange = est(df.repartitionByRange(13, col("u"))
      .groupBy(col("g"), spark_partition_id().as("p"))
      .agg(hll_sketch_agg(col("u")).as("sk")))
    (byMod.keySet ++ byRange.keySet).foreach { g =>
      assert(math.abs(byMod(g) - byRange(g)) * 50 <= 500L,
        s"layouts disagree past 2%: $byMod vs $byRange")
    }
    (byMod.values ++ byRange.values).foreach(e =>
      assert(math.abs(e - 500L) * 20 <= 500L, s"estimate $e vs 500"))
    // the gate itself: booleans all true at sf0.001
    val g = graft.operators.Relational.hllSketchRollup(spark, sf).collect()
    assert(g.nonEmpty)
    g.foreach { r =>
      assert(r.getBoolean(2), s"merge_consistent false: $r")
      assert(r.getBoolean(3), s"est_ok false: $r")
    }
  }

  test("identifier_templated equals the literal-spelling query") {
    val got = Relational.identifierTemplated(spark, sf).collect()
      .map(_.toString).toSeq
    val want = spark.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_orders"),
        sum(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long"))
          .as("cents"))
      .orderBy("priority").collect().map(_.toString).toSeq
    assert(got == want)
  }
}
