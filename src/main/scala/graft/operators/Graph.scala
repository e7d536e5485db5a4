package graft.operators

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel
import graft.{CacheScope, Tables}

/** Graph tier: multi-source personalized PageRank + top-k extraction
  * (references: `RunPersonalizedPageRankBasic.java`,
  * `BuildPersonalizedPageRankRecords.java`,
  * `ExtractTopPersonalizedPageRankNodes.java`).
  *
  * The reference ran 2 chained MR jobs per iteration with per-reducer
  * side files carrying dangling mass and log-space floats for stability.
  * Here both fixpoint loops share one design: graph *structure* (edges
  * + out-degrees) is partitioned once and never moves again; each
  * iteration is one co-partitioned join (scatter) plus one shuffle of
  * the rank/label messages (gather); dangling mass / convergence ride
  * the iteration's single action as scalars (the reference's side-file
  * exchange, SURVEY S9).
  *
  * The two loops sit at different layers, each chosen by measurement:
  *  - PPR iterates DataFrames — its per-vertex state is a wide row of
  *    doubles and Tungsten's codegen'd join+agg over UnsafeRows beats
  *    an RDD cogroup loop ~2x per iteration; per-iteration Catalyst
  *    re-planning is bounded by `localCheckpoint` truncating lineage.
  *  - Connected components iterates RDDs with a pinned
  *    `HashPartitioner` (the GraphX/Pregel layout): its messages are
  *    bare `(Long, Long)` labels, cheap to move at any layer, and its
  *    rounds were planning-dominated as DataFrames (two checkpointed
  *    joins per round); the RDD loop makes per-round driver cost
  *    microseconds and needs no codegen warm-up.
  *
  * Multi-source PPR ranks are one column per source, so each iteration
  * is a single whole-stage-codegen'd aggregate regardless of source
  * count.
  */
object Graph {

  private def rankCol(i: Int) = s"rank_$i"

  /** Partition count for the iterative loops, derived from measured
    * table size rather than session config. Both loops move NARROW rows
    * (16-byte label tuples; edge + a handful of rank doubles), so two
    * regimes: spread across the cluster only once each task keeps
    * ~150k rows (per-stage task overhead is paid every iteration, so
    * near-empty tasks compound — a 50k-row target left ~1 MB tasks
    * where scheduling dominated, measured 2-2.5× slower rounds at
    * sf0.1), then grow with the data at ~4M rows (~64 MB) per task. A
    * 5B-edge graph gets ~1.2k partitions with no config change; the
    * sf0.1 fixture graph gets 8 instead of `spark.sql.shuffle
    * .partitions` near-empty ones.
    */
  private def loopParallelism(s: SparkSession, rows: Long): Int = {
    val byOverhead = math.min(s.sparkContext.defaultParallelism.toLong,
      rows / 150000L)
    val byMemory = rows / 4000000L
    math.max(1L, math.max(byOverhead, byMemory)).toInt
  }

  /** Parse the reference's adjacency-list text format (one line per node:
    * `nodeid[<ws>neighbor]*`, `BuildPersonalizedPageRankRecords.java:74-92`)
    * into an edges DataFrame(src, dst).
    */
  def adjacencyEdges(s: SparkSession, path: String): DataFrame = {
    val parts = split(trim(col("value")), "\\s+")
    s.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(
        element_at(parts, 1).cast("long").as("src"),
        // length bounded by size(parts), NOT Int.MaxValue: the
        // sentinel length overflows start+length in Slice's
        // interpreted eval and silently yields [] (codegen happens to
        // handle it — the two paths disagree, so never rely on it)
        slice(parts, lit(2), size(parts)).as("nbrs"))
      .select(col("src"), explode(col("nbrs")).as("dst"))
      .select(col("src"), col("dst").cast("long"))
  }

  /** Edge DataFrame → RDD[(src, dst)], one pass, no Catalyst round-trip
    * in the loop afterwards. */
  private def edgeRdd(edges: DataFrame): RDD[(Long, Long)] =
    edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => (r.getLong(0), r.getLong(1)))

  /** Multi-source personalized PageRank. `edges(src, dst)`; returns
    * `(id, rank_0 .. rank_{sources.size-1})`, one rank column per source.
    *
    * Semantics as the reference (`RunPersonalizedPageRankBasic.java
    * :291-370`, linear space): per iteration each node scatters
    * rank/outdeg to its out-neighbors; ALL teleport mass and ALL
    * missing (dangling) mass return to the source node itself:
    * source slot = alpha + (1-alpha)*(received + missing),
    * other nodes = (1-alpha)*received.
    */
  /** Run `body` with `spark.sql.shuffle.partitions` pinned to `p` and
    * AQE off — the PPR loop materializes per iteration (localCheckpoint
    * + observed scalars), so the conf at action time is what counts.
    * With the loop's partitioning already derived from the measured
    * graph size, AQE has nothing left to adapt and its per-exchange
    * re-planning just adds serial driver latency to every iteration.
    * Both settings are restored afterwards so one query's loop tuning
    * never leaks into the next query on the shared session.
    */
  private def withLoopConf[A](s: SparkSession, p: Int)(body: => A): A = {
    val keys = Seq("spark.sql.shuffle.partitions" -> p.toString,
      "spark.sql.adaptive.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> s.conf.get(k) }
    keys.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally prev.foreach { case (k, v) => s.conf.set(k, v) }
  }

  def personalizedPageRank(edges: DataFrame, sources: Seq[Long],
                           iterations: Int, alpha: Double = 0.15,
                           danglingFree: Boolean = false,
                           checkpointEvery: Int = 1): DataFrame = {
    val n = sources.size
    require(n > 0, "at least one source required")
    // cache the raw edge list first: vertices, out-degrees and the
    // structure table all derive from it, and the caller's edge
    // expression may be an arbitrarily expensive join
    val e = edges.select(col("src"), col("dst")).persist()
    val s = e.sparkSession
    val p = loopParallelism(s, e.count())
    import s.implicits._
    withLoopConf(s, p) {
    // the structure build runs INSIDE the pinned-partitions scope so the
    // distinct/join shuffles land directly on p partitions: their output
    // partitioning (hash(id,p) / hash(src,p)) is exactly what the loop
    // needs, so no explicit repartition — one fewer full pass over the
    // edge table, and the loop's scatter join still starts shuffle-free.
    val vertices = CacheScope.track(e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .persist())
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // structure side: edges with the sender's out-degree attached once,
    // hash-partitioned by src and cached, so the per-iteration scatter
    // join reuses this partitioning and only the (small) ranks side
    // shuffles — the cluster-scale equivalent is bucketing the edge
    // table by src so iterations never move the graph again.
    // (The loop itself stays a DataFrame loop: Tungsten's codegen'd
    // hash join/agg over UnsafeRows beats an RDD cogroup loop ~2x per
    // iteration here — measured both ways; connectedComponents below
    // makes the opposite call because its label messages are plain
    // longs and its rounds are planning-dominated.)
    // shuffle_hash hint: a broadcast of outdeg would leave struct in the
    // scan's file partitioning and force BOTH loop-join sides to shuffle
    // every iteration; the shuffle-hash join lands struct on hash(src,p)
    // (reusing outdeg's agg exchange on the build side)
    // lazy persists: unlike the dedup tier's fan-out caches, every loop
    // action references struct and vertices exactly ONCE, so there is
    // no stampede to pre-empt — the first iteration's job materializes
    // both, saving two build-time actions (~1.5s at sf0.1). `e` must
    // stay cached until then; it is dropped after the loop.
    val struct = CacheScope.track(
      e.join(outdeg.hint("shuffle_hash"), "src").persist())

    var ranks = vertices.select(
      col("id") +: sources.zipWithIndex.map { case (src, i) =>
        when(col("id") === src, 1.0).otherwise(0.0).as(rankCol(i))
      }: _*)

    for (it <- 1 to iterations) {
      val contribs = struct.join(ranks, struct("src") === ranks("id"))
        .select(
          col("dst").as("id") +:
            (0 until n).map(i => (col(rankCol(i)) / col("outdeg")).as(rankCol(i))): _*)
      if (danglingFree) {
        // FAST PATH for graphs the caller guarantees have no dangling
        // vertices (e.g. the symmetrized customer⇄supplier graph —
        // every vertex has out-edges by construction): missing mass is
        // structurally zero, so the per-iteration Observation feedback
        // and its driver round-trip disappear entirely, and iterations
        // chain LAZILY — each ranks plan is referenced exactly once by
        // the next, so `checkpointEvery` iterations fuse into one job
        // with no intermediate materialization. (GraphSpec proves this
        // path ≡ the generic path on the fixture graph; the oracle
        // drops its miss term in lockstep, see pprOracleSql.)
        val gathered0 = contribs.groupBy("id")
          .agg(sum(rankCol(0)).as(rankCol(0)),
            (1 until n).map(i => sum(rankCol(i)).as(rankCol(i))): _*)
        val gathered =
          if (it % checkpointEvery == 0) gathered0.localCheckpoint()
          else gathered0
        ranks = vertices.join(gathered, Seq("id"), "left")
          .select(
            col("id") +: (0 until n).map { i =>
              (lit(1.0 - alpha) * coalesce(col(rankCol(i)), lit(0.0)) +
                when(col("id") === sources(i), lit(alpha)).otherwise(0.0))
                .as(rankCol(i))
            }: _*)
      } else {
      // checkpoint the gathered result ONCE per iteration; the dangling-
      // mass scalars ride along as observed metrics on the SAME job (the
      // reference's per-reducer side files, S9, without their extra job:
      // one cluster round-trip per iteration total)
      val obs = org.apache.spark.sql.Observation()
      val gathered = contribs.groupBy("id")
        .agg(sum(rankCol(0)).as(rankCol(0)),
          (1 until n).map(i => sum(rankCol(i)).as(rankCol(i))): _*)
        .observe(obs, sum(rankCol(0)).as("m_0"),
          (1 until n).map(i => sum(rankCol(i)).as(s"m_$i")): _*)
        .localCheckpoint()
      // feed the scalars back through a broadcast 1-row LocalRelation,
      // NOT as literals: literals are baked into generated code, so a
      // fresh class would compile every iteration; broadcast-side values
      // stay out of the source text and the codegen cache keeps hitting.
      // Broadcasting a LocalRelation is driver-side — no job.
      val got = obs.get
      // null metric = no mass arrived anywhere (fully dangling graph)
      val missingRow = broadcast(Seq(
        (0 until n).map { i =>
          val m = got(s"m_$i")
          1.0 - (if (m == null) 0.0 else m.asInstanceOf[Double])
        })
        .toDF("m").select((0 until n).map(i =>
          element_at(col("m"), i + 1).as(s"miss_$i")): _*))
      val withAll = vertices.join(gathered, Seq("id"), "left")
        .crossJoin(missingRow)
      ranks = withAll.select(
        col("id") +: (0 until n).map { i =>
          val p = coalesce(col(rankCol(i)), lit(0.0))
          val base = lit(1.0 - alpha) * p
          (base + when(col("id") === sources(i),
            lit(alpha) + lit(1.0 - alpha) *
              coalesce(col(s"miss_$i"), lit(1.0))).otherwise(0.0))
            .as(rankCol(i))
        }: _*)
      // no second checkpoint: lineage above is one cheap join off the
      // checkpointed `gathered`
      }
    }
    e.unpersist(blocking = false)
    ranks
    }
  }

  /** Top-k nodes per source (reference `ExtractTopPersonalizedPageRank
    * Nodes.java:41-128`): returns (source, id, rank). The per-source
    * rank columns melt via `posexplode` into one pass with a rank-
    * filter window (plans `WindowGroupLimit`: each map task keeps its
    * local top-k before the per-source shuffle) — a union of per-source
    * sorts would instead evaluate the ranks plan once PER source and
    * grow the plan linearly with source count.
    */
  def topK(ranks: DataFrame, sources: Seq[Long], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val srcOf = element_at(array(sources.map(lit): _*), col("idx") + 1)
    ranks
      .select(col("id"), posexplode(array(
        sources.indices.map(i => col(rankCol(i))): _*)).as(Seq("idx", "rank")))
      .select(srcOf.as("source"), col("id"), col("rank"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("rank").desc, col("id"))))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Connected components by iterative min-label propagation (edges
    * treated as undirected): every node adopts the minimum component id
    * among itself and its neighbors until a fixpoint. Same RDD-loop
    * shape as PPR: structure cached and partitioned once, labels shuffle.
    * A pointer-jumping step after each propagation collapses label
    * chains exponentially, so rounds are O(log diameter) rather than
    * O(diameter) — the property that keeps the loop bounded on 100 TB
    * path-shaped graphs (small/large-star would be the next step up,
    * same join-shape machinery). Convergence is one scalar count rolled
    * into the round's single action.
    */
  /** Driver-side union-find for edge sets below `driverCutoff`: the
    * label-propagation loop pays ~3 shuffle rounds of cluster-wide
    * scheduling regardless of size, which for the kilobyte-scale pair
    * sets an LSH dedup emits is all overhead (measured ~1s per call at
    * sf0.1). Same answer as the loop: component = min reachable id.
    * The cutoff is on the COUNTED edge list, so a 100 TB graph always
    * takes the distributed path; this is the same small-input collapse
    * AQE applies to joins.
    */
  private def driverComponents(s: SparkSession,
                               edges: Array[(Long, Long)]): DataFrame = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val n = parent.getOrElse(c, c); parent(c) = r; c = n
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a); parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val rows = parent.keys.map(id => Row(id, find(id))).toSeq
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("comp", LongType, nullable = false)))
    s.createDataFrame(s.sparkContext.parallelize(rows, 1), schema)
  }

  def connectedComponents(edges: DataFrame, maxIter: Int = 20,
                          symmetric: Boolean = false,
                          driverCutoff: Int = 10000): DataFrame = {
    val s = edges.sparkSession
    val dir0 = edgeRdd(edges)
    // symmetrize in ONE pass over the input instead of a self-union,
    // which would evaluate the caller's edge expression twice; callers
    // with an already-undirected edge list skip the doubling entirely
    val raw = (if (symmetric) dir0
      else dir0.flatMap { case (a, b) => Iterator((a, b), (b, a)) })
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rawCount = raw.count()
    if (rawCount <= driverCutoff) {
      val collected = raw.collect()
      raw.unpersist(blocking = false)
      return driverComponents(s, collected)
    }
    val part = new HashPartitioner(loopParallelism(s, rawCount))
    // ONE shuffle lands the edges on their loop partitioning; duplicate
    // edges are dropped in-partition (every copy of (src,dst) hashes to
    // src's partition) instead of paying a global `distinct` shuffle
    // first — at 100 TB that is a full extra pass over the edge table.
    val und = raw.partitionBy(part).mapPartitions({ it =>
      val seen = new java.util.HashSet[(Long, Long)]()
      it.filter(seen.add)
    }, preservesPartitioning = true).persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    raw.unpersist(blocking = false)

    // after symmetrization every vertex appears as a src, so the initial
    // label table is an in-partition key dedupe — no vertices shuffle
    var labels: RDD[(Long, Long)] = und.mapPartitions({ it =>
      val seen = new java.util.HashSet[Long]()
      it.filter(kv => seen.add(kv._1)).map(kv => (kv._1, kv._1))
    }, preservesPartitioning = true)
    var prev: RDD[_] = null
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      // step 1: adopt the minimum label in the closed neighborhood
      val nbrMin = und.join(labels) // co-partitioned: narrow
        .map { case (_, (dst, comp)) => (dst, comp) }
        .reduceByKey(part, math.min(_: Long, _: Long)) // the round's message shuffle
      val prop = labels.leftOuterJoin(nbrMin) // narrow
        .mapPartitions(_.map { case (id, (comp, opt)) =>
          (id, math.min(comp, opt.getOrElse(comp)))
        }, preservesPartitioning = true)
        .persist(StorageLevel.MEMORY_AND_DISK)
      // step 2: pointer jump — adopt your label's label. Label chains
      // collapse exponentially: two label-table shuffles per round buy
      // O(log diameter) total rounds.
      val byComp = prop.map { case (id, comp) => (comp, id) } // shuffle
      val jumped = byComp.join(prop) // comp side now keyed like prop: narrow
        .map { case (comp, (id, compOfComp)) =>
          (id, math.min(comp, compOfComp))
        }
        .partitionBy(part) // shuffle back to the label layout
        .persist(StorageLevel.MEMORY_AND_DISK)
      // convergence scalar: the round's single action
      val changes = jumped.zipPartitions(labels, preservesPartitioning = false) {
        (a, b) =>
          val old = scala.collection.mutable.LongMap.empty[Long]
          b.foreach { case (id, comp) => old(id) = comp }
          var c = 0L
          a.foreach { case (id, comp) => if (comp != old(id)) c += 1 }
          Iterator.single(c)
      }.reduce(_ + _)
      converged = changes == 0L
      prop.unpersist(blocking = false)
      if (prev != null) prev.unpersist(blocking = false)
      prev = jumped
      labels = jumped
      i += 1
    }
    val schema = StructType(Seq(StructField("id", LongType, nullable = false),
      StructField("comp", LongType, nullable = false)))
    s.createDataFrame(labels.map { case (id, c) => Row(id, c) }, schema)
  }

  /** Out-degree distribution of the customer⇄supplier graph: degree →
    * node count, the first diagnostic run on any new graph (hub
    * detection, power-law sanity, skew planning for the iterative
    * loops). Two keyed aggregations, each partial-agg'd; the second
    * sees one row per node.
    */
  def degreeDistribution(s: SparkSession, dir: String): DataFrame =
    customerSupplierEdges(s, dir)
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))

  /** Neighborhood-Jaccard item similarity over the customer–supplier
    * bipartite graph: the `k` supplier pairs whose customer sets
    * overlap most (|A∩B| / |A∪B|, ties broken by the pair ids) — the
    * co-occurrence flavor of item-item collaborative filtering. Top-k
    * rather than a fixed threshold because meaningful similarity
    * levels scale with graph density (at sf0.01 every pair clears
    * 0.15; at sf0.1 none clears 0.05 — measured); rank-based output
    * is non-degenerate at every scale. The shared-count self-join on
    * the customer key enumerates only pairs with at least one common
    * customer (never the full supplier² cross), and degrees join back
    * by supplier, so inclusion–exclusion gives the union size without
    * materializing union sets; the final cut is a distributed top-k
    * (TakeOrderedAndProject). At 100 TB the guard is capping the
    * per-customer fan-out (a customer with d suppliers emits d² pairs
    * — drop or sample whale customers above a degree cut, same skew
    * treatment as the salted joins). An in-partition pair-expansion
    * variant (collect_set + nested transform, no self-join) measured
    * 1.7× SLOWER warm at sf0.1 (`tools.NjProbe`): array allocation
    * cost exceeds the join's shuffle savings at these set sizes.
    */
  def neighborJaccard(s: SparkSession, dir: String,
                      k: Int = 50): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
      .distinct()
      .persist()
    CacheScope.register(cs) // eager: degrees + both sides of the pair join
    val deg = cs.groupBy("sup").agg(count(lit(1)).as("deg"))
    val shared = cs.select(col("c"), col("sup").as("s1"))
      .join(cs.select(col("c"), col("sup").as("s2")), "c")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("shared"))
    shared
      .join(deg.select(col("sup").as("s1"), col("deg").as("d1")), "s1")
      .join(deg.select(col("sup").as("s2"), col("deg").as("d2")), "s2")
      .select(col("s1"), col("s2"), col("shared"),
        round(col("shared") / (col("d1") + col("d2") - col("shared")), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("s1"), col("s2"))
      .limit(k)
  }

  /** A deterministic bipartite-ish graph from the fixture tables for the
    * queries surface: customer ⇄ supplier whenever a lineitem links them
    * through an order. Supplier ids are offset to avoid key collision.
    */
  def customerSupplierEdges(s: SparkSession, dir: String,
                            supplierOffset: Long = 1000000L,
                            distinctPairs: Boolean = true): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val pairs0 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"),
        (col("l_suppkey") + supplierOffset).as("sup"))
    // PPR needs exact edge multiplicity (duplicates skew out-degrees),
    // but the components loop dedupes in-partition anyway — skipping
    // the distinct there removes a full shuffle of the edge table
    val pairs = if (distinctPairs) pairs0.distinct() else pairs0
    // both directions in one pass — a self-union would run the
    // lineitem⋈orders build twice
    pairs.select(explode(array(
        struct(col("c").as("src"), col("sup").as("dst")),
        struct(col("sup").as("src"), col("c").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
  }

  /** queries-surface entry: PPR over the customer⇄supplier graph. */
  def pprTopK(s: SparkSession, dir: String, sources: Seq[Long],
              iterations: Int, k: Int): DataFrame = {
    // the symmetrized graph has no dangling vertices, so the fast
    // lazy-chained path applies. checkpointEvery stays 1: the r11 A/B
    // of 2 (two scatter/gather rounds fused per job) measured 4.1 →
    // 6.7 s warm at sf0.1 — the multi-rank-column rows make the fused
    // double-join job slower than two materialized single-round jobs,
    // the opposite of the single-rank loops (textrank/pagerank), where
    // fusion won. localCheckpoint placement is semantics-neutral
    // either way.
    val ranks = personalizedPageRank(
      customerSupplierEdges(s, dir), sources, iterations,
      danglingFree = true, checkpointEvery = 1)
    // round BEFORE the top-k cut: mathematically tied ranks can differ
    // in the last ulps between engines (different add order); ranking
    // on the shared 9-dp rounding + id tiebreak keeps the selected SET
    // deterministic, not just the values
    val rounded = ranks.select(
      col("id") +: sources.indices.map(i =>
        round(col(rankCol(i)), 9).as(rankCol(i))): _*)
    topK(rounded, sources, k)
  }

  /** Triangle census over the supplier co-purchase projection: suppliers
    * are adjacent when they appear on the same order at least
    * `q`-quantile-many times (the cut adapts to the co-occurrence
    * distribution, so the projection stays sparse at every scale
    * instead of saturating). Triangles enumerate by the DEGREE-ORIENTED
    * wedge join (the compact-forward algorithm): every undirected edge
    * is directed from its (degree, id)-smaller endpoint to the larger,
    * wedges are pairs of out-edges of one vertex, and a wedge closes
    * iff its two tips are themselves an oriented edge. Orientation by
    * (degree, id) bounds every vertex's out-degree by O(sqrt(m)) — by
    * the graph's arboricity in practice — so a power-law hub's wedge
    * fan-out collapses from deg² to out-deg²: the refinement that keeps
    * the self-join's shuffle volume survivable at 100 TB, where
    * id-orientation would square a 10M-degree hub. Each triangle still
    * counts exactly once (its (degree, id)-minimum vertex owns it), and
    * all joins remain equality-keyed shuffles. Driver exchanges one
    * scalar (the quantile cut).
    */
  def triangleCensus(s: SparkSession, dir: String,
                     q: Double = 0.9): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey").distinct()
    val a = li.select(col("l_orderkey").as("k"), col("l_suppkey").as("s1"))
    val b = li.select(col("l_orderkey").as("k"), col("l_suppkey").as("s2"))
    val co = a.join(b, "k").filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      .persist()
    val thr = co.agg(percentile(col("c"), lit(q))).head().getDouble(0)
    val e = co.filter(col("c") >= thr)
      .select(col("s1").as("u"), col("s2").as("v"))
    val out = triangleCensusEdges(e)
    co.unpersist(blocking = false)
    out
  }

  /** Degree-oriented triangle/wedge census over an explicit undirected
    * edge list `(u, v)` with u < v and no duplicates — the census
    * kernel of [[triangleCensus]], factored out so the orientation's
    * fan-out bound is testable on synthetic (skewed) graphs.
    */
  def triangleCensusEdges(e: DataFrame): DataFrame = {
    // undirected degree of every endpoint, then orient low → high
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val or = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dt"))
      .persist()
    CacheScope.register(or) // eager: the wedge join fans out from `or` three ways
    // wedges = pairs of out-neighbors of one source, kept in (degree,
    // id) order so the closing edge — itself oriented low → high — can
    // only ever be (b, c), never (c, b)
    val w = or.select(col("s").as("a"), col("t").as("b"), col("dt").as("db"))
      .join(or.select(col("s").as("a"), col("t").as("c"), col("dt").as("dc")),
        "a")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    // wedges close against at most one (distinct) edge, so a left join
    // counts wedges and triangles in the same pass
    val closed = w.join(
      or.select(col("s").as("b"), col("t").as("c"), lit(1).as("hit")),
      Seq("b", "c"), "left")
    or.agg(count(lit(1)).as("n_edges")).crossJoin(
      closed.agg(count(lit(1)).as("n_wedges"),
        count(col("hit")).as("n_triangles")))
  }

  /** k-core peeling over the customer⇄supplier graph: `rounds`
    * synchronized rounds of "drop every vertex whose degree among
    * still-active vertices is < k", then the surviving membership with
    * its within-core degree. Fixed round count (not run-to-fixpoint)
    * so the computation is exactly restatable: the DuckDB oracle
    * unrolls the same rounds; a production caller loops until
    * `active.count()` stops changing — same per-round plan.
    *
    * Per round: two semi-join-shaped joins restrict the (cached) edge
    * table to active endpoints, one groupBy recounts degrees — all
    * shuffles on the vertex key, so at scale each round is one
    * co-partitioned pass over surviving edges; the active set shrinks
    * monotonically and is `localCheckpoint`ed per round to keep the
    * plan (which would otherwise double per round — `active` appears
    * under both endpoint joins) and the scheduler's lineage flat.
    */
  def kCore(s: SparkSession, dir: String, k: Int = 3,
            rounds: Int = 6): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: every round reads it twice
    // the active set is a bare id column and shrinks monotonically —
    // broadcast BOTH membership probes so the edge list never shuffles
    // (two hash-lookups per edge per round instead of two exchanges of
    // |E|). At a scale where the vertex set outgrows a broadcast
    // (~100M+ ids), drop the hint: the joins fall back to shuffles on
    // src/dst, still equality-keyed.
    def restrict(act: DataFrame): DataFrame = e
      .join(broadcast(act.select(col("id").as("src"))), "src")
      .join(broadcast(act.select(col("id").as("dst"))), "dst")
    // pinned loop parallelism (same regime as the PPR loop): each
    // round's joins/aggs shuffle narrow id rows, so near-empty
    // default-count partitions make scheduling dominate the round
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      var active = e.select(col("src").as("id")).distinct().localCheckpoint()
      for (_ <- 1 to rounds) {
        active = restrict(active)
          .groupBy("src").agg(count(lit(1)).as("c"))
          .filter(col("c") >= k)
          .select(col("src").as("id"))
          .localCheckpoint()
      }
      restrict(active).groupBy(col("src").as("id"))
        .agg(count(lit(1)).as("core_deg"))
    }
  }

  /** HITS hubs & authorities (Kleinberg) over the DIRECTED
    * customer→supplier half of the bipartite graph: `rounds`
    * synchronized mutual-reinforcement rounds (authority = sum of
    * pointing hubs, hub = sum of pointed-to authorities), each side
    * L1-normalized per round, then the top-`k` of each side by rounded
    * score. Fixed round count so the DuckDB oracle unrolls the exact
    * same updates.
    *
    * Each half-round is one equality join of the (cached) edge list
    * with the current score vector plus a groupBy on the opposite
    * endpoint — shuffles on vertex keys only, never on pairs. The
    * normalizer is a lazy one-row aggregate crossJoined back
    * (broadcast), not a driver action; un-normalized sums are
    * `localCheckpoint`ed so the normalize step doesn't recompute the
    * join. Final top-k is `orderBy(...).limit(k)` = distributed
    * TakeOrdered, never a global single-partition sort. Ranking cuts
    * on the 9-dp ROUNDED score (id tiebreak) so both engines make the
    * same cut decisions.
    */
  def hits(s: SparkSession, dir: String, rounds: Int = 3,
           k: Int = 20): DataFrame = {
    val pairs = customerSupplierEdges(s, dir)
      .filter(col("src") < lit(1000000L))
      .select(col("src").as("c"), col("dst").as("sup")).persist()
    graft.CacheScope.register(pairs) // eager: 2 joins per round read it
    def l1(df: DataFrame, v: String): DataFrame =
      df.crossJoin(broadcast(df.agg(sum(col(v)).as("_tot"))))
        .select(df.columns.filterNot(_ == v).map(col) :+
          (col(v) / col("_tot")).as(v): _*)
    // pinned loop parallelism (PPR regime): two narrow-row shuffles per
    // round; at the default partition count scheduling dominates
    val p = loopParallelism(s, pairs.count())
    val (auth, hub) = withLoopConf(s, p) {
      // the two half-rounds join on DIFFERENT keys, so one pinned copy
      // per key (r12, guide §2.4 — see katzCentrality): the raw cache
      // re-exchanged the edge projection on c AND sup every round
      val pc = graft.CacheScope.register(
        pairs.repartition(p, col("c")).persist())
      val ps = graft.CacheScope.register(
        pairs.repartition(p, col("sup")).persist())
      pairs.unpersist()
      var hub = pc.select(col("c")).distinct()
        .withColumn("h", lit(1.0)).localCheckpoint()
      var auth: DataFrame = null
      for (_ <- 1 to rounds) {
        auth = l1(pc.join(hub, "c")
          .groupBy("sup").agg(sum(col("h")).as("a")).localCheckpoint(), "a")
        hub = l1(ps.join(auth, "sup")
          .groupBy("c").agg(sum(col("a")).as("h")).localCheckpoint(), "h")
      }
      (auth, hub)
    }
    val topAuth = auth
      .orderBy(round(col("a"), 9).desc, col("sup"))
      .limit(k)
      .select(lit("auth").as("kind"), col("sup").as("id"),
        round(col("a"), 9).as("score"))
    val topHub = hub
      .orderBy(round(col("h"), 9).desc, col("c"))
      .limit(k)
      .select(lit("hub").as("kind"), col("c").as("id"),
        round(col("h"), 9).as("score"))
    topAuth.unionAll(topHub)
  }

  /** Adamic–Adar link prediction between suppliers through shared
    * customers: for every supplier pair with a common customer,
    * score = Σ 1/ln(deg(customer)) over the common customers, top-k
    * pairs. The wedge join fans out quadratically in customer degree,
    * so customers are DEGREE-CAPPED before the join (deg ∈ [2, cap]):
    * Σ deg² ≤ cap·|E| bounds wedge volume linearly in the edge count —
    * the orientation-free analogue of the triangle census's
    * degree-orient fix; a hub customer linked to every supplier says
    * nothing about supplier affinity anyway (the usual IDF-style
    * justification). Cut decisions (top-k) happen on the 6-dp ROUNDED
    * score with pair tiebreak, so both engines rank identically.
    * Measured (VERDICT r5 #5 re-check): 5.84 s standalone at sf0.1 /
    * local[32] on the unchanged plan — the r5 in-sequence 13.09 s
    * (vs r4's 8.80 s) was run-adjacent JVM state, not a plan
    * regression; Bench now GC-fences every 20 queries.
    */
  def adamicAdar(s: SparkSession, dir: String, k: Int = 50,
                 degCap: Int = 64): DataFrame = {
    val adj = customerSupplierEdges(s, dir)
      .filter(col("src") < lit(1000000L))
      .select(col("src").as("c"), col("dst").as("sup"))
    val deg = adj.groupBy("c").agg(count(lit(1)).as("deg"))
      .filter(col("deg").between(2, degCap))
    val wb = adj.join(deg, "c")
      .select(col("c"), col("sup"), (lit(1.0) / log(col("deg"))).as("w"))
      .persist()
    graft.CacheScope.register(wb) // eager: both wedge sides read it
    wb.join(wb.select(col("c"), col("sup").as("s2")), "c")
      .filter(col("sup") < col("s2"))
      .groupBy(col("sup").as("s1"), col("s2"))
      .agg(round(sum(col("w")), 6).as("aa_score"),
        count(lit(1)).as("common"))
      .orderBy(col("aa_score").desc, col("s1"), col("s2"))
      .limit(k)
  }

  /** Synchronous label-propagation communities (Raghavan et al.) over
    * the undirected customer⇄supplier graph: labels start as vertex
    * ids; each round every vertex adopts its neighbors' modal label
    * with a DETERMINISTIC tie-break (count desc, then min label) so
    * the rounds are exactly restatable — the DuckDB oracle unrolls the
    * same update rule per round; asynchronous/randomized LPA variants
    * trade that determinism for faster mixing. Output is the top-`k`
    * communities by final size.
    *
    * Per round: one equality join of the (cached) symmetric edge list
    * against the label vector on the neighbor key, a (vertex, label)
    * count, and a per-vertex argmax window — every shuffle is on a
    * vertex key, message volume is |E| rows/round, and the argmax
    * window partitions by vertex (never a global sort). Labels are
    * `localCheckpoint`ed per round: the next round's join would
    * otherwise replay the whole prefix and double the plan per round.
    */
  def labelPropagation(s: SparkSession, dir: String, rounds: Int = 3,
                       k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = customerSupplierEdges(s, dir).persist()
    CacheScope.register(e) // eager: one join per round reads it
    // pinned loop parallelism (PPR regime): the per-round join/agg/
    // window all move narrow (id, lbl) rows — near-empty default-count
    // partitions would make scheduling dominate every round
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      labelPropAssign(e, rounds)
        .groupBy(col("lbl").as("community"))
        .agg(count(lit(1)).as("members"))
        .orderBy(col("members").desc, col("community"))
        .limit(k)
    }
  }

  /** The label-propagation loop itself: (id, lbl) after `rounds`
    * deterministic modal-label rounds — shared by [[labelPropagation]]
    * and [[modularity]]. Caller pins loop parallelism.
    */
  private def labelPropAssign(e: DataFrame, rounds: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // pin the loop's edge copy onto hash(dst) partitions once (r12,
    // guide §2.4 — see katzCentrality): the caller's scan-partitioned
    // cache re-exchanged the full edge table every round (StageProbe:
    // 5 × 1.17M-row exchanges per query at sf0.1). Row movement only.
    val ed = graft.CacheScope.register(
      e.select(col("src"), col("dst")).repartition(col("dst")).persist())
    var lab = ed.select(col("src").as("id")).distinct()
      .withColumn("lbl", col("id")).localCheckpoint()
    for (_ <- 1 to rounds) {
      lab = ed.join(lab.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("id").orderBy(col("cnt").desc, col("lbl"))))
        .filter(col("rn") === 1)
        .select("id", "lbl")
        .localCheckpoint()
    }
    lab
  }

  /** Newman modularity of the label-propagation communities (W243):
    * Q = Σ_c [ e_c/m − (d_c/2m)² ] — the single number that says
    * whether the community op found real structure (Q near 0 = the
    * partition explains nothing beyond degree chance; this bipartite
    * co-purchase graph scores low by construction, which is itself
    * the finding). The quality gate for `label_prop`, exactly as
    * `ann_recall` gates the IVF index. With both edge orientations
    * present, e_c/m = intra_c/|directed| and d_c/2m = deg_c/|directed|,
    * so every sufficient statistic is an exact integer count; each
    * community's term floor-quantizes to a 1e-12 LONG before the
    * order-free sum. Two keyed joins of the edge list against the
    * (id → label) table; nothing quadratic.
    */
  def modularity(s: SparkSession, dir: String, rounds: Int = 3): DataFrame = {
    val e = customerSupplierEdges(s, dir).persist()
    CacheScope.register(e) // eager: the loop + both modularity joins
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      val lab = labelPropAssign(e, rounds).persist()
      CacheScope.register(lab)
      val de = e.count()
      val intra = e
        .join(lab.select(col("id").as("src"), col("lbl").as("ls")), "src")
        .join(lab.select(col("id").as("dst"), col("lbl").as("ld")), "dst")
        .filter(col("ls") === col("ld"))
        .groupBy(col("ls").as("lbl")).agg(count(lit(1)).as("inc"))
      val degC = e
        .join(lab.select(col("id").as("src"), col("lbl")), "src")
        .groupBy("lbl").agg(count(lit(1)).as("dc"))
      degC.join(intra, Seq("lbl"), "left")
        .select(
          floor((coalesce(col("inc"), lit(0L)).cast("double") / de -
            (col("dc").cast("double") / de) *
              (col("dc").cast("double") / de)) * lit(1e12) + lit(0.5))
            .cast("long").as("qi"))
        .agg(sum(col("qi")).as("qsum"), count(lit(1)).as("nc"))
        .select(col("nc").as("n_communities"),
          lit(de / 2).as("m_edges"),
          (floor(col("qsum").cast("double") / lit(1e12) * lit(1e6) +
            lit(0.5)) / lit(1e6)).as("modularity"))
    }
  }

  /** Distinct 2-hop reach per vertex: how many OTHER vertices are
    * reachable in exactly ≤2 undirected hops — the neighborhood-size
    * feature fraud/influence models consume. Two equality self-joins on
    * vertex keys; `degCap` drops hub intermediates first (a 10M-degree
    * hub would otherwise fan every neighbor pair through itself —
    * same quadratic-control rule as the wedge ops), so candidate volume
    * is Σ deg² over CAPPED degrees. The 1-hop and 2-hop sets union
    * before the distinct count, self excluded. Top-`k` by (reach desc,
    * id) keeps the result bounded at any graph size.
    */
  def twoHopReach(s: SparkSession, dir: String, k: Int = 50,
                  degCap: Int = 64): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: degree filter + both hop joins
    // the degree table is |V| rows — broadcast it so the cap filter
    // never shuffles the edge list; the wedge join proper hashes on
    // the (vertex) mid key with the edge list as build side
    // deg (|V| rows) feeds three subtrees — the two mid broadcast
    // builds (AQE plans each join side's broadcast separately) and the
    // final reach join; registered so the 1.17M-row aggregate runs once
    val deg = graft.CacheScope.register(
      e.groupBy(col("src")).agg(count(lit(1)).as("deg")).persist())
    val mid = deg.filter(col("deg") <= degCap).select(col("src").as("m"))
    // OPTIMIZATION r12 (guide §2.3 shuffle fewer bytes / VERDICT r11
    // #4): the old plan deduped the full (id, r) wedge stream UNION the
    // edge list through one countDistinct — ~10.5M rows into the heavy
    // hash aggregate at sf0.1. Two structural facts make half of that
    // work redundant:
    //  1. the graph is BIPARTITE by construction (supplierOffset keeps
    //     the two key spaces disjoint), so 1-hop targets (opposite
    //     side) never collide with 2-hop targets (same side) and the
    //     1-hop distinct count is just the degree (e holds distinct
    //     pairs); the union into one dedup was pure overhead;
    //  2. the 2-hop relation is SYMMETRIC (e is symmetrized and the
    //     mid cap applies to the middle vertex), so every unordered
    //     pair was generated and deduped twice (a—m—b and b—m—a).
    //     Orienting the pair stream (a < b) halves the dedup input;
    //     each surviving pair then counts toward BOTH endpoints via a
    //     cheap well-collapsing per-id count.
    // reach(id) = deg(id) + #{distinct oriented 2-hop pairs touching
    // id} — value-identical (oracle-verified at sf0.01/sf0.1; parity
    // with the old formulation pinned in TwoHopReachSpec).
    // ONE mid-filtered projection serves both self-join sides (e is
    // symmetric, so (dst→m, src→a) and (src→m, dst→b) are the same row
    // set): the broadcast mid filter drops uncapped hubs from BOTH
    // sides before the m-shuffle (the build side previously shuffled
    // the full edge list), and the identical canonical subtrees let
    // the exchange be planned once and reused.
    val em = e.select(col("src").as("m"), col("dst").as("x"))
      .join(broadcast(mid), "m")
    val p2 = em.select(col("m"), col("x").as("a"))
      .join(em.select(col("m"), col("x").as("b")).hint("shuffle_hash"), "m")
      .filter(col("a") < col("b"))
      .select("a", "b").distinct()
    // both endpoints in ONE pass over p2 (a self-union would plant the
    // whole wedge+distinct subtree twice in the plan — StageProbe
    // showed the 4.7M-row stage running once per union side)
    val cnt2 = p2.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("c2"))
    deg.select(col("src").as("id"), col("deg"))
      .join(cnt2, Seq("id"), "left")
      .select(col("id"),
        (col("deg") + coalesce(col("c2"), lit(0L))).as("reach"))
      .orderBy(col("reach").desc, col("id"))
      .limit(k)
  }

  /** Degree assortativity of the undirected graph: the Pearson
    * correlation between the degrees at the two ends of every edge
    * (Newman 2002) — positive means hubs attach to hubs, negative the
    * bipartite/star pattern. Sufficient statistics (Σx, Σx², Σxy over
    * directed edge ends) are EXACT integer sums — degrees are ints —
    * so the final correlation is one double expression over identical
    * exact inputs on both engines; only it is floor-quantized. One
    * degree agg + one edge join; nothing quadratic anywhere.
    */
  def assortativity(s: SparkSession, dir: String): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: degrees + the edge join read it
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val ends = e
      .join(deg.select(col("id").as("src"), col("deg").as("dx")), "src")
      .join(deg.select(col("id").as("dst"), col("deg").as("dy")), "dst")
    val stats = ends.agg(
      count(lit(1)).as("m"),
      sum(col("dx")).as("sx"),
      sum(col("dx") * col("dx")).as("sxx"),
      sum(col("dx") * col("dy")).as("sxy"))
    // undirected: each edge appears in both orientations, so the x and
    // y marginals are identical — one pass collects all three moments
    val m = col("m").cast("double")
    val mean = col("sx") / m
    val cov = col("sxy") / m - mean * mean
    val va = col("sxx") / m - mean * mean
    stats.select(col("m").as("n_edge_ends"),
      (floor(cov / va * lit(1e6) + lit(0.5)) / lit(1e6)).as("assortativity"))
  }

  /** Hill tail-index estimator over the degree distribution: α̂ =
    * m / Σ_{i≤m} ln(d_i / d_(m)) on the top-`m` order statistics —
    * the principled power-law-tail exponent (the degree-side
    * counterpart of `zipf_fit`'s token fit, and the number that says
    * whether hub mitigation like degree caps is even needed). The
    * degree aggregation is the only corpus-bound stage; the top-m cut
    * is a TakeOrdered and the estimator is O(m). Each ln ratio
    * floor-quantizes to the 1e-9 LONG grid before the order-free sum;
    * a uniform tail (all ratios 1) surfaces α = 0 by the zero-sum
    * guard rather than a division blow-up.
    */
  def hillTailIndex(s: SparkSession, dir: String, m: Int = 50): DataFrame = {
    val e = customerSupplierEdges(s, dir).select(col("src"), col("dst"))
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val top = deg.orderBy(col("deg").desc, col("id")).limit(m)
    val dm = top.agg(min(col("deg")).as("dmin"))
    top.crossJoin(broadcast(dm))
      .select(col("dmin"),
        floor(log(col("deg").cast("double") / col("dmin")) * lit(1e9)
          + lit(0.5)).cast("long").as("l9"))
      .groupBy("dmin")
      .agg(count(lit(1)).as("m"), sum("l9").as("sl"))
      .select(col("m"), col("dmin").as("d_tail_min"),
        when(col("sl") > 0,
          graft.operators.Events.q(col("m").cast("double") /
            (col("sl").cast("double") / lit(1e9)), 6))
          .otherwise(lit(0.0)).as("alpha"))
  }

  /** Multi-hop BFS distances from one source over the undirected
    * customer⇄supplier graph: (id, dist) for every vertex within
    * `maxHops`. The frontier loop is the textbook distributed BFS —
    * per hop one equality join of the (cached, pinned-partition) edge
    * list against the CURRENT frontier only, anti-joined against the
    * visited set, so each round moves |frontier| rows, never the
    * graph. The DuckDB restatement is a recursive CTE with the same
    * min-distance semantics — a coverage point for iterative reach
    * queries (the reference's PPR loop is the weighted cousin).
    */
  /** The ONE multi-source frontier kernel behind [[bfsDistances]],
    * [[eccentricitySample]], [[harmonicCentrality]] and
    * [[shortestPathCounts]]: returns (source, id, dist, n_paths) for
    * every vertex within `maxHops` of each source — min-hop distance
    * plus the number of distinct shortest paths (σ_v = Σ σ_u over
    * parents one hop closer; plain-BFS callers just drop the column,
    * the sum costs the same shuffle the distinct did). Per hop: one
    * equality join of the cached edge list against the CURRENT
    * frontier only, a per-(source, dst) partial-agg'd path sum, and an
    * anti-join against the rings seen so far. Only the NEW ring is
    * localCheckpoint'ed; the visited set stays a lazy union of the
    * already-checkpointed rings — the former per-operator loops also
    * re-materialized the whole visited set every round (O(V) copied
    * rows per hop, gone here).
    */
  private def frontierLoop(e: DataFrame, sources: Seq[Long],
                           maxHops: Int): DataFrame =
    frontierRings(e, sources, maxHops).reduce(_ unionAll _)

  /** The ring-per-hop view of [[frontierLoop]] for callers that walk
    * levels individually (the Brandes backward pass): ring(d) is
    * already its own checkpointed frame, so exposing the vector saves
    * re-filtering the unioned BFS table once per level.
    */
  private def frontierRings(e: DataFrame, sources: Seq[Long],
                            maxHops: Int): Vector[DataFrame] = {
    val s = e.sparkSession
    import s.implicits._
    var rings = Vector(sources.toDF("source")
      .select(col("source"), col("source").as("id"),
        lit(0).as("dist"), lit(1L).as("n_paths"))
      .localCheckpoint())
    var hop = 0
    // OPTIMIZATION r11 (guide §4): the ring distance is carried as
    // min(dist) + 1 from the (constant-dist) frontier instead of the
    // loop variable baked in as `lit(hop)` — the hop-invariant plan
    // text lets whole-stage codegen compile the per-hop join/agg shape
    // once for the whole loop. Identical values: every frontier row
    // has dist == hop − 1.
    while (hop < maxHops) {
      hop += 1
      val frontier = rings.last
      val seen = rings.map(_.select("source", "id")).reduce(_ unionAll _)
      val next = e.join(frontier.select(col("source"),
          col("id").as("src"), col("dist"), col("n_paths")), "src")
        .groupBy(col("source"), col("dst"))
        .agg(sum("n_paths").as("n_paths"), min(col("dist")).as("pd"))
        .select(col("source"), col("dst").as("id"),
          (col("pd") + 1).as("dist"), col("n_paths"))
        .join(seen, Seq("source", "id"), "left_anti")
        .select(col("source"), col("id"), col("dist"), col("n_paths"))
        .localCheckpoint()
      rings :+= next
    }
    rings
  }

  def bfsDistances(s: SparkSession, dir: String, source: Long,
                   maxHops: Int = 4): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: every hop joins it
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      // pin the loop's edge cache onto hash(src, p) once (r12, guide
      // §2.4 — see katzCentrality): the scan-partitioned cache
      // re-exchanged the full edge table every hop (StageProbe)
      val ed = graft.CacheScope.register(
        e.repartition(p, col("src")).persist())
      e.unpersist()
      frontierLoop(ed, Seq(source), maxHops).select("id", "dist")
    }
  }

  /** HyperANF neighborhood function + effective diameter (W549 —
    * Boldi/Rosa/Vigna, WWW'11): per-node HLL registers approximate
    * |B(v,t)| (distinct nodes within t hops), one register-MAX merge
    * along edges per round — the ONLY known way to estimate a 100 TB
    * graph's distance distribution without all-pairs BFS. State is
    * ONE row per node carrying the m=16 registers as an array, so a
    * merge round is exactly |E| message rows folded by 16 COLUMNAR
    * partial-agg'd MAXes (the registers-as-rows layout shuffled m·|E|
    * rows and measured 2× the wall-clock at sf0.1); the register-max
    * merge is idempotent/commutative/monotone, so retries and
    * duplicates are free. The per-node estimate is the
    * `hll_error_audit` formula verbatim (exact powers-of-two harmonic
    * sum, deterministic linear-counting branch, replicable hash), each
    * estimate quantized to a 1e-6 LONG BEFORE the global sum so N(t)
    * is merge-order-free. Surfaced per round: N6(t), the exact-integer
    * fraction of the horizon mass (DECIMAL-safe ×10⁹ div), and the
    * ≥90% flag whose first true row IS the effective diameter. (The
    * oracle keeps the equivalent registers-as-rows spelling — an
    * absent row IS a zero slot.)
    */
  def effectiveDiameter(s: SparkSession, dir: String,
                        rounds: Int = 3): DataFrame = {
    import graft.expressions.HashExpressions.polyHashArray
    val m = 16
    // NOTE: unlike the label/rank loops this one does NOT pin
    // loopParallelism — message rows carry a 16-slot array (wide), so
    // the narrow-row 150k-rows/task sizing under-parallelizes the
    // CPU-bound 16-max fold (measured 13.5 s vs 10.2 s at sf0.1)
    // register (eager, r11): AQE materializes the first job's query
    // stages concurrently, and a LAZY persist let them race — the
    // 1.17M-row edge build ran 3× per query (StageProbe).
    // r12 (guide §2.4): the cache is additionally pinned onto
    // hash(dst) partitions so the per-round register-merge join reads
    // it shuffle-free — the scan-partitioned cache re-exchanged the
    // full edge table every round (StageProbe: 4 × 1.17M-row
    // exchanges per query). Row movement only.
    val e = CacheScope.register(customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).repartition(col("dst")).persist())
    val nodes = e.select(col("src").as("id")).distinct()
    val h0 = element_at(polyHashArray(array(col("id").cast("string"))), 1)
    val h = (1 to 4).foldLeft(h0) { (acc, _) =>
      val hm = (acc * lit(8388593L)) % lit(1099511627776L)
      hm.bitwiseXOR(shiftright(hm, 20))
    }
    val suffix = shiftright(h, 4)
    val bitlen = coalesce(
      ((35 to 0 by -1).map(k =>
        when(suffix >= lit(1L << k), lit(k + 1))) :+ lit(0)): _*)
    var regs = nodes
      .select(col("id"), pmod(h, lit(m.toLong)).as("bucket"),
        (lit(37) - bitlen).cast("long").as("mj"))
      .select(col("id"), transform(sequence(lit(0L), lit(m - 1L)),
        i => when(i === col("bucket"), col("mj")).otherwise(lit(0L)))
        .as("arr"))
      .localCheckpoint()
    val perRound = collection.mutable.ArrayBuffer((0, regs))
    val maxes = (1 to m).map(i =>
      max(element_at(col("arr"), i)).as(s"__m$i"))
    // measured at sf0.1: the default AQE plan (10.2 s) beats both a
    // pinned-parallelism loop (13.5 s — wide array rows break the
    // narrow-row task sizing) and a shuffle_hash hint (11.5 s); leave
    // strategy choice to AQE here
    for (t <- 1 to rounds) {
      regs = e.join(regs, col("dst") === col("id"))
        .select(col("src").as("id"), col("arr"))
        .unionAll(regs)
        .groupBy("id").agg(maxes.head, maxes.tail: _*)
        .select(col("id"),
          array((1 to m).map(i => col(s"__m$i")): _*).as("arr"))
        .localCheckpoint()
      perRound += ((t, regs))
    }
    val nf = perRound.map { case (t, r) =>
      r.select(
          aggregate(col("arr"), lit(0.0),
            (acc, mj) => acc + pow(lit(2.0), -mj.cast("double")))
            .as("ssum"),
          size(filter(col("arr"), mj => mj === 0L)).cast("long").as("v"))
        .select((lit(0.673) * lit(256.0) / col("ssum")).as("e_raw"),
          col("v"))
        .select(when(col("e_raw") <= lit(2.5 * m) && col("v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")).as("e"))
        .select(floor(col("e") * lit(1e6) + lit(0.5)).cast("long")
          .as("e6"))
        .agg(sum(col("e6")).as("n6"))
        .select(lit(t.toLong).as("t"), col("n6"))
    }.reduce(_ unionAll _)
    val fin = nf.filter(col("t") === lit(rounds.toLong))
      .select(col("n6").as("nfv"))
    val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    nf.crossJoin(broadcast(fin))
      .withColumn("frac9", call_function("div",
        dec(col("n6")) * dec(lit(1000000000L)), dec(col("nfv"))))
      .select(col("t"), col("n6"), col("frac9"),
        (col("frac9") >= lit(900000000L)).as("reached90"))
      .orderBy("t")
  }

  /** Cut conductance of candidate communities (W548) — for each
    * nation-induced vertex set S (customers and suppliers of nation
    * k), φ(S) = cut(S, S̄) / min(vol(S), vol(V)−vol(S)): the standard
    * community-quality score (low φ = a real community, φ → 1 = an
    * arbitrary slice), the metric that VALIDATES any partition before
    * it drives sharding or sampling decisions. On the symmetrized
    * edge list vol(S) is exactly the directed edges leaving S-rows
    * and cut counts mixed-endpoint edges once per direction, so the
    * whole computation is: two keyed joins to tag endpoints with
    * their nation + ONE partial-agg'd pass (vol = count, cut = count
    * of mixed), then an exact integral 1e-6-grid division. No
    * per-community subgraph materialization, no driver loop — at
    * 100 TB this is two shuffles regardless of community count.
    */
  def conductance(s: SparkSession, dir: String): DataFrame = {
    val e = customerSupplierEdges(s, dir)
    val nodeGrp = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("id"),
        col("c_nationkey").cast("long").as("grp"))
      .unionAll(Tables.supplier(s, dir)
        .select((col("s_suppkey") + lit(1000000L)).as("id"),
          col("s_nationkey").cast("long").as("grp")))
    val tagged = e
      .join(nodeGrp.select(col("id").as("src"), col("grp").as("sgrp")),
        Seq("src"))
      .join(nodeGrp.select(col("id").as("dst"), col("grp").as("dgrp")),
        Seq("dst"))
    val per = tagged.groupBy(col("sgrp").as("nation"))
      .agg(count(lit(1)).as("vol"),
        sum(when(col("sgrp") =!= col("dgrp"), 1L).otherwise(0L))
          .as("cut"))
    val total = per.agg(sum(col("vol")).as("vtot"))
    per.crossJoin(broadcast(total))
      .select(col("nation"), col("vol"), col("cut"),
        Ranks.exactDiv(col("cut") * lit(1000000L),
          least(col("vol"), col("vtot") - col("vol"))).as("phi6"))
      .orderBy("nation")
  }

  /** Deterministic hash-seeded random walks (W541) — the node2vec/
    * DeepWalk CORPUS GENERATOR re-expressed so it is replayable and
    * oracle-able: at step t from node u the walk moves to the neighbor
    * v minimizing a scrambled integer hash h(u,t,v) (v as tie-break),
    * which is a fixed pseudo-random choice — same walks on any
    * cluster, any partitioning, any retry, with no RNG state to
    * coordinate across executors (the property that makes sampled
    * walk corpora reproducible at 100 TB). Each step is ONE
    * shuffle join of the frontier against the cached edge table plus
    * a per-seed argmin (`min(struct(h, dst))` — partial-aggregated,
    * never a sort); T steps = T keyed joins, frontier rows = |seeds|
    * throughout, `localCheckpoint` bounds the loop's lineage exactly
    * like the PPR loop above. The hash is the replicable affine +
    * 2×(multiply, xorshift) mix on the [0, 2^40) grid every sketch op
    * here shares — both engines walk identical integers.
    */
  def hashWalks(s: SparkSession, dir: String, steps: Int = 4): DataFrame = {
    // argmin over a multiset equals argmin over its set, so edge
    // MULTIPLICITY cannot change a walk — skip the distinct()'s full
    // edge shuffle (the components loop makes the same cut)
    val e = CacheScope.track(
      customerSupplierEdges(s, dir, distinctPairs = false)
        .select(col("src"), col("dst")).persist())
    val seeds = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("seed"))
      .filter(pmod(col("seed"), lit(100L)) === lit(1L))
      .join(e, col("seed") === col("src"), "left_semi")
    var walk = seeds
      .select(col("seed"), lit(0L).as("step"), col("seed").as("node"))
      .localCheckpoint()
    val levels = collection.mutable.ArrayBuffer(walk)
    // OPTIMIZATION r11 (guide §4): the step index rides the carried
    // `step` column ((step + 1) everywhere the former code baked the
    // loop variable `t` in as a literal), so all `steps` rounds share
    // ONE generated-code shape and janino compiles it once. Identical
    // integers: step + 1 == t on every row of the round's frontier.
    for (_ <- 1 to steps) {
      val z0 = pmod(col("node") * lit(1000003L) +
        (col("step") + lit(1L)) * lit(999983L) + col("dst"),
        lit(1099511627776L))
      val h = (1 to 2).foldLeft(z0) { (acc, _) =>
        val hm = (acc * lit(8388593L)) % lit(1099511627776L)
        hm.bitwiseXOR(shiftright(hm, 20))
      }
      walk = walk.join(e, col("node") === col("src"))
        .select(col("seed"), col("step"), h.as("h"), col("dst"))
        .groupBy("seed", "step")
        .agg(min(struct(col("h"), col("dst"))).as("m"))
        .select(col("seed"), (col("step") + lit(1L)).as("step"),
          col("m.dst").as("node"))
        .localCheckpoint()
      levels += walk
    }
    levels.reduce(_ unionAll _).orderBy("seed", "step")
  }

  /** Classic global PageRank (uniform teleport) over the undirected
    * customer⇄supplier graph, fixed `rounds`, top-`k` by 9-dp rounded
    * rank with id tiebreak. The reference only ships the PERSONALIZED
    * variant (SURVEY G1-G8); this is its textbook cousin, same loop
    * shape: structure cached on pinned partitions, only the rank
    * vector shuffles per round, `localCheckpoint` bounds lineage. The
    * symmetrized graph has no dangling vertices, so the missing-mass
    * feedback term is structurally zero and the oracle unrolls as
    * plain scatter/gather CTE rounds.
    */
  def pagerankGlobal(s: SparkSession, dir: String, rounds: Int = 6,
                     alpha: Double = 0.15, k: Int = 20): DataFrame = {
    val e = CacheScope.track(customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist())
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      val struct0 = CacheScope.track(
        e.join(outdeg.hint("shuffle_hash"), "src").persist())
      val nodes = CacheScope.track(
        e.select(col("src").as("id")).distinct().persist())
      val n = nodes.count()
      var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
      // checkpoint EVERY round (r12 revert of the r11 every-2nd-round
      // fusion): the builder's own full cold board contradicted the
      // isolated warm A/B — pagerank_global task 55→60 s WITH the fusion
      // (VERDICT r11 #3/#6); the fused double-join job's larger live
      // state loses what the removed barrier saves.
      for (_ <- 1 to rounds) {
        ranks = struct0.join(ranks, struct0("src") === ranks("id"))
          .select(col("dst").as("id"), (col("r") / col("outdeg")).as("c"))
          .groupBy("id").agg(sum("c").as("recv"))
          .select(col("id"),
            (lit(alpha / n) + lit(1.0 - alpha) * col("recv")).as("r"))
          .localCheckpoint()
      }
      ranks
        .orderBy(round(col("r"), 9).desc, col("id"))
        .limit(k)
        .select(col("id"), round(col("r"), 9).as("rank"))
    }
  }

  /** Edge-WEIGHTED personalized PageRank from one source: scatter is
    * rank·w(u,v)/W(u) where W(u) is the total out-weight — here the
    * weight is the customer↔supplier LINK MULTIPLICITY (how many order
    * lines connect them), so heavily-transacting neighbors receive
    * proportionally more mass than the reference's uniform scatter
    * (G1-G8) gives them. Same loop shape as every fixpoint here:
    * weighted structure cached on pinned hash(src) partitions, only
    * ranks shuffle per round; the symmetrized graph has no dangling
    * vertices so teleport mass is the only feedback. Top-`k` cut on
    * the 9-dp rounded rank, id tiebreak.
    */
  def weightedPpr(s: SparkSession, dir: String, source: Long = 1L,
                  rounds: Int = 6, alpha: Double = 0.15,
                  k: Int = 20): DataFrame = {
    val e = CacheScope.track(
      customerSupplierEdges(s, dir, distinctPairs = false)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .persist())
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      val outw = e.groupBy("src").agg(sum("w").as("wout"))
      val struct0 = CacheScope.track(
        e.join(outw.hint("shuffle_hash"), "src").persist())
      val nodes = CacheScope.register( // eager (r11): round 1 reads it
        e.select(col("src").as("id")).distinct().persist()) // from 2 subtrees
      var ranks = nodes.select(col("id"),
        when(col("id") === source, 1.0).otherwise(0.0).as("r"))
      // checkpoint EVERY round (r12 revert of the r11 every-2nd-round
      // fusion): the builder's own full cold board contradicted the
      // isolated warm A/B — weighted_ppr task 57→73 s WITH the fusion
      // (VERDICT r11 #3/#6).
      for (_ <- 1 to rounds) {
        val gathered = struct0.join(ranks, struct0("src") === ranks("id"))
          .select(col("dst").as("id"),
            (col("r") * col("w") / col("wout")).as("c"))
          .groupBy("id").agg(sum("c").as("recv"))
        ranks = nodes.join(gathered, Seq("id"), "left")
          .select(col("id"),
            (lit(1.0 - alpha) * coalesce(col("recv"), lit(0.0)) +
              when(col("id") === source, lit(alpha)).otherwise(lit(0.0)))
              .as("r"))
          .localCheckpoint()
      }
      ranks
        .orderBy(round(col("r"), 9).desc, col("id"))
        .limit(k)
        .select(col("id"), round(col("r"), 9).as("rank"))
    }
  }

  /** Sampled eccentricity: per source in `sources`, the max BFS
    * distance reached within `maxHops` and the vertex count at each
    * distance ring — the diameter-estimation probe (exact diameter is
    * all-pairs; sampling sources bounds it from below, the standard
    * trick). ONE multi-source frontier loop — the frontier carries
    * (source, id) pairs so all sources advance in the same per-hop
    * join against the cached edge list; work is Σ|frontier| per hop,
    * never |sources|× separate traversals of the job graph.
    */
  def eccentricitySample(s: SparkSession, dir: String,
                         sources: Seq[Long] = Seq(1L, 2L, 3L),
                         maxHops: Int = 4): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: every hop joins it
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      // pin the loop's edge cache onto hash(src, p) once (r12, guide
      // §2.4 — see katzCentrality): the scan-partitioned cache
      // re-exchanged the full edge table every hop (StageProbe)
      val ed = graft.CacheScope.register(
        e.repartition(p, col("src")).persist())
      e.unpersist()
      frontierLoop(ed, sources, maxHops)
        .groupBy("source", "dist")
        .agg(count(lit(1)).as("n_nodes"))
    }
  }

  /** Harmonic centrality (sampled): per source, Σ 1/d(s, v) over the
    * vertices reached within `maxHops` — the centrality that stays
    * finite on disconnected graphs (closeness diverges). Rides the
    * SAME multi-source frontier loop as [[eccentricitySample]]; the
    * final score is one fixed four-term expression over the per-ring
    * counts (n₁/1 + n₂/2 + …), so no float accumulates in
    * engine-private order.
    */
  def harmonicCentrality(s: SparkSession, dir: String,
                         sources: Seq[Long] = Seq(1L, 2L, 3L),
                         maxHops: Int = 4): DataFrame = {
    val ringCols = (0 to maxHops).map(d =>
      sum(when(col("dist") === d, col("n_nodes")).otherwise(0L))
        .as(s"n$d"))
    eccentricitySample(s, dir, sources, maxHops)
      .groupBy("source")
      .agg(ringCols.head, ringCols.tail: _*)
      .select(col("source"),
        (floor((1 to maxHops).map(d => col(s"n$d").cast("double") / d)
          .reduce(_ + _) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("harmonic"),
        (1 to maxHops).map(d => col(s"n$d")).reduce(_ + _).as("reached"))
      .orderBy("source")
  }

  /** One-row graph diagnostics: vertex/edge counts, density, average
    * and max degree — the numbers a capacity plan starts from. Two
    * aggregates over the (cached) edge list; exact integers except the
    * two quantized ratios.
    */
  def graphSummary(s: SparkSession, dir: String): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: degree agg + edge count
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    deg.agg(count(lit(1)).as("n_vertices"),
        sum("d").as("n_directed_edges"),
        max("d").as("max_degree"))
      .select(col("n_vertices"),
        // symmetrized list: directed count is even; surface as long
        (col("n_directed_edges") / 2).cast("long").as("n_edges"),
        col("max_degree"),
        (floor(col("n_directed_edges").cast("double") / col("n_vertices")
          * lit(1e4) + lit(0.5)) / lit(1e4)).as("avg_degree"),
        (floor(col("n_directed_edges").cast("double") /
          (col("n_vertices") * (col("n_vertices") - 1))
          * lit(1e9) + lit(0.5)) / lit(1e9)).as("density"))
  }

  /** Shortest-path COUNTS from one source (σ_v in Brandes' notation —
    * the first half of betweenness centrality): per vertex within
    * `maxHops`, its BFS distance and the number of distinct shortest
    * paths reaching it (σ_v = Σ σ_u over parents one hop closer).
    * The frontier loop is [[bfsDistances]] carrying one extra long —
    * path counts aggregate in the SAME per-hop join/groupBy, so the
    * cost over plain BFS is one sum per round. Counts are exact
    * integers at any scale.
    */
  def shortestPathCounts(s: SparkSession, dir: String, source: Long = 1L,
                         maxHops: Int = 4): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: every hop joins it
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      // pin the loop's edge cache onto hash(src, p) once (r12, guide
      // §2.4 — see katzCentrality): the scan-partitioned cache
      // re-exchanged the full edge table every hop (StageProbe)
      val ed = graft.CacheScope.register(
        e.repartition(p, col("src")).persist())
      e.unpersist()
      frontierLoop(ed, Seq(source), maxHops)
        .select("id", "dist", "n_paths")
    }
  }

  /** Local clustering coefficient 2·T(v)/(d(v)·(d(v)−1)) over the
    * thresholded supplier co-purchase graph (the same graph
    * [[triangleCensus]] censuses) — "how clique-like is each node's
    * neighborhood", the per-node refinement of the global census.
    * Triangles enumerate once at their (degree, id)-oriented apex
    * (identical wedge bound), then credit all three corners via one
    * explode; degrees come from the undirected edge list. Every ratio
    * divides exact integers; quantized on the 1e-6 grid.
    */
  def clusteringCoeff(s: SparkSession, dir: String, q: Double = 0.9,
                      k: Int = 30): DataFrame = {
    // pair generation stays a codegen'd equality self-join: the
    // collect_list + nested-transform alternative halves the shuffles
    // but pays interpreted HigherOrderFunction eval per pair —
    // measured 20% SLOWER at sf0.1 (the lambda tax beats an exchange)
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey").distinct()
    val a = li.select(col("l_orderkey").as("kk"), col("l_suppkey").as("s1"))
    val b = li.select(col("l_orderkey").as("kk"), col("l_suppkey").as("s2"))
    val co = a.join(b, "kk").filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      .persist()
    val thr = co.agg(percentile(col("c"), lit(q))).head().getDouble(0)
    val e = co.filter(col("c") >= thr)
      .select(col("s1").as("u"), col("s2").as("v")).persist()
    graft.CacheScope.register(e) // eager: degrees + orientation read it
    co.unpersist(blocking = false)
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val or = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(
        when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dt"))
      .persist()
    graft.CacheScope.register(or) // eager: three-way wedge fan-out
    val w = or.select(col("s").as("a"), col("t").as("b"), col("dt").as("db"))
      .join(or.select(col("s").as("a"), col("t").as("c"), col("dt").as("dc")),
        "a")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val tri = w.join(or.select(col("s").as("b"), col("t").as("c")),
        Seq("b", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("x"))
      .groupBy("x").agg(count(lit(1)).as("t"))
    deg.join(tri, Seq("x"), "left")
      .filter(col("d") >= 2)
      .select(col("x").as("id"), col("d").as("degree"),
        coalesce(col("t"), lit(0L)).as("triangles"),
        (floor(lit(2.0) * coalesce(col("t"), lit(0L)) /
          (col("d") * (col("d") - 1)) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("coeff"))
      .orderBy(col("coeff").desc, col("id"))
      .limit(k)
  }

  /** Sampled betweenness centrality (W241), Brandes 2001: the forward
    * pass is exactly [[shortestPathCounts]]'s multi-source frontier
    * kernel (dist + σ per source); the backward pass accumulates the
    * dependency δ_s(v) = Σ_{w: succ(v)} σ_v/σ_w · (1 + δ_s(w)) level
    * by level from the horizon inward, and betweenness(v) = Σ_s
    * δ_s(v). Horizon-truncated at `maxHops` over the sampled
    * `sources` — the estimator every real graph system ships
    * (exact betweenness is all-pairs); both truncations are part of
    * the CONTRACT and replayed by the oracle. δ rides a 1e-9 LONG
    * grid: each edge's contribution floor-quantizes the
    * (exact-double σ ratio) × (grid dependency) product to an integer
    * before the per-vertex LONG sum, so no float accumulation order
    * exists. Per level: one edge join against that ring only — the
    * backward pass costs what the forward BFS cost, shuffled on the
    * same keys.
    */
  def betweennessSample(s: SparkSession, dir: String,
                        sources: Seq[Long] = Seq(1L, 2L, 3L),
                        maxHops: Int = 4, k: Int = 30): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: forward + every backward level
    val p = loopParallelism(s, e.count())
    withLoopConf(s, p) {
      // pin the loop's edge cache onto hash(src, p) once (r12, guide
      // §2.4 — see katzCentrality): the scan-partitioned cache
      // re-exchanged the full edge table every hop (StageProbe)
      val ed = graft.CacheScope.register(
        e.repartition(p, col("src")).persist())
      e.unpersist()
      // per-level rings straight from the kernel: each is already its
      // own localCheckpoint'ed frame, so the backward pass touches
      // exactly ring(lvl) and ring(lvl+1) per level instead of
      // re-filtering the unioned BFS table (2 full-table scans/level)
      val rings = frontierRings(ed, sources, maxHops)
      var delta = rings(maxHops)
        .select(col("source"), col("id"), lit(0L).as("di"))
        .localCheckpoint()
      var acc = Vector.empty[DataFrame]
      for (lvl <- (maxHops - 1) to 0 by -1) {
        val cur = rings(lvl)
          .select(col("source"), col("id").as("v"),
            col("n_paths").as("sv"))
        val nxt = rings(lvl + 1)
          .select(col("source"), col("id").as("w"),
            col("n_paths").as("sw"))
          .join(delta.select(col("source"), col("id").as("w"),
            col("di").as("dw")), Seq("source", "w"), "left")
          .na.fill(0L, Seq("dw"))
        val d = cur
          .join(ed.select(col("src").as("v"), col("dst").as("w")), "v")
          .join(nxt, Seq("source", "w"))
          .groupBy(col("source"), col("v"))
          .agg(sum(floor(col("sv").cast("double") / col("sw") *
            (lit(1000000000L) + col("dw")) + lit(0.5)).cast("long"))
            .as("du"))
          .select(col("source"), col("v").as("id"), col("du"))
        delta = rings(lvl)
          .select(col("source"), col("id"))
          .join(d, Seq("source", "id"), "left")
          .select(col("source"), col("id"),
            coalesce(col("du"), lit(0L)).as("di"))
          .localCheckpoint()
        acc :+= delta
      }
      acc.reduce(_ unionAll _)
        .filter(col("id") =!= col("source"))
        .groupBy("id")
        .agg(sum(col("di")).as("bci"))
        .select(col("id"),
          (floor(col("bci").cast("double") / lit(1e9) * lit(1e6) +
            lit(0.5)) / lit(1e6)).as("betweenness"))
        .orderBy(col("betweenness").desc, col("id"))
        .limit(k)
    }
  }

  /** Per-edge triangle SUPPORT against a pre-oriented edge list
    * `or0(u, v, s, t, dt)` restricted to the surviving set
    * `act(u, v)` — the per-round kernel of [[kTruss]]. Enumeration is
    * the DEGREE-ORIENTED wedge join of [[triangleCensusEdges]]
    * (out-degree bounded by arboricity, the only shape whose shuffle
    * volume survives a power-law hub at 100 TB); each closed wedge
    * then scatters to its 3 canonical (u < v) edges and a
    * groupBy(u, v) recounts support — every join and agg
    * equality-keyed, nothing quadratic in raw degree. Edges in no
    * triangle are absent from the result (callers left-join).
    *
    * The orientation is taken from the ORIGINAL degrees and reused
    * every round: enumeration needs any consistent acyclic
    * orientation, not a degree-exact one, and peeling only shrinks
    * degrees — the original (degree, id) order stays acyclic and its
    * fan-out bound only tightens. The result SET is
    * orientation-independent, so this changes nothing the oracle
    * sees; it turns each round from (degree agg + 2 orientation
    * joins + persist + wedge join) into (1 restrict join + wedge
    * join) — measured 12.9 s -> 9.6 s for the whole query at sf0.1;
    * the residual is per-stage fixed cost (the pass count), not
    * wedge volume, which DuckDB covers in <1 s at this scale.
    */
  private def edgeSupport(or0: DataFrame, act: DataFrame): DataFrame = {
    val or = act.join(or0, Seq("u", "v")).localCheckpoint()
    val w = or.select(col("s").as("a"), col("t").as("b"), col("dt").as("db"))
      .join(or.select(col("s").as("a"), col("t").as("c"), col("dt").as("dc")),
        "a")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val tri = w
      .join(or.select(col("s").as("b"), col("t").as("c")), Seq("b", "c"))
      .select("a", "b", "c")
    tri.select(explode(array(
        struct(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v")),
        struct(least(col("a"), col("c")).as("u"),
          greatest(col("a"), col("c")).as("v")),
        struct(least(col("b"), col("c")).as("u"),
          greatest(col("b"), col("c")).as("v")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .groupBy("u", "v").agg(count(lit(1)).as("sup"))
  }

  /** Rich-club coefficient ladder over the supplier co-purchase
    * projection (same 0.9-quantile cut as [[triangleCensus]]): for
    * each degree cutoff k, φ(k) = 2·E_k / (N_k·(N_k−1)) with N_k the
    * nodes of degree > k and E_k the edges whose BOTH endpoints have
    * degree > k — "do the hubs trade with each other more than
    * chance" (Colizza et al. 2006), the topology-concentration audit
    * of the graph tier. Normalized by the complete graph on the rich
    * set, so φ ∈ [0, 1] exactly.
    *
    * One pass: degrees once, every edge annotated with min(du, dv),
    * then a single crossJoin against the tiny cutoff ladder with
    * conditional counts — O(|E|·|ks|) rows inside codegen before a
    * |ks|-key partial agg, no per-k rescans. All counts exact longs;
    * φ is one division.
    */
  def richClub(s: SparkSession, dir: String,
               ks: Seq[Int] = Seq(4, 8, 16, 32, 64, 128),
               q: Double = 0.9): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey").distinct()
    val a = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("s1"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("s2"))
    val co = CacheScope.track(a.join(b, "ok")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      .persist())
    val thr = co.agg(percentile(col("c"), lit(q))).head().getDouble(0)
    val e = CacheScope.track(co.filter(col("c") >= thr)
      .select(col("s1").as("u"), col("s2").as("v")).persist())
    val deg = CacheScope.track(e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d")).persist())
    val md = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(least(col("du"), col("dv")).as("md"))
    val kdf = ks.toDF("k")
    val nk = deg.crossJoin(broadcast(kdf))
      .groupBy("k")
      .agg(sum(when(col("d") > col("k"), 1L).otherwise(0L)).as("n_rich"))
    val ek = md.crossJoin(broadcast(kdf))
      .groupBy("k")
      .agg(sum(when(col("md") > col("k"), 1L).otherwise(0L)).as("e_rich"))
    nk.join(ek, "k")
      .select(col("k"), col("n_rich"), col("e_rich"),
        when(col("n_rich") > 1,
          graft.operators.Events.q(lit(2.0) * col("e_rich") /
            (col("n_rich") * (col("n_rich") - 1)), 6))
          .otherwise(lit(0.0)).as("phi"))
      .orderBy("k")
  }

  /** k-truss peeling over the supplier co-purchase projection (same
    * 0.9-quantile projection as [[triangleCensus]]): `rounds`
    * synchronized rounds of "drop every edge whose triangle support
    * among surviving edges is < k-2", then the survivors' recounted
    * support histogram `(support, n_edges)`. The truss is the
    * edge-level tightening of [[kCore]] — a 3-truss keeps only edges
    * still inside at least one triangle of the remaining subgraph,
    * the standard community-core extractor (Cohen 2008). Fixed round
    * count (not run-to-fixpoint) so the computation is exactly
    * restatable: the DuckDB oracle unrolls the same rounds; a
    * production caller loops until the edge count stops changing —
    * same per-round plan.
    *
    * Scale shape: each round is one [[edgeSupport]] pass (degree-
    * oriented, arboricity-bounded fan-out) plus one edge-keyed left
    * join — per-round cost is O(Σ out-deg²) like the census, never
    * all-pairs. The surviving edge set shrinks monotonically and is
    * localCheckpoint-ed per round so the self-joining plan and the
    * lineage stay flat; loop parallelism is pinned to the measured
    * edge count (the PPR regime — near-empty default-count partitions
    * make scheduling dominate these narrow-row rounds).
    */
  def kTruss(s: SparkSession, dir: String, k: Int = 3, rounds: Int = 2,
             q: Double = 0.9): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey").distinct()
    val a = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("s1"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_suppkey").as("s2"))
    val co = CacheScope.track(a.join(b, "ok")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      .persist()) // read for the quantile cut, then the edge filter
    // one scalar to the driver: the projection's adaptive density cut
    val thr = co.agg(percentile(col("c"), lit(q))).head().getDouble(0)
    val e0 = co.filter(col("c") >= thr)
      .select(col("s1").as("u"), col("s2").as("v"))
    kTrussEdges(s, e0, k, rounds)
  }

  /** The peeling kernel of [[kTruss]] over an explicit undirected edge
    * list `(u, v)` with u < v and no duplicates — factored out so the
    * truss semantics are testable on synthetic graphs (triangle +
    * pendant, cliques) independent of the fixture projection.
    */
  def kTrussEdges(s: SparkSession, e0: DataFrame, k: Int,
                  rounds: Int): DataFrame = {
    var act = e0.localCheckpoint()
    val p = loopParallelism(s, act.count())
    withLoopConf(s, p) {
      // orient ONCE on the original degrees (see edgeSupport scaladoc),
      // carrying the canonical (u, v) key for the per-round restrict
      val deg = act.select(col("u").as("x"))
        .unionAll(act.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      val lowFirst = col("du") < col("dv") ||
        (col("du") === col("dv") && col("u") < col("v"))
      val or0 = CacheScope.track(act
        .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
        .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
        .select(col("u"), col("v"),
          when(lowFirst, col("u")).otherwise(col("v")).as("s"),
          when(lowFirst, col("v")).otherwise(col("u")).as("t"),
          when(lowFirst, col("dv")).otherwise(col("du")).as("dt"))
        .persist()) // every round's restrict join reads it
      for (_ <- 1 to rounds) {
        act = act.join(edgeSupport(or0, act), Seq("u", "v"), "left")
          .filter(coalesce(col("sup"), lit(0L)) >= lit((k - 2).toLong))
          .select("u", "v").localCheckpoint()
      }
      // the support = -1 row is the survivor TOTAL: it keeps the
      // result non-empty even when the truss peels to nothing (the
      // sf0.001 fixture does) and gives the headline count for free
      act.agg(count(lit(1)).as("n_edges"))
        .select(lit(-1L).as("support"), col("n_edges"))
        .unionAll(
          act.join(edgeSupport(or0, act), Seq("u", "v"), "left")
            .select(coalesce(col("sup"), lit(0L)).as("support"))
            .groupBy("support").agg(count(lit(1)).as("n_edges")))
        .orderBy("support")
    }
  }

  /** Temporal edge-churn audit (W304) — how stable the
    * customer⇄supplier relationship graph is across the time midpoint
    * of the order log: edge counts per period, the persisting /
    * appeared / dropped split, and the edge-set Jaccard. The stability
    * gate run before anyone trains per-edge features on "the" graph —
    * a 0.2-Jaccard graph is a different graph every quarter. Shape:
    * ONE pass builds period-tagged distinct edges (groupBy edge, max
    * of two period flags — no set-op shuffles, no self-join), then a
    * single exact-count aggregate; the midpoint comes from a
    * broadcast 1-row bound, the repo's [[Events.coldStartAudit]]
    * convention. All counts exact LONGs; Jaccard is one final
    * division on the 1e-6 grid.
    */
  def graphChurn(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("t"))
    val bounds = o.agg(min("t").as("t0"), max("t").as("t1"))
    val mid = ((col("t0") + col("t1")) / lit(2.0)).cast("long")
    val tagged = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .crossJoin(broadcast(bounds))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"),
        (col("t") <= mid).cast("long").as("isPre"))
    val edges = tagged.groupBy("c", "sup")
      .agg(max(col("isPre")).as("inPre"),
        max(lit(1L) - col("isPre")).as("inPost"))
    edges.agg(
        sum(col("inPre")).as("edges_pre"),
        sum(col("inPost")).as("edges_post"),
        sum(col("inPre") * col("inPost")).as("persisted"),
        sum(col("inPre") * (lit(1L) - col("inPost"))).as("dropped"),
        sum((lit(1L) - col("inPre")) * col("inPost")).as("appeared"),
        count(lit(1)).as("edges_union"))
      .select(col("edges_pre"), col("edges_post"), col("persisted"),
        col("dropped"), col("appeared"),
        graft.operators.Events.q(
          col("persisted").cast("double") / col("edges_union"), 6)
          .as("jaccard"))
  }

  /** Bipartite butterfly census (W313) — 4-cycle (2×2 biclique)
    * counting over the customer–supplier bipartite graph, the
    * bipartite analogue of [[triangleCensus]]: B = Σ over customer
    * pairs C(common-suppliers, 2), with the wedge count W = Σ common
    * as the companion volume number. Butterflies are THE bipartite
    * cohesion motif (Wang et al., "Butterfly Counting in Bipartite
    * Networks") — a triangle can't exist in a bipartite graph, so
    * clustering-style signals ride 4-cycles. Wedge generation pivots
    * on the supplier side (Σ_sup C(deg,2) candidates) with the
    * [[adamicAdar]] degree cap [2, 64] bounding skew: a 100×
    * scale-up grows wedges linearly in suppliers, not in any
    * hub's deg². Exact integers end to end; butterflies use the
    * C(w,2) identity per customer pair — no 4-way join ever runs.
    */
  def butterflyCount(s: SparkSession, dir: String,
                     maxDeg: Long = 64L): DataFrame = {
    val e = CacheScope.track(
      Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
        .join(Tables.orders(s, dir).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
        .distinct()
        .persist()) // degree filter + both wedge sides read it
    val deg = e.groupBy("sup").agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2 && col("d") <= maxDeg)
    val ee = e.join(deg, "sup") // only wedge-capable suppliers
    val wedges = ee.select(col("sup"), col("c").as("c1"))
      .join(ee.select(col("sup"), col("c").as("c2")), "sup")
      .filter(col("c1") < col("c2"))
      .groupBy("c1", "c2").agg(count(lit(1)).as("w"))
    wedges.agg(
        sum(col("w")).as("n_wedges"),
        count(lit(1)).as("n_pairs"),
        sum(when(col("w") >= 2, 1L).otherwise(0L)).as("n_pairs_multi"),
        sum((col("w") * (col("w") - 1) / 2).cast("long"))
          .as("n_butterflies"))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("n_edges"))))
      .select(col("n_edges"), col("n_wedges"), col("n_pairs"),
        col("n_pairs_multi"), col("n_butterflies"))
  }

  /** Degree-signature anonymity audit (W319) — the graph analogue of
    * [[Events.kAnonymity]]: how many vertices of the customer⇄supplier
    * graph are UNIQUELY identifiable by their structural fingerprint
    * (degree + sorted multiset of neighbor degrees — the 1.5-hop view
    * an adversary with a degree-sequence side channel holds, per the
    * de-anonymization literature's H1/H2 attacks). Vertices sharing a
    * signature form an equivalence class; the audit surfaces the
    * class-size histogram plus the uniquely-identifiable share. One
    * degree aggregation, one edge join to neighbor degrees, one
    * per-vertex sort of a degree-bounded list — every stage keyed,
    * nothing quadratic.
    */
  def degreeAnonymity(s: SparkSession, dir: String): DataFrame = {
    val e = CacheScope.track(
      customerSupplierEdges(s, dir, distinctPairs = true)
        .persist()) // degree agg + the signature join read it
    val deg = e.groupBy("src").agg(count(lit(1)).as("d"))
    val sig = e
      .join(deg.select(col("src").as("dst"), col("d").as("dd")), "dst")
      .groupBy("src")
      .agg(concat_ws(",", sort_array(collect_list(col("dd"))))
        .as("nbrs"))
      .join(deg, "src")
      .select(col("src"), concat(col("d").cast("string"), lit("|"),
        col("nbrs")).as("sig"))
    val classes = sig.groupBy("sig").agg(count(lit(1)).as("cls"))
    classes.groupBy("cls").agg(count(lit(1)).as("n_classes"))
      .select(col("cls").as("class_size"), col("n_classes"),
        (col("cls") * col("n_classes")).as("n_nodes"))
      .orderBy("class_size")
  }

  /** Temporal link-prediction evaluation (W323) — score pre-period
    * co-purchase candidates with Adamic–Adar and test them against
    * what the POST period actually forms: the honest backtest for
    * "people also bought" features, with the time split doing the
    * train/test hygiene ([[graphChurn]]'s midpoint convention; no
    * random edge holdout, which leaks through shared neighborhoods).
    * Candidates = customer pairs sharing a degree-capped pre-period
    * supplier; score = Σ 1/ln(deg_pre) over common suppliers, each
    * term on the 1e-9 LONG grid so scores are EXACT integers (ties in
    * the AUC are decided exactly, not by float fuzz); label = the
    * pair shares a post-period supplier. AUC is the Mann–Whitney
    * rank form over the (score → pos/neg count) table —
    * O(distinct scores), midrank-correct. Wedge volumes carry the
    * [[adamicAdar]] cap on the scored side; the label side is
    * existence-only (left-semi), with the same cap applied for
    * hub-skew control (documented choice: a post-hub shared by
    * everyone says nothing about pair affinity anyway).
    */
  def linkPredEval(s: SparkSession, dir: String,
                   maxDeg: Long = 64L): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        unix_timestamp(col("o_orderdate")).as("t"))
    val bounds = o.agg(min("t").as("t0"), max("t").as("t1"))
    val mid = ((col("t0") + col("t1")) / lit(2.0)).cast("long")
    // register (eager, r12): the final action reads this join+agg
    // subtree from FOUR concurrent AQE query stages (pre-wedge deg +
    // pre-wedge join, post-wedge deg + post-wedge join) and the lazy
    // persist let them race — StageProbe showed the lineitem⋈orders
    // build running 4-6x per query (the same stampede batch-2 r11
    // fixed elsewhere; this query never got the fix)
    val edges = CacheScope.register(
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .crossJoin(broadcast(bounds))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"),
          (col("t") <= mid).cast("long").as("isPre"))
        .groupBy("c", "sup")
        .agg(max(col("isPre")).as("inPre"),
          max(lit(1L) - col("isPre")).as("inPost"))
        .persist())
    def wedgePairs(flag: String) = {
      val e = edges.filter(col(flag) === 1).select("c", "sup")
      val deg = e.groupBy("sup").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2 && col("d") <= maxDeg)
      (e.join(deg, "sup"), deg)
    }
    val (preE, preDeg) = wedgePairs("inPre")
    // per-supplier AA term on the exact 1e-9 grid
    val aa = preE.join(preDeg.select(col("sup"),
        floor(lit(1e9) / log(col("d").cast("double")) + lit(0.5))
          .cast("long").as("aa9")).drop("d"), "sup")
    val scored = aa.select(col("sup"), col("c").as("c1"), col("aa9"))
      .join(aa.select(col("sup"), col("c").as("c2")), "sup")
      .filter(col("c1") < col("c2"))
      .groupBy("c1", "c2").agg(sum(col("aa9")).as("score9"))
    val (postE, _) = wedgePairs("inPost")
    val postPairs = postE.select(col("sup"), col("c").as("c1"))
      .join(postE.select(col("sup"), col("c").as("c2")), "sup")
      .filter(col("c1") < col("c2"))
      .select("c1", "c2").distinct()
    // register (eager, r12): counts + the AUC rank pass read it from
    // concurrent stages — lazily persisted, the expensive scored
    // self-join could run once per reader (see edges above)
    val labeled = CacheScope.register(scored
      .join(postPairs.withColumn("y", lit(1)), Seq("c1", "c2"), "left")
      .na.fill(0, Seq("y"))
      .select(col("score9").cast("double").as("score"), col("y"))
      .persist())
    val counts = labeled.agg(count(lit(1)).as("n_candidates"),
      sum(col("y").cast("long")).as("n_pos"))
    counts.crossJoin(broadcast(
      graft.operators.Ml.auc(labeled, "score", "y")))
  }

  /** Weighted single-source shortest paths (W326) — bounded
    * Bellman–Ford over the customer⇄supplier graph with
    * RELATIONSHIP-STRENGTH costs: edge cost = ln(maxCnt/cnt) on the
    * 1e-9 LONG grid (cnt = co-order multiplicity), so the cheapest
    * path is the max-product-of-normalized-strengths path — "who is
    * commercially closest", which [[bfsDistances]]' hop counts can't
    * see (3 strong hops can beat 1 weak one). `rounds` relaxation
    * sweeps of the standard scatter-min (each a message shuffle +
    * min-agg, the Pregel shape shared with the PPR loop), distances
    * always EXACT integer sums of per-edge grid costs — min() over
    * identical LONGs is engine-order-free, the property float
    * distances would not have. Returns the k nearest (dist, node)
    * from the source customer. At 100 TB: per-round cost is one
    * co-partitioned join on current-frontier rows only.
    */
  def weightedSssp(s: SparkSession, dir: String, source: Long = 1L,
                   rounds: Int = 6, k: Int = 50): DataFrame = {
    val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
    val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
    val cnt = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("c"),
        (col("l_suppkey") + lit(1000000L)).as("sup"))
      .agg(count(lit(1)).as("cnt"))
    val mx = cnt.agg(max(col("cnt")).as("mc"))
    // read every relaxation round; pinned onto hash(src) partitions
    // (r12, guide §2.4 — see katzCentrality) so the per-round frontier
    // join reads it shuffle-free: the scan-partitioned cache
    // re-exchanged the full edge table every round (StageProbe: 6 ×
    // 1.17M-row exchanges per query at sf0.1). Row movement only.
    val edges = CacheScope.register(cnt.crossJoin(broadcast(mx))
      .select(col("c"), col("sup"),
        floor(log(col("mc").cast("double") / col("cnt")) * lit(1e9)
          + lit(0.5)).cast("long").as("w"))
      .select(explode(array(
        struct(col("c").as("src"), col("sup").as("dst"), col("w")),
        struct(col("sup").as("src"), col("c").as("dst"), col("w"))))
        .as("e"))
      .select(col("e.src"), col("e.dst"), col("e.w"))
      .repartition(col("src"))
      .persist())
    var dist = edges.sparkSession.range(1).toDF("x")
      .select(lit(source).as("node"), lit(0L).as("dist"))
    // classic frontier-only Bellman–Ford: a node whose distance did
    // not improve last round has nothing new to scatter (its earlier
    // message is already folded in), so later rounds shrink toward
    // empty once the (small) weighted diameter is reached — identical
    // distances, a fraction of the message volume
    var frontier = dist
    for (_ <- 1 to rounds) {
      val relaxed = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dist.unionAll(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      // measured at sf0.1/local[32]: checkpointed frontier 6.8s,
      // lazy frontier 7.9s (the improved-join re-evaluates inside the
      // next round's plan), plain full-relaxation BF 5.9s. The ~1s
      // local overhead buys the scale property: late-round message
      // volume tracks the shrinking frontier, not the whole graph.
      frontier = next
        .join(dist.select(col("node"), col("dist").as("od")),
          Seq("node"), "left")
        .filter(col("od").isNull || col("dist") < col("od"))
        .select("node", "dist")
        .localCheckpoint()
      dist = next
    }
    dist.orderBy(col("dist"), col("node")).limit(k)
      .select(col("node"), col("dist").as("dist9"),
        graft.operators.Events.q(col("dist").cast("double") / lit(1e9), 6)
          .as("dist"))
  }

  /** Katz centrality (W351) on the customer⇄supplier graph, truncated
    * at `rounds` walk lengths: x_j = Σ_{t=1..K} α^t · w_t(j) where
    * w_t(j) counts walks of length t ending at j — the "influence
    * through ALL paths, discounted by length" score that PageRank's
    * stochastic normalization deliberately throws away (a hub with
    * many weak spokes ranks differently under the two). The loop keeps
    * the walk counts as EXACT INTEGERS (w_t(j) = Σ_{i→j} w_{t-1}(i) in
    * DECIMAL(38,0) — a 38-digit ceiling the 6-round count of a
    * degree-10⁴ graph still clears), so the only floats are the final
    * fixed per-node expression Σ α^t·w_t — no float accumulation ever
    * crosses a shuffle, unlike the PageRank family where 9-dp rounding
    * absorbs merge-order noise. Same loop posture as every fixpoint
    * here: structure cached once on pinned hash(src) partitions, only
    * the per-round count column shuffles, `localCheckpoint` cuts the
    * lineage. Top-`k` by the 1e-9-grid score, id tiebreak.
    */
  def katzCentrality(s: SparkSession, dir: String, rounds: Int = 6,
                     alpha: Double = 0.05, k: Int = 20): DataFrame = {
    require(rounds >= 1 && rounds <= 12, "walk-count truncation depth")
    val e0 = CacheScope.track(customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist())
    val p = loopParallelism(s, e0.count())
    withLoopConf(s, p) {
      // OPTIMIZATION r12 (guide §2.4): pin the edge cache onto
      // hash(src, p) partitions ONCE — the pagerank family gets this
      // for free (struct0 is built by an in-scope join), but here the
      // raw scan-partitioned cache made EVERY round's scatter join
      // re-exchange the full edge table (StageProbe: 6 × 1.17M-row /
      // 10.7 MB exchanges per query at sf0.1); now only the per-round
      // message aggregation shuffles. Row movement only — no value
      // changes anywhere.
      val e = CacheScope.register(e0.repartition(p, col("src")).persist())
      e0.unpersist() // the pinned copy is the only reader from here on
      val nodes = CacheScope.register( // eager (r11): round 1 reads it
        e.select(col("src").as("id")).distinct().persist()) // from 2 subtrees
      // OPTIMIZATION r11: accumulate Σ α^t·w_t incrementally instead of
      // accreting one w_t column per round — the per-round checkpoint
      // carries (id, w, acc) at CONSTANT width rather than t DECIMAL(38)
      // columns, and the loop's plan is structurally round-invariant
      // (fixed column names; α^t rides a broadcast 1-row frame, the PPR
      // convention) so whole-stage codegen compiles once, not per round.
      // acc adds the α^t·w_t terms left-to-right in round order — the
      // exact association the former reduce(_ + _) over t=1..rounds
      // used, with an exact 0.0 start — so scores are bit-identical.
      import s.implicits._
      var walks = nodes.select(col("id"),
        lit(1).cast("decimal(38,0)").as("w"), lit(0.0).as("acc"))
      for (t <- 1 to rounds) {
        val at = broadcast(Seq(math.pow(alpha, t)).toDF("at"))
        val recv = e.join(walks.select(col("id"), col("w")),
            e("src") === walks("id"))
          .groupBy(col("dst").as("id2"))
          .agg(sum(col("w")).as("wn"))
        walks = walks.select(col("id"), col("acc"))
          .join(recv, col("id") === col("id2"), "left")
          .crossJoin(at)
          .select(col("id"),
            coalesce(col("wn"), lit(0).cast("decimal(38,0)")).as("w"),
            (col("acc") + col("at") *
              coalesce(col("wn"), lit(0).cast("decimal(38,0)"))
                .cast("double")).as("acc"))
          .localCheckpoint()
      }
      walks
        .select(col("id"), Events.q(col("acc"), 9).as("katz"))
        .orderBy(col("katz").desc, col("id"))
        .limit(k)
    }
  }

  /** Disparity-filter network backbone (W362, Serrano–Boguñá–
    * Vespignani): which customer⇄supplier links carry statistically
    * significant weight relative to their endpoint's strength, under
    * the null that a node's strength splits uniformly at random among
    * its k edges? p_ij = (1 − w_ij/s_i)^(k_i−1); an edge survives at
    * level α if EITHER endpoint finds it significant — the principled
    * way to sparsify a weighted graph before the iterative tier runs
    * on it (a global weight threshold would erase every low-strength
    * node's hub). Weights/strengths/degrees are exact integers; the
    * power is exp((k−1)·ln(1−w/s)) — one fixed two-libm-call
    * expression per direction, quantized at 1e-9 before the min and
    * the α cut (k=1 pends to p=1 exactly: a sole edge is never
    * "significant"). Output: kept/total counts and the top-15
    * strongest survivors. Scale: one edge-keyed agg + one src-keyed
    * agg + a broadcast-joined filter — no iteration, no self-join.
    */
  def graphBackbone(s: SparkSession, dir: String,
                    alpha: Double = 0.05, k: Int = 15): DataFrame = {
    // OPTIMIZATION r11 (guide §1.2): REGISTER (eager), not track — the
    // single final action reads `e` from two concurrent subtrees
    // (strengths + the p-value join's probe side); a lazy persist let
    // both stages race and compute the 1.17M-row weighted-edge build
    // independently (StageProbe: 3 identical build stages per run)
    val e = CacheScope.register(
      customerSupplierEdges(s, dir, distinctPairs = false)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .persist())
    val st = e.groupBy("src")
      .agg(sum(col("w")).as("st"), count(lit(1)).as("deg"))
    val withP = e
      .join(st.hint("shuffle_hash"), "src")
      .select(col("src"), col("dst"), col("w"),
        when(col("deg") === 1, lit(1.0))
          .otherwise(exp((col("deg") - 1) *
            log(lit(1.0) - col("w").cast("double") / col("st"))))
          .as("p"))
    // undirected edge id: each direction carries its own p; the edge
    // survives on the MIN of the two (either-endpoint rule).
    // r11: persisted+registered — it feeds THREE subtrees of the final
    // action (n_edges count, n_kept count, the top-k cut); unpersisted
    // it was recomputed once per subtree (StageProbe: 3 × 361k-row
    // stages)
    val undirected = CacheScope.register(withP
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"), col("w"),
        floor(col("p") * lit(1e9) + lit(0.5)).cast("long").as("p9"))
      .groupBy("a", "b", "w")
      .agg(min(col("p9")).as("p9"))
      .persist())
    val a9 = (alpha * 1e9).toLong
    val kept = undirected.filter(col("p9") < a9)
    val counts = undirected.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(kept.agg(count(lit(1)).as("n_kept"))))
    kept.orderBy(col("w").desc, col("a"), col("b")).limit(k)
      .crossJoin(broadcast(counts))
      .select(col("n_edges"), col("n_kept"), col("a").as("src"),
        col("b").as("dst"), col("w"),
        Events.q(col("p9").cast("double") / lit(1e9), 6).as("p_value"))
  }

  /** Local-bridge / tie-strength audit (W374) over the PART
    * co-purchase projection — Granovetter's "strength of weak ties"
    * measured: a LOCAL BRIDGE is an edge whose endpoints share no
    * common neighbor (embeddedness 0 — removing it puts its endpoints
    * ≥ 3 hops apart), and the classic prediction is that weak ties
    * (low co-purchase count) bridge while strong ties sit inside
    * triangles. Output: per tie-weight bucket (co-purchase count
    * capped at 6), edge count, bridge count, bridge share — the
    * community-structure diagnostic next to [[kTruss]]'s peeling
    * (which REMOVES the bridges this op is about). The projection is
    * parts, not suppliers: the supplier dimension is so small that
    * its co-purchase graph is COMPLETE (C(100,2) edges at sf0.01 —
    * zero bridges by construction, measured); the part graph is
    * order-basket-sparse, which is the regime the audit is about.
    *
    * Embeddedness is one [[edgeSupport]] pass — degree-oriented wedge
    * join, O(Σ out-deg²) bounded by arboricity, never all-pairs; the
    * projection prunes to edges with count ≥ 2 (a 1-count pair is
    * noise, and the cut keeps the edge set basket-bounded at scale).
    * Counts are exact LONGs; the share divides once on the 1e-6 grid.
    */
  def localBridges(s: SparkSession, dir: String, minC: Int = 2)
  : DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey").distinct()
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s1"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s2"))
    val e0 = CacheScope.track(a.join(b, "ok")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minC)
      .select(col("s1").as("u"), col("s2").as("v"),
        least(col("c"), lit(6L)).as("w"))
      .persist()) // orientation + support join + bucket agg read it
    val act = e0.select("u", "v")
    val deg = act.select(col("u").as("x"))
      .unionAll(act.select(col("v").as("x")))
      .groupBy("x").agg(count(lit(1)).as("d"))
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val or0 = act
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
      .select(col("u"), col("v"),
        when(lowFirst, col("u")).otherwise(col("v")).as("s"),
        when(lowFirst, col("v")).otherwise(col("u")).as("t"),
        when(lowFirst, col("dv")).otherwise(col("du")).as("dt"))
    e0.join(edgeSupport(or0, act), Seq("u", "v"), "left")
      .select(col("w"),
        (coalesce(col("sup"), lit(0L)) === 0L).cast("long")
          .as("isBridge"))
      .groupBy("w")
      .agg(count(lit(1)).as("n_edges"), sum(col("isBridge")).as("n_bridges"))
      .select(col("w").as("tie_weight"), col("n_edges"), col("n_bridges"),
        Events.q(col("n_bridges").cast("double") /
          col("n_edges").cast("double"), 6).as("bridge_share"))
      .orderBy("tie_weight")
  }

  /** SALSA authority/hub scores (W395, Lempel & Moran): the
    * degree-normalized cousin of [[hits]] — each node forwards its
    * mass SPLIT EVENLY across its edges (a random walk on the
    * bipartite graph) instead of copying it whole, so high-degree
    * hubs can't inflate every neighbor (the TKC effect HITS suffers;
    * running both and diffing the rankings is the audit). The whole
    * iteration is EXACT INTEGER arithmetic: scores live on a 1e-12
    * grid and every message is `score div degree` (integer division
    * — defined as the operator's semantics, documented drift ≤
    * degree ulps per round, far below the 1e-6 surfaced grid), so
    * both engines replay bit-identical rounds with no double sums
    * anywhere. Scale: two degree tables + two keyed aggs per round
    * at pinned loop parallelism, same shuffle shape as [[hits]].
    */
  def salsaScores(s: SparkSession, dir: String, rounds: Int = 3,
                  k: Int = 10): DataFrame = {
    val pairs = customerSupplierEdges(s, dir)
      .filter(col("src") < lit(1000000L))
      .select(col("src").as("c"), col("dst").as("sup")).persist()
    graft.CacheScope.register(pairs) // eager: degrees + each round
    val p = loopParallelism(s, pairs.count())
    val (auth, hub) = withLoopConf(s, p) {
      // one pinned copy per half-round join key (r12, guide §2.4 —
      // see hits): the raw cache re-exchanged the edge projection on
      // c AND sup every round. The degree tables derive from the
      // pinned copies so the raw cache can be freed here.
      val pc = graft.CacheScope.register(
        pairs.repartition(p, col("c")).persist())
      val ps = graft.CacheScope.register(
        pairs.repartition(p, col("sup")).persist())
      pairs.unpersist()
      val dc = pc.groupBy("c").agg(count(lit(1)).as("dc"))
      val ds = ps.groupBy("sup").agg(count(lit(1)).as("ds"))
      var hubDf = dc.select(col("c"), lit(1000000000000L).as("h"))
        .localCheckpoint()
      var authDf: DataFrame = null
      for (_ <- 1 to rounds) {
        authDf = pc.join(hubDf, "c").join(dc.hint("broadcast"), "c")
          .selectExpr("sup", "h div dc as m")
          .groupBy("sup").agg(sum(col("m")).as("a"))
          .localCheckpoint()
        hubDf = ps.join(authDf, "sup").join(ds.hint("broadcast"), "sup")
          .selectExpr("c", "a div ds as m")
          .groupBy("c").agg(sum(col("m")).as("h"))
          .localCheckpoint()
      }
      (authDf, hubDf)
    }
    val topAuth = auth.orderBy(col("a").desc, col("sup")).limit(k)
      .select(lit("auth").as("kind"), col("sup").as("id"),
        graft.operators.Events.q(col("a").cast("double") / lit(1e12), 6)
          .as("score"))
    val topHub = hub.orderBy(col("h").desc, col("c")).limit(k)
      .select(lit("hub").as("kind"), col("c").as("id"),
        graft.operators.Events.q(col("h").cast("double") / lit(1e12), 6)
          .as("score"))
    topAuth.unionAll(topHub)
  }

  /** VoteRank influence-maximization seeds (W404, Zhang et al.): each
    * round every node's score is the sum of its neighbors' VOTING
    * ABILITY; the top scorer becomes a seed, its own ability drops to
    * zero and its neighbors' by 1/⟨k⟩ — so the second seed is pushed
    * AWAY from the first's neighborhood, which plain degree/PageRank
    * top-k ("pick the whole hub cluster") gets wrong for seeding
    * campaigns or crawl frontiers. Abilities live on an exact 1e-6
    * integer grid with an integer decrement ⌊10⁶·n/(2|E|)⌋, so every
    * round is bit-identical in both engines; the per-round argmax is
    * a one-row driver collect (k rounds, k small — the seed LIST is
    * the driver-side product). Scale: one edge-keyed agg per round
    * at loop parallelism.
    */
  def voteRank(s: SparkSession, dir: String, k: Int = 3): DataFrame = {
    val e = customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist()
    graft.CacheScope.register(e) // eager: every round reads it
    val nEdges = e.count() / 2
    val nodes = e.select(col("src").as("id")).distinct()
      .persist()
    graft.CacheScope.register(nodes)
    val nNodes = nodes.count()
    val delta = 1000000L * nNodes / (2 * nEdges)
    val p = loopParallelism(s, nEdges)
    var va = nodes.withColumn("va", lit(1000000L)).localCheckpoint()
    val seeds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    import s.implicits._
    // OPTIMIZATION r11 (guide §4): the per-round scalars (chosen seeds,
    // this round's seed) ride broadcast local relations instead of
    // literals baked into the plan (`isin(...)`, `=== seed`) — literal
    // churn re-generated and re-compiled every stage's codegen each
    // round; data-side values keep the generated source identical, so
    // janino compiles the round shape once. Same rows, same arithmetic.
    withLoopConf(s, p) {
      for (round <- 1L to k) {
        val scores = e.join(va.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id")).agg(sum(col("va")).as("score"))
        val exclDf = broadcast(seeds.map(_._2).toSeq.toDF("xid"))
        val top = scores
          .join(exclDf, col("id") === col("xid"), "left_anti")
          .orderBy(col("score").desc, col("id"))
          .limit(1).collect().head
        val seed = top.getLong(0)
        seeds += ((round, seed, top.getLong(1)))
        // OPTIMIZATION r12 (guide §5 driver-paced loops, VERDICT r11
        // #5): one job per round instead of two — the vote-power
        // update rides a LAZY persist (next round's single argmax
        // action materializes it; both of that round's reads — the
        // score join and the following update — then hit the cache),
        // where the old per-round localCheckpoint was its own
        // materialization job. And the final round's update is never
        // computed at all: the query output is the driver-side seed
        // list, so va_k was dead work. Values are unchanged — the
        // update expression is deterministic and persist() only moves
        // where it materializes.
        if (round < k) {
          val seedDf = broadcast(Seq(seed).toDF("sid"))
          val nb = e.join(seedDf, col("src") === col("sid"))
            .select(col("dst").as("id"), lit(delta).as("dec"))
          va = graft.CacheScope.track(va.join(nb, Seq("id"), "left")
            .crossJoin(seedDf)
            .select(col("id"),
              when(col("id") === col("sid"), lit(0L))
                .otherwise(greatest(col("va") - coalesce(col("dec"),
                  lit(0L)), lit(0L))).as("va"))
            .persist())
        }
      }
    }
    seeds.toSeq.toDF("round", "seed_id", "score6")
      .select(col("round"), col("seed_id"),
        graft.operators.Events.q(col("score6").cast("double") / lit(1e6),
          6).as("score"))
      .orderBy("round")
  }

  /** Burt's structural-hole constraint (W405) over the part
    * co-purchase projection: c_i = Σ_j (p_ij + Σ_q p_iq·p_qj)² with
    * p = 1/deg — LOW constraint marks brokers whose neighbors are
    * NOT otherwise connected (the parts that bridge basket
    * communities), the node-level complement of [[localBridges]]'
    * edge view. The indirect term is one degree-oriented wedge join
    * over the pruned projection (count ≥ 2, the localBridges cut
    * that keeps the edge set basket-bounded); p-products are exact
    * rationals quantized per term at 1e-9 before the per-(i,j) sum,
    * the square runs on the quantized value, and per-i totals sum
    * 1e-9 integers — order-free everywhere. Top-15 LOWEST-constraint
    * brokers (deg ≥ 3) surface. Scale: the wedge volume is bounded
    * by Σdeg² of the pruned projection; no all-pairs anywhere.
    */
  def burtConstraint(s: SparkSession, dir: String, k: Int = 15,
                     minC: Int = 2): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey").distinct()
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s1"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s2"))
    val und = a.join(b, "ok")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minC)
      .select("s1", "s2")
      .persist()
    graft.CacheScope.register(und) // eager: degrees, ew, orientation
    val e = und.select(col("s1").as("i"), col("s2").as("j"))
      .unionAll(und.select(col("s2").as("i"), col("s1").as("j")))
    val deg = e.groupBy("i").agg(count(lit(1)).as("d"))
    val ew = e.join(deg, "i")
      .select(col("i"), col("j"), col("d").as("di"))
    // indirect terms exist only on TRIANGLES (q adjacent to both ends
    // of the edge (i,j)): enumerate them once, degree-ORIENTED (out-
    // fan bounded by arboricity — the unoriented i→q→j wedge join is
    // Σdeg², measured 15.1s vs 6.9s at sf0.1), then
    // scatter each triangle to its 6 ordered (i, j, center) roles
    val ow = und
      .join(deg.select(col("i").as("s1"), col("d").as("d1")), "s1")
      .join(deg.select(col("i").as("s2"), col("d").as("d2")), "s2")
      .select(when(col("d1") < col("d2") ||
          (col("d1") === col("d2") && col("s1") < col("s2")),
        struct(col("s1").as("s"), col("s2").as("t"), col("d2").as("dt")))
        .otherwise(struct(col("s2").as("s"), col("s1").as("t"),
          col("d1").as("dt"))).as("e"))
      .select(col("e.s"), col("e.t"), col("e.dt"))
      .localCheckpoint()
    val w = ow.select(col("s").as("a"), col("t").as("b"), col("dt").as("db"))
      .join(ow.select(col("s").as("a"), col("t").as("c"),
        col("dt").as("dc")), "a")
      .filter(col("db") < col("dc") ||
        (col("db") === col("dc") && col("b") < col("c")))
    val tri = w.join(ow.select(col("s").as("b"), col("t").as("c")),
      Seq("b", "c")).select("a", "b", "c")
    val ordered = tri.select(explode(array(
        struct(col("a").as("i"), col("b").as("j"), col("c").as("q")),
        struct(col("b").as("i"), col("a").as("j"), col("c").as("q")),
        struct(col("a").as("i"), col("c").as("j"), col("b").as("q")),
        struct(col("c").as("i"), col("a").as("j"), col("b").as("q")),
        struct(col("b").as("i"), col("c").as("j"), col("a").as("q")),
        struct(col("c").as("i"), col("b").as("j"), col("a").as("q"))))
        .as("x"))
      .select(col("x.i"), col("x.j"), col("x.q"))
    val ind = ordered
      .join(deg.select(col("i"), col("d").as("dii")), "i")
      .join(deg.select(col("i").as("q"), col("d").as("dq")), "q")
      .select(col("i"), col("j"),
        floor(lit(1e9) / (col("dii") * col("dq")).cast("double") +
          lit(0.5)).cast("long").as("t9"))
      .groupBy("i", "j").agg(sum(col("t9")).as("ind9"))
    val terms = ew
      .join(ind, Seq("i", "j"), "left")
      .select(col("i"), col("di"),
        (floor(lit(1e9) / col("di").cast("double") + lit(0.5))
          .cast("long") + coalesce(col("ind9"), lit(0L))).as("p9"))
      .select(col("i"), col("di"),
        floor((col("p9").cast("double") / lit(1e9)) *
          (col("p9").cast("double") / lit(1e9)) * lit(1e9) + lit(0.5))
          .cast("long").as("c9"))
    terms.groupBy(col("i").as("part"), col("di").as("degree"))
      .agg(sum(col("c9")).as("s9"))
      .filter(col("degree") >= 3)
      .select(col("part"), col("degree"),
        graft.operators.Events.q(col("s9").cast("double") / lit(1e9), 6)
          .as("constraint"))
      .orderBy(col("constraint"), col("part"))
      .limit(k)
  }

  /** Categorical assortativity (W413, Newman mixing) of the part
    * co-purchase graph BY BRAND: do baskets combine same-brand parts
    * (homophily, r → 1) or mix across brands (r < 0)? — the
    * attribute-level companion to the degree [[assortativity]], and
    * the community-structure prior checked before trusting
    * [[labelProp]]-style clusters to mean anything. Over the
    * DIRECTED doubled edge list, r = (M·S − P)/(M² − P) with
    * S = same-brand edges and P = Σ_brand (degree mass)² — every
    * term an exact integer from two keyed aggs, one division.
    * Scale: the pruned (count ≥ 2) projection of [[localBridges]],
    * one broadcast part-attribute join.
    */
  def homophilyBrand(s: SparkSession, dir: String, minC: Int = 2)
  : DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_partkey").distinct()
    val a = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s1"))
    val b = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("s2"))
    val und = a.join(b, "ok")
      .filter(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("c"))
      .filter(col("c") >= minC)
    val e = und.select(col("s1").as("i"), col("s2").as("j"))
      .unionAll(und.select(col("s2").as("i"), col("s1").as("j")))
    val brands = Tables.part(s, dir)
      .select(col("p_partkey"), col("p_brand"))
    val eb = e
      .join(broadcast(brands.withColumnRenamed("p_partkey", "i")
        .withColumnRenamed("p_brand", "bi")), "i")
      .join(broadcast(brands.withColumnRenamed("p_partkey", "j")
        .withColumnRenamed("p_brand", "bj")), "j")
      .persist()
    graft.CacheScope.register(eb) // eager: totals + marginals read it
    val tot = eb.agg(count(lit(1)).as("m"),
      sum((col("bi") === col("bj")).cast("long")).as("s"))
    val marg = eb.groupBy("bi").agg(count(lit(1)).as("d"))
      .agg(sum((col("d") * col("d")).cast("decimal(38,0)")).as("p"),
        count(lit(1)).as("n_brands"))
    tot.crossJoin(marg).select(col("n_brands"), col("m").as("m_edges"),
      graft.operators.Events.q(col("s").cast("double") /
        col("m").cast("double"), 6).as("same_share"),
      graft.operators.Events.q(
        (col("m").cast("double") * col("s").cast("double") -
          col("p").cast("double")) /
        (col("m").cast("double") * col("m").cast("double") -
          col("p").cast("double")), 6).as("assortativity"))
  }

  /** Truncated-power-iteration eigenvector centrality (W428): the
    * walk-count vector after `rounds` unnormalized multiplications by
    * the adjacency matrix, L1-normalized ONCE at the end — the
    * prestige score where a node is central because its NEIGHBORS are
    * central, with none of [[katzCentrality]]'s length discounting
    * and none of PageRank's stochastic rescaling. Skipping per-round
    * normalization is what keeps the loop exact: w_t stays an exact
    * DECIMAL(38,0) integer (the scale factor is irrelevant to the
    * limiting direction), so the ONLY float in the operator is the
    * final w/Σw division on the 1e-9 grid. Same fixpoint posture as
    * the PageRank family: edges cached once on pinned partitions,
    * per-round shuffle carries (id, count) rows, `localCheckpoint`
    * cuts lineage.
    */
  def eigenvectorCentrality(s: SparkSession, dir: String,
                            rounds: Int = 6, k: Int = 20): DataFrame = {
    require(rounds >= 1 && rounds <= 12, "walk-count truncation depth")
    val e0 = CacheScope.track(customerSupplierEdges(s, dir)
      .select(col("src"), col("dst")).persist())
    val p = loopParallelism(s, e0.count())
    withLoopConf(s, p) {
      // pin the edge cache onto hash(src, p) once (r12, guide §2.4) —
      // see katzCentrality: the scan-partitioned cache re-exchanged
      // the full edge table every round; row movement only
      val e = CacheScope.register(e0.repartition(p, col("src")).persist())
      e0.unpersist() // the pinned copy is the only reader from here on
      val nodes = CacheScope.register( // eager (r11): round 1 reads it
        e.select(col("src").as("id")).distinct().persist()) // from 2 subtrees
      var w = nodes.select(col("id"),
        lit(1).cast("decimal(38,0)").as("w"))
      // checkpoint EVERY round (r12 revert of the r11 every-2nd-round
      // fusion): the fused two-multiplication job doubles per-task live
      // state (two chained join+agg pipelines of DECIMAL(38) sums), and
      // the full cold board contradicted the isolated warm A/B that
      // justified it — this query became the driver's worst 8-vs-32-core
      // anti-scaler (ratio 0.19, 28.7 s wall at local[32] vs 5.6 s at
      // local[8]; VERDICT r11 #2/#6). One materialized single-round job
      // per iteration keeps peak memory flat at any core count.
      for (_ <- 1 to rounds) {
        val recv = e.join(
            w.select(col("id").as("jid"), col("w").as("pw")),
            e("src") === col("jid"))
          .groupBy(col("dst").as("id2")).agg(sum(col("pw")).as("nw"))
        w = nodes.join(recv, nodes("id") === col("id2"), "left")
          .select(nodes("id"),
            coalesce(col("nw"), lit(0).cast("decimal(38,0)")).as("w"))
          .localCheckpoint()
      }
      val tot = w.agg(sum(col("w")).as("sw"))
      w.crossJoin(broadcast(tot))
        .select(col("id"),
          Events.q(col("w").cast("double") / col("sw").cast("double"),
            9).as("ec"))
        .orderBy(col("ec").desc, col("id"))
        .limit(k)
    }
  }

  /** First-phase Louvain move proposals (W429) on the weighted
    * customer⇄supplier graph from singleton communities: every node
    * simultaneously evaluates moving next to each neighbor and keeps
    * the best — ΔQ(i→{j}) = w_ij/m − k_i·k_j/(2m²), whose numerator
    * cross-multiplies to the EXACT integer 2m·w_ij − k_i·k_j (weights
    * and weighted degrees are link-multiplicity counts), so the
    * argmax per node compares integers and ties break on the smaller
    * target id. Surfaces how much modularity one synchronous sweep
    * would claim and the top moves; full Louvain iterates this sweep
    * + graph contraction (the sweep is the distributed-cost part —
    * contraction is a keyed groupBy). Scale: one weighted-edge agg,
    * one degree agg, one edge-keyed join + per-src argmax window.
    */
  def louvainMoveGains(s: SparkSession, dir: String,
                       k: Int = 15): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // lazy track, not eager register (r11 measured both): the race
    // builds the edge table twice, but the eager count's extra action
    // + cache-encode round measured slightly WORSE query CPU here —
    // unlike graph_backbone, where the same table feeds three branches
    // and eager registration removed two full rebuilds
    val ew = CacheScope.track(
      customerSupplierEdges(s, dir, distinctPairs = false)
        .groupBy("src", "dst").agg(count(lit(1)).as("w"))
        .persist()) // degrees + totals + the gain join read it
    val deg = ew.groupBy("src").agg(sum(col("w")).as("kk"))
    val tot = ew.agg(sum(col("w")).as("m2")) // = 2m
    val gains = ew
      .join(deg.select(col("src").as("si"), col("kk").as("ki")),
        col("src") === col("si"))
      .join(deg.select(col("src").as("sj"), col("kk").as("kj")),
        col("dst") === col("sj"))
      .crossJoin(broadcast(tot))
      .select(col("src"), col("dst"), col("m2"),
        (col("m2").cast("decimal(38,0)") * col("w") -
          col("ki").cast("decimal(38,0)") * col("kj")).as("num"))
    val best = gains
      .withColumn("rn", row_number().over(
        Window.partitionBy("src")
          .orderBy(col("num").desc, col("dst"))))
      .filter(col("rn") === 1)
      .select(col("src"), col("dst"), col("num"), col("m2"))
      .persist()
    CacheScope.register(best) // eager: summary + top-k read it
    val summ = best.agg(count(lit(1)).as("n_nodes"),
      sum((col("num") > 0).cast("long")).as("n_moved"),
      sum(when(col("num") > 0, col("num"))
        .otherwise(lit(0).cast("decimal(38,0)"))).as("gs"),
      max(col("m2")).as("m2s"))
    val m2D = col("m2").cast("double")
    best.orderBy(col("num").desc, col("src")).limit(k)
      .crossJoin(broadcast(summ))
      .select(col("n_nodes"), col("n_moved"),
        Events.q(lit(2.0) * col("gs").cast("double") /
          (col("m2s").cast("double") * col("m2s").cast("double")), 9)
          .as("total_gain"),
        col("src"), col("dst").as("best_dst"),
        Events.q(lit(2.0) * col("num").cast("double") / (m2D * m2D), 9)
          .as("gain"))
  }

  /** Resource-allocation link prediction (W430): for supplier pairs,
    * RA(s1,s2) = Σ_{z ∈ Γ(s1)∩Γ(s2)} 1/deg(z) — [[adamicAdar]]'s
    * sibling with the harsher 1/deg weight (a shared hub customer is
    * worth almost nothing; a shared exclusive customer is worth
    * everything). The wedge weight is the INTEGER 10⁹ div deg — pure
    * integral division on both engines, so scores are exact LONG
    * sums with no float anywhere (Adamic–Adar's 1/ln(deg) can't do
    * this; that's why this variant gets the hash-exact contract).
    * Same scale posture as adamicAdar: the degree band [2, degCap]
    * bounds wedge fan-out, candidate volume is Σ deg² over capped
    * degrees.
    */
  def resourceAllocation(s: SparkSession, dir: String, k: Int = 50,
                         degCap: Int = 64): DataFrame = {
    val adj = customerSupplierEdges(s, dir)
      .filter(col("src") < lit(1000000L))
      .select(col("src").as("c"), col("dst").as("sup"))
    val deg = adj.groupBy("c").agg(count(lit(1)).as("deg"))
      .filter(col("deg").between(2, degCap))
    val wb = adj.join(deg, "c")
      .select(col("c"), col("sup"),
        expr("CAST(1000000000 DIV deg AS BIGINT)").as("w9"))
      .persist()
    graft.CacheScope.register(wb) // eager: both wedge sides read it
    wb.join(wb.select(col("c"), col("sup").as("s2")), "c")
      .filter(col("sup") < col("s2"))
      .groupBy(col("sup").as("s1"), col("s2"))
      .agg(count(lit(1)).as("common"), sum(col("w9")).as("ra9"))
      .orderBy(col("ra9").desc, col("s1"), col("s2"))
      .limit(k)
  }

  /** Moran's I network autocorrelation (W438) of supplier revenue
    * over the co-purchase projection: do high-revenue suppliers sit
    * NEXT TO other high-revenue suppliers (I > E[I] = −1/(n−1)), or
    * is revenue scattered independently of the graph? The spatial-
    * statistics workhorse pointed at a transaction graph — the
    * attribute-level complement of [[assortativity]] (which
    * correlates DEGREES, not an external attribute). Deviations
    * cross-multiply to exact integers z'ᵢ = n·xᵢ − S (cents), so the
    * numerator Σ_w z'ᵢz'ⱼ and denominator Σ z'ᵢ² are exact DECIMAL
    * and the n² scale cancels in I = n·Σ_w z'z' / (W·Σz'²) — one
    * division. All suppliers with revenue enter n and the variance;
    * only projection edges enter the numerator (isolates dilute I,
    * as they should). The projection caps order fan-out at
    * `orderCap` suppliers so wedge volume is Σ cap² — the
    * [[adamicAdar]] posture; at ~1e7 suppliers the cent-grid
    * products approach DECIMAL(38)'s ceiling: coarsen the value grid
    * to whole currency units there (I is grid-invariant).
    */
  def moranI(s: SparkSession, dir: String,
             orderCap: Int = 16): DataFrame = {
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_suppkey"),
        floor(col("l_extendedprice") * lit(100) + lit(0.5)).cast("long")
          .as("cents"))
    val x = li.groupBy(col("l_suppkey").as("sid"))
      .agg(sum(col("cents")).as("x")).persist()
    CacheScope.register(x) // eager: moments + both numerator sides
    val tot = x.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val z = x.crossJoin(broadcast(tot))
      .select(col("sid"), col("n"),
        (col("x").cast("decimal(38,0)") * col("n") - col("sx"))
          .as("z"))
      .persist()
    CacheScope.register(z) // eager: denominator + two join probes
    // NOT cached (r11 measured): the distinct runs twice (size filter
    // + adjacency probe) but recomputing the codegen'd scan+distinct
    // is cheaper than an InMemoryRelation round-trip (caching measured
    // 2× query CPU) — see edgeSurprise for the rule of thumb
    val ok = li.select("l_orderkey", "l_suppkey").distinct()
      .groupBy("l_orderkey").agg(count(lit(1)).as("osz"))
      .filter(col("osz").between(2, orderCap))
    val adj = li.select("l_orderkey", "l_suppkey").distinct()
      .join(ok.select("l_orderkey"), "l_orderkey")
    // co-occurrence multiplicity per pair; keep the top decile by the
    // exact cross-multiplied cumulative rule (c ≥ the 90th-pct value)
    // — a dense fixture would otherwise yield the COMPLETE graph, on
    // which I ≡ −1/(n−1) identically. Scale-invariant: the cut is a
    // quantile of the multiplicity distribution, not a literal.
    val pairs0 = adj.select(col("l_orderkey").as("kk"),
        col("l_suppkey").as("a"))
      .join(adj.select(col("l_orderkey").as("kk"),
        col("l_suppkey").as("b")), "kk")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("c"))
      .persist()
    CacheScope.register(pairs0) // eager: threshold + the kept edges
    val np = pairs0.agg(count(lit(1)).as("np"))
    val thr = pairs0.groupBy("c").agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.orderBy("c")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .crossJoin(broadcast(np))
      .filter(col("cum") * 10 >= col("np") * 9)
      .agg(min(col("c")).as("thr"))
    val pairs = pairs0.crossJoin(broadcast(thr))
      .filter(col("c") >= col("thr"))
      .select("a", "b")
    val num = pairs
      .join(z.select(col("sid").as("a"), col("z").as("za")), "a")
      .join(z.select(col("sid").as("b"), col("z").as("zb")), "b")
      .agg(coalesce(sum(col("za") * col("zb")),
        lit(0).cast("decimal(38,0)")).as("num"),
        count(lit(1)).as("npairs"))
    val den = z.agg(sum(col("z") * col("z")).as("den"),
      max(col("n")).as("n"))
    val wTot = col("npairs") * 2
    val denS = when(col("den") === 0, lit(1)).otherwise(col("den"))
      .cast("double")
    val wS = when(wTot === 0, lit(1L)).otherwise(wTot).cast("double")
    val i = col("n").cast("double") *
      (lit(2.0) * col("num").cast("double")) / (wS * denS)
    val okI = wTot > 0 && col("den") > 0
    num.crossJoin(broadcast(den))
      .select(col("n").as("n_suppliers"), wTot.as("w_edges"),
        when(okI, Events.q(i, 6)).otherwise(lit(0.0)).as("moran_i"),
        Events.q(lit(-1.0) / (col("n").cast("double") - 1), 6)
          .as("e_i"),
        when(okI && Events.q(i, 6) >
          Events.q(lit(-1.0) / (col("n").cast("double") - 1), 6),
          lit(1L)).otherwise(lit(0L)).as("clustered_flag"))
  }

  /** Newman-weighted bipartite projection (W448): supplier pairs
    * scored by collaboration weight Σ_orders 1/(n_o − 1) — each
    * shared order's credit SPLITS among the pairs it creates, so a
    * 2-supplier order (an exclusive collaboration) outweighs ten
    * 16-supplier ones, where the plain co-occurrence count
    * ([[moranI]]'s projection) treats them alike. The weight is the
    * INTEGER 10⁹ div (n_o − 1) — integral division on both engines,
    * scores are exact LONG sums, no float anywhere (the
    * [[resourceAllocation]] contract, order-centric). Order fan-out
    * capped at `orderCap`, so pair volume is Σ cap² per order.
    */
  def newmanProjection(s: SparkSession, dir: String, k: Int = 30,
                       orderCap: Int = 16): DataFrame = {
    val dl = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey").distinct()
    val osz = dl.groupBy("l_orderkey").agg(count(lit(1)).as("osz"))
      .filter(col("osz").between(2, orderCap))
    val adj = dl.join(osz, "l_orderkey")
      .select(col("l_orderkey").as("kk"), col("l_suppkey").as("sup"),
        expr("CAST(1000000000 DIV (osz - 1) AS BIGINT)").as("w9"))
    adj.join(adj.select(col("kk"), col("sup").as("s2"),
        col("w9").as("w92")), "kk")
      .filter(col("sup") < col("s2"))
      .groupBy(col("sup").as("s1"), col("s2"))
      .agg(count(lit(1)).as("n_orders"), sum(col("w9")).as("nw9"))
      .orderBy(col("nw9").desc, col("s1"), col("s2"))
      .limit(k)
  }

  /** Configuration-model edge surprise (W449): observed co-purchase
    * weight over its degree-preserving null expectation,
    * lift = w_ij·2m / (k_i·k_j) — "which supplier pairs co-occur far
    * MORE than their popularity predicts?", the modularity numerator
    * ([[louvainMoveGains]]) read as a per-edge diagnostic instead of
    * a partition objective, and the ratio complement of
    * [[graphBackbone]]'s within-node significance test. Weights,
    * weighted degrees, and 2m are exact integers; the lift is ONE
    * division on the 1e-6 grid; a minimum support w ≥ `minW` keeps
    * the tiny-expectation noise out of the top list. Scale: one
    * pair agg + one degree agg + a keyed join.
    */
  def edgeSurprise(s: SparkSession, dir: String, k: Int = 20,
                   minW: Long = 5L, orderCap: Int = 16): DataFrame = {
    // NOT cached (r11 measured): dl is read twice (size filter + the
    // adjacency probe), but the dup subtree is a codegen'd parquet
    // scan + distinct — cheaper to recompute than to encode/decode an
    // InMemoryRelation (caching measured +65% query CPU; the cache
    // only pays when the duplicated subtree is join/window-expensive,
    // e.g. graph_backbone's weighted-edge build)
    val dl = Tables.lineitem(s, dir)
      .select("l_orderkey", "l_suppkey").distinct()
    val osz = dl.groupBy("l_orderkey").agg(count(lit(1)).as("osz"))
      .filter(col("osz").between(2, orderCap))
    val adj = dl.join(osz.select("l_orderkey"), "l_orderkey")
    val pw = CacheScope.track(adj
      .select(col("l_orderkey").as("kk"), col("l_suppkey").as("a"))
      .join(adj.select(col("l_orderkey").as("kk"),
        col("l_suppkey").as("b")), "kk")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
      .persist()) // eager: degrees + total + the lift join read it
    val deg = pw.select(col("a").as("x"), col("w"))
      .unionAll(pw.select(col("b").as("x"), col("w")))
      .groupBy("x").agg(sum(col("w")).as("kx"))
    val m2 = pw.agg((sum(col("w")) * 2).as("m2"))
    val lift = pw.filter(col("w") >= minW)
      .join(deg.select(col("x").as("a"), col("kx").as("ka")), "a")
      .join(deg.select(col("x").as("b"), col("kx").as("kb")), "b")
      .crossJoin(broadcast(m2))
      .select(col("a").as("s1"), col("b").as("s2"), col("w"),
        Events.q(col("w").cast("double") * col("m2").cast("double") /
          (col("ka").cast("double") * col("kb").cast("double")), 6)
          .as("lift"))
    lift.orderBy(col("lift").desc, col("s1"), col("s2")).limit(k)
  }

  /** Molloy–Reed percolation threshold (W454) of the
    * customer⇄supplier graph: κ = ⟨k²⟩/⟨k⟩ and the random-failure
    * critical fraction f_c = (κ−2)/(κ−1) — "what share of nodes can
    * fail before the giant component shatters?", the one-number
    * robustness readout behind every degree-distribution plot
    * ([[degreeDistribution]] shows the histogram; this is its
    * actionable summary). κ > 2 is the giant-component existence
    * criterion. Degree moments are exact integer sums (Σk² ≤ n·k²max
    * in DECIMAL), both ratios divide once. Scale: one degree agg +
    * one moment agg.
    */
  def percolationThreshold(s: SparkSession, dir: String): DataFrame = {
    val deg = customerSupplierEdges(s, dir)
      .groupBy("src").agg(count(lit(1)).as("k"))
    val g = deg.agg(count(lit(1)).as("n"), sum(col("k")).as("sk"),
      sum(col("k").cast("decimal(38,0)") * col("k")).as("skk"))
    val kap = col("skk").cast("double") / col("sk").cast("double")
    val kapS = when(kap === lit(1.0), lit(2.0)).otherwise(kap)
    g.select(col("n").as("n_nodes"),
      Events.q(col("sk").cast("double") / col("n").cast("double"), 6)
        .as("mean_deg"),
      Events.q(kap, 6).as("kappa"),
      when(kap > 1.0, Events.q((kap - 2) / (kapS - 1), 6))
        .otherwise(lit(0.0)).as("f_critical"),
      (Events.q(kap, 6) > lit(2.0)).cast("long")
        .as("giant_component_flag"))
  }

  /** kNN-graph hubness audit (W455): the k-occurrence distribution —
    * how often each vector appears in OTHER vectors' top-k lists —
    * summarized by its max and moment skewness. High-dimensional
    * embedding spaces grow HUBS (a few vectors near everyone) whose
    * k-occurrence skew silently corrupts kNN classification and
    * retrieval diversity; this is the canonical health check run
    * before trusting [[bruteForceTopK]]-style retrieval. Neighbor
    * lists use the exact fused cosine with a (sim, id) total order;
    * occurrence moments are exact integers and the g₁ skewness is
    * one fixed double fold. Exact all-pairs at fixture scale; the
    * 100 TB path reuses [[ivfTopK]]'s candidate lists — hubness only
    * needs each vector's top-k, however those are produced.
    */
  def knnHubness(s: SparkSession, dir: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val scored = emb.crossJoin(broadcast(
        emb.select(col("vec_id").as("qid"), col("embedding").as("qv"))))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        Similarity.cosine(col("embedding"), col("qv")).as("sim"))
    val topk = scored.withColumn("rn", row_number().over(
        Window.partitionBy("qid")
          .orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rn") <= k)
    val occ = emb.select(col("vec_id"))
      .join(topk.groupBy("vec_id").agg(count(lit(1)).as("o")),
        Seq("vec_id"), "left")
      .select(coalesce(col("o"), lit(0L)).as("o"))
    val g = occ.agg(count(lit(1)).as("n"), sum(col("o")).as("so"),
      sum(col("o") * col("o")).as("soo"),
      sum(col("o") * col("o") * col("o")).as("sooo"),
      max(col("o")).as("mx"))
    val nD = col("n").cast("double")
    val m1 = col("so").cast("double") / nD
    val m2 = col("soo").cast("double") / nD - m1 * m1
    val m3 = col("sooo").cast("double") / nD -
      lit(3.0) * m1 * (col("soo").cast("double") / nD) +
      lit(2.0) * m1 * m1 * m1
    val m2S = when(m2 <= 0.0, lit(1.0)).otherwise(m2)
    val skew = when(m2 > 0.0,
      Events.q(m3 / (m2S * sqrt(m2S)), 6)).otherwise(lit(0.0))
    g.select(col("n").as("n_vecs"), lit(k.toLong).as("k"),
      col("mx").as("max_k_occurrence"), skew.as("skew_g1"),
      (skew > lit(1.0)).cast("long").as("hubness_flag"))
  }

  /** Average-neighbor-degree curve knn(d) (W462): for nodes of
    * degree bucket d (degrees above `cap` pool into the top bucket),
    * the mean degree of their neighbors — the CURVE behind
    * [[assortativity]]'s single correlation number (rising knn(d) =
    * assortative core, falling = hubs feeding leaves, the
    * rich-club/disassortative signature). Flattened to edge level so
    * each bucket is one exact integer division: knn(d) =
    * Σ_{(u,v): deg(u)∈d} deg(v) / #such edges — no per-node rational
    * ever materializes. Scale: one degree agg + two degree joins
    * keyed on edge endpoints.
    */
  def avgNeighborDegree(s: SparkSession, dir: String,
                        cap: Int = 20): DataFrame = {
    val e = customerSupplierEdges(s, dir)
    val deg = CacheScope.track(e.groupBy("src")
      .agg(count(lit(1)).as("k")).persist())
    val flat = e
      .join(deg.select(col("src"), col("k").as("ku")), "src")
      .join(deg.select(col("src").as("dst"), col("k").as("kv")), "dst")
      .select(least(col("ku"), lit(cap.toLong)).as("bucket"),
        col("kv"))
    flat.groupBy("bucket")
      .agg(count(lit(1)).as("n_edges"), sum(col("kv")).as("sk"))
      .select(col("bucket"), col("n_edges"),
        Events.q(col("sk").cast("double") /
          col("n_edges").cast("double"), 6).as("knn_mean"))
      .orderBy("bucket")
  }

  /** Jaccard link prediction (W485) between suppliers through shared
    * customers — |Γa∩Γb|/|Γa∪Γb|, the set-overlap companion to
    * [[adamicAdar]]'s weighted score, and the one with NO
    * transcendental anywhere: common counts and degrees are exact
    * integers from the same degree-capped wedge join (deg ∈ [2, cap]
    * customers only, so wedge volume stays linear in |E|), union =
    * d₁+d₂−common, and the ratio is one division. Degrees are counted
    * over the SAME capped customer set the wedges use, so the score
    * is internally consistent (documented convention). Top-k cut on
    * the 6-dp quantized score with pair tiebreak.
    */
  def jaccardLinkPred(s: SparkSession, dir: String, k: Int = 50,
                      degCap: Int = 64): DataFrame = {
    val adj = customerSupplierEdges(s, dir)
      .filter(col("src") < lit(1000000L))
      .select(col("src").as("c"), col("dst").as("sup"))
    val degC = adj.groupBy("c").agg(count(lit(1)).as("deg"))
      .filter(col("deg").between(2, degCap))
    val capped = CacheScope.track(
      adj.join(degC.select("c"), "c").persist())
    val degS = capped.groupBy("sup").agg(count(lit(1)).as("d"))
    val common = capped
      .join(capped.select(col("c"), col("sup").as("s2")), "c")
      .filter(col("sup") < col("s2"))
      .groupBy(col("sup").as("s1"), col("s2"))
      .agg(count(lit(1)).as("common"))
    common
      .join(degS.select(col("sup").as("s1"), col("d").as("d1")), "s1")
      .join(degS.select(col("sup").as("s2"), col("d").as("d2")), "s2")
      .select(col("s1"), col("s2"), col("common"),
        (col("d1") + col("d2") - col("common")).as("union_sz"),
        Events.q(col("common").cast("double") /
          (col("d1") + col("d2") - col("common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("s1"), col("s2"))
      .limit(k)
  }

  /** Preferential-attachment link scores (W486) — deg(a)·deg(b) over
    * wedge-connected supplier pairs, the "rich get richer" baseline
    * every link-prediction eval includes next to [[jaccardLinkPred]]
    * and [[adamicAdar]]. Pure integer products over the same
    * degree-capped candidate wedges (suppliers are never directly
    * adjacent in the bipartite projection, so every candidate is a
    * genuine non-edge); top-k cut on the exact LONG score with pair
    * tiebreak — no float anywhere in the operator.
    */
  def preferentialAttachment(s: SparkSession, dir: String, k: Int = 50,
                             degCap: Int = 64): DataFrame = {
    val adj = customerSupplierEdges(s, dir)
      .filter(col("src") < lit(1000000L))
      .select(col("src").as("c"), col("dst").as("sup"))
    val degC = adj.groupBy("c").agg(count(lit(1)).as("deg"))
      .filter(col("deg").between(2, degCap))
    val capped = CacheScope.track(
      adj.join(degC.select("c"), "c").persist())
    val degS = capped.groupBy("sup").agg(count(lit(1)).as("d"))
    val cand = capped
      .join(capped.select(col("c"), col("sup").as("s2")), "c")
      .filter(col("sup") < col("s2"))
      .select(col("sup").as("s1"), col("s2"))
      .distinct()
    cand
      .join(degS.select(col("sup").as("s1"), col("d").as("d1")), "s1")
      .join(degS.select(col("sup").as("s2"), col("d").as("d2")), "s2")
      .select(col("s1"), col("s2"), col("d1"), col("d2"),
        (col("d1") * col("d2")).as("pa_score"))
      .orderBy(col("pa_score").desc, col("s1"), col("s2"))
      .limit(k)
  }
}
