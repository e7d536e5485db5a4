package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions.{col, count, lit}

/** DSv2 adjacency-list source: row semantics, column pruning reaching
  * the reader, src-filter pushdown, multi-file partitioning, and
  * agreement with the composed `Graph.adjacencyEdges` reader.
  */
class AdjacencySourceSpec extends SparkSpec {

  private def writeGraph(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("adj")
    Files.writeString(dir.resolve("part-0.txt"), lines.mkString("\n"))
    dir.toString
  }

  test("reads nodeid neighbor* lines as (src, dst) edges") {
    val dir = writeGraph(Seq("1 2 3", "2", "", "3 1"))
    val got = spark.read.format("graft-adjacency").load(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // node 2 is dangling (no out-edges), the blank line is skipped
    assert(got == Set((1L, 2L), (1L, 3L), (3L, 1L)))
  }

  test("column pruning reaches the scan") {
    val dir = writeGraph(Seq("1 2 3", "5 6", "9 1"))
    val df = spark.read.format("graft-adjacency").load(dir).select("dst")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("dst"))
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L, 6L))
  }

  test("src filters push into the reader and still re-check above it") {
    val dir = writeGraph(Seq("1 2 3", "5 6", "9 1"))
    val df = spark.read.format("graft-adjacency").load(dir)
      .filter("src >= 5").select("dst")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b
    }.get
    // the residual re-check keeps src in the read schema — pushdown is
    // an optimization, not a correctness dependency
    assert(scan.scan.asInstanceOf[graft.sources.AdjacencyScanForTest]
      .pushedForTest.nonEmpty)
    assert(df.collect().map(_.getLong(0)).toSet == Set(6L, 1L))
  }

  test("one partition per file; agrees with the composed reader") {
    val dir = Files.createTempDirectory("adj2")
    Files.writeString(dir.resolve("a.txt"), "1 2 3\n2 1")
    Files.writeString(dir.resolve("b.txt"), "7 8\n8 7")
    val df = spark.read.format("graft-adjacency").load(dir.toString)
    assert(df.rdd.getNumPartitions == 2)
    val composed = graft.operators.Graph.adjacencyEdges(spark, dir.toString)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == composed && got.size == 5)
  }

  test("permissive mode skips malformed lines; strict mode fails loudly") {
    val dir = writeGraph(Seq("1 2 3", "oops x", "4 5"))
    val ok = spark.read.format("graft-adjacency")
      .option("mode", "permissive").load(dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ok == Set((1L, 2L), (1L, 3L), (4L, 5L)))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-adjacency").load(dir).collect()
    }
    assert(e.getMessage.contains("graft-adjacency") ||
      Option(e.getCause).exists(_.getMessage.contains("malformed")))
  }

  test("write path round-trips and collapses a node to one line") {
    import spark.implicits._
    val out = Files.createTempDirectory("adjw").toString
    val edges = Seq((1L, 3L), (1L, 2L), (7L, 1L), (2L, 1L))
      .toDF("src", "dst")
    graft.sources.Sources.writeAdjacency(edges, out)
    val back = spark.read.format("graft-adjacency").load(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(back == Set((1L, 2L), (1L, 3L), (7L, 1L), (2L, 1L)))
    // node 1's two neighbors share one sorted line in one part file
    val lines = Files.list(java.nio.file.Path.of(out)).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".adj"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
    assert(lines.count(_.startsWith("1 ")) == 1)
    assert(lines.find(_.startsWith("1 ")).get == "1 2 3")
    // overwrite replaces, not appends
    graft.sources.Sources.writeAdjacency(
      Seq((9L, 9L)).toDF("src", "dst"), out)
    val again = spark.read.format("graft-adjacency").load(out).count()
    assert(again == 1L)
    // the task-commit protocol leaves no attempt temp files behind
    val leftovers = Files.list(java.nio.file.Path.of(out)).toArray.toSeq
      .map(_.toString).filter(_.endsWith(".tmp"))
    assert(leftovers.isEmpty, s"uncleaned attempt temps: $leftovers")
  }

  test("runtime filtering (W534): a selective build side hands the " +
    "scan its src key set at execution") {
    // build-side filter on a NON-join column (grp), so static constraint
    // inference cannot pre-push a src range — only dynamic pruning can
    // narrow the scan, via SupportsRuntimeFiltering.filter(In(src, ...))
    val dir = Files.createTempDirectory("adjrt")
    val sb = new StringBuilder
    for (s <- 0 until 50)
      sb.append(s).append(" ")
        .append((0 until 5).map(d => s * 5 + d).mkString(" ")).append("\n")
    Files.writeString(dir.resolve("a.txt"), sb.toString)
    val edges = spark.read.format("graft-adjacency").load(dir.toString)
    val dim = spark.range(50).select(col("id").as("k"),
      (col("id") % 25).as("grp"))
    val j = edges.join(dim.filter(col("grp") === 1), col("src") === col("k"))
    val rows = j.collect()
    assert(rows.length == 10) // src in {1, 26}, 5 neighbors each
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def allScans(p: SparkPlan): Seq[BatchScanExec] = p.collectWithSubqueries {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec => allScans(q.plan)
    }.flatten
    val scans = allScans(j.queryExecution.executedPlan)
    assert(scans.size == 1)
    assert(scans.head.runtimeFilters.nonEmpty,
      "dynamic pruning planned no runtime filter for the DSv2 scan")
    val applied = scans.head.scan
      .asInstanceOf[graft.sources.AdjacencyScanForTest].pushedForTest
    val in = applied.collectFirst {
      case org.apache.spark.sql.sources.In("src", vs) =>
        vs.map(_.asInstanceOf[Long]).toSet
    }
    assert(in.contains(Set(1L, 26L)),
      s"scan did not receive the build side's key set: $applied")
  }

  private def scansOf(df: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    def all(p: SparkPlan): Seq[BatchScanExec] = p.collectWithSubqueries {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => all(a.executedPlan)
      case q: QueryStageExec => all(q.plan)
    }.flatten
    all(df.queryExecution.executedPlan)
  }

  test("limit and top-N push into the scan (W535); values match the " +
    "full-scan restatement") {
    val dir = Files.createTempDirectory("adjtopn")
    val sb = new StringBuilder
    for (s <- 0 until 30)
      sb.append(s).append(" ")
        .append((0 until 4).map(d => 1000 - s * 4 - d).mkString(" "))
        .append("\n")
    Files.writeString(dir.resolve("a.txt"), sb.toString)
    val edges = spark.read.format("graft-adjacency").load(dir.toString)
    // bare LIMIT: pushed per-partition cap, GlobalLimit kept above
    val lim = edges.limit(5)
    assert(lim.collect().length == 5)
    val limScan = scansOf(lim).head.scan
      .asInstanceOf[graft.sources.AdjacencyScanForTest]
    assert(limScan.pushedLimitForTest == 5)
    // top-N: ORDER BY src DESC, dst ASC LIMIT 3 becomes a size-3 heap
    val top = edges.orderBy(col("src").desc, col("dst")).limit(3)
    val got = top.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (s, d) => (-s, d) }.take(3).toSeq
    assert(got == want)
    val topScan = scansOf(top).head.scan
      .asInstanceOf[graft.sources.AdjacencyScanForTest]
    assert(topScan.pushedTopNForTest ==
      Some((Seq(("src", false), ("dst", true)), 3)),
      s"top-N not pushed: ${topScan.pushedTopNForTest}")
  }

  test("aggregate pushdown (W537): count/min/max fold inside the " +
    "reader, per-file partials merge exactly") {
    val dir = Files.createTempDirectory("adjagg")
    Files.writeString(dir.resolve("a.txt"), "5 10 11 12\n7 1\n")
    Files.writeString(dir.resolve("b.txt"), "2 99\n9 3 4\n")
    val edges = spark.read.format("graft-adjacency").load(dir.toString)
    val q = edges.agg(count(lit(1)).as("n"),
      org.apache.spark.sql.functions.min("src").as("mn"),
      org.apache.spark.sql.functions.max("dst").as("mx"))
    val r = q.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((7L, 2L, 99L)))
    val scan = scansOf(q).head.scan
      .asInstanceOf[graft.sources.AdjacencyScanForTest]
    assert(scan.pushedAggForTest ==
      Some(Seq(("count", ""), ("min", "src"), ("max", "dst"))),
      s"aggregation not pushed: ${scan.pushedAggForTest}")
  }

  test("_source_file metadata column (W538): hidden from *, " +
    "per-partition provenance when selected") {
    val dir = Files.createTempDirectory("adjmeta")
    Files.writeString(dir.resolve("a.txt"), "1 2 3\n")
    Files.writeString(dir.resolve("b.txt"), "7 8\n")
    val df = spark.read.format("graft-adjacency").load(dir.toString)
    // hidden from SELECT * like the built-in sources' _metadata
    assert(df.columns.toSeq == Seq("src", "dst"))
    val withF = df.select(col("src"), col("dst"),
      col("_source_file").as("f"))
    val got = withF.collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getString(2).split('/').last)).toSet
    assert(got == Set((1L, 2L, "a.txt"), (1L, 3L, "a.txt"),
      (7L, 8L, "b.txt")))
  }

  test("reported size stats win the broadcast decision (W536)") {
    val dir = Files.createTempDirectory("adjstats")
    Files.writeString(dir.resolve("a.txt"),
      (0 until 20).map(s => s"$s ${s % 5}").mkString("\n"))
    val edges = spark.read.format("graft-adjacency").load(dir.toString)
    val big = spark.range(100000).select(
      (col("id") % 20).as("k"), col("id").as("v"))
    val j = edges.join(big, col("src") === col("k"))
      .groupBy("dst").agg(count(lit(1)).as("n"))
    assert(j.collect().map(_.getLong(1)).sum == 100000L)
    // the adjacency scan must be the BROADCAST side: without
    // estimateStatistics a DSv2 scan reports the conf default (huge)
    // and the 100k-row range would broadcast instead
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{
      AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    def findBhj(p: SparkPlan): Seq[BroadcastHashJoinExec] =
      p.collectWithSubqueries {
        case b: BroadcastHashJoinExec => Seq(b)
        case a: AdaptiveSparkPlanExec => findBhj(a.executedPlan)
        case q: QueryStageExec => findBhj(q.plan)
      }.flatten
    val bhjs = findBhj(j.queryExecution.executedPlan)
    assert(bhjs.nonEmpty, "join did not plan a broadcast hash join")
    val bhj = bhjs.head
    val buildPlan = bhj.buildSide match {
      case org.apache.spark.sql.catalyst.optimizer.BuildLeft => bhj.left
      case org.apache.spark.sql.catalyst.optimizer.BuildRight => bhj.right
    }
    def hasScan(p: SparkPlan): Boolean = p.collectWithSubqueries {
      case b: BatchScanExec => Seq(b)
      case a: AdaptiveSparkPlanExec => if (hasScan(a.executedPlan)) Seq(null) else Seq()
      case q: QueryStageExec => if (hasScan(q.plan)) Seq(null) else Seq()
    }.nonEmpty
    assert(hasScan(buildPlan),
      "the adjacency scan is not on the broadcast build side")
  }
}
