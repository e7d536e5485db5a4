package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.sources.{AdjacencyCatalog, AdjacencySource, GraftBucketFunction}

/** W552: storage-partitioned join on bucketed adjacency tables —
  * bucket-pure files, catalog-resolved `bucket` function,
  * KeyGroupedPartitioning reported by the scan, and the self-join
  * planning with ZERO shuffle exchanges when
  * `spark.sql.sources.v2.bucketing.enabled` is on.
  */
class SpjSpec extends SparkSpec {

  private def deleteRec(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }

  private def shuffles(df: DataFrame): Int = {
    val plan = df.queryExecution.executedPlan
    val expanded = plan.collect {
      case a: AdaptiveSparkPlanExec => a.executedPlan
    } match {
      case Seq() => Seq(plan)
      case ps => ps
    }
    expanded.map(_.collect { case s: ShuffleExchangeLike => s }.size).sum
  }

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      body
    } finally saved.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }

  test("bucketed create: sidecar, bucket-pure files, reported " +
    "partitioning; SPJ self-join plans zero shuffles; fallbacks safe") {
    val root = Files.createTempDirectory("graft_spj").toString
    val cat = "graft_spj_cat"
    try {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[AdjacencyCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val n = 8
      val edges = spark.range(400).select(
        (col("id") % 37).as("src"), (col("id") % 11).as("dst"))
      edges.writeTo(s"$cat.edges")
        .partitionedBy(bucket(n, col("src"))).create()

      // sidecar + bucket-pure file naming and contents
      assert(Files.exists(Paths.get(root, "edges",
        AdjacencySource.BucketSpecFile)))
      import scala.jdk.CollectionConverters._
      val files = Files.list(Paths.get(root, "edges")).iterator().asScala
        .map(_.getFileName.toString)
        .filterNot(f => f.startsWith("_") || f.startsWith(".")).toSeq
      assert(files.nonEmpty && files.forall(_.matches("part-b\\d+-.*")),
        files)
      files.foreach { f =>
        val b = "part-b(\\d+)-.*".r.findFirstMatchIn(f).get.group(1).toInt
        Files.readAllLines(Paths.get(root, "edges", f)).asScala
          .filter(_.nonEmpty).foreach { line =>
            val src = line.trim.split("\\s+")(0).toLong
            assert(AdjacencySource.bucketOf(src, n) == b,
              s"file $f holds src $src of bucket ${
                AdjacencySource.bucketOf(src, n)}")
          }
      }

      // function/table agreement: the catalog function computes the
      // same bucket the writer used to name files
      for (src <- Seq(-9L, -1L, 0L, 5L, 36L, Long.MaxValue)) {
        val viaFn = GraftBucketFunction.produceResult(
          new org.apache.spark.sql.catalyst.expressions
            .GenericInternalRow(Array[Any](n, src)))
        assert(viaFn == AdjacencySource.bucketOf(src, n))
      }

      val want = {
        val e = edges
        e.as("a").join(e.as("b"), col("a.src") === col("b.src"))
          .groupBy(col("a.src").as("src"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("a.dst") + col("b.dst")).as("dst_sum"))
          .collect().map(_.toString).toSeq.sorted
      }
      // no orderBy: a global sort legitimately plans its own range
      // exchange — the claim under audit is the JOIN+AGG being
      // exchange-free, so compare order-free
      def selfJoin(): DataFrame = {
        val e = spark.table(s"$cat.edges")
        e.as("a").join(e.as("b"), col("a.src") === col("b.src"))
          .groupBy(col("a.src").as("src"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("a.dst") + col("b.dst")).as("dst_sum"))
      }

      // SPJ on, broadcast off, AQE off for a stable plan shape: the
      // join AND the src aggregation ride the reported partitioning —
      // zero shuffle exchanges anywhere in the plan
      withConfs(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = selfJoin()
        assert(shuffles(j) == 0,
          s"expected exchange-free SPJ plan:\n${
            j.queryExecution.executedPlan}")
        assert(j.collect().map(_.toString).toSeq.sorted == want)
      }
      // AQE ON (the posture Verify/Bench run under): SPJ must still
      // engage — execute, then count exchanges in the adaptive plan
      withConfs(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "true") {
        val j = selfJoin()
        assert(j.collect().map(_.toString).toSeq.sorted == want)
        assert(shuffles(j) == 0,
          s"SPJ must hold under AQE:\n${j.queryExecution.executedPlan}")
      }

      // same answer with the conf OFF (shuffled plan) — the report is
      // an optimization, never a correctness dependency
      withConfs(
        "spark.sql.sources.v2.bucketing.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val j = selfJoin()
        assert(shuffles(j) > 0)
        assert(j.collect().map(_.toString).toSeq.sorted == want)
      }

      // a PATH-BASED append reads the same sidecar, so it too writes
      // bucket-pure files — the table keeps its SPJ eligibility no
      // matter which write path appends
      spark.range(1).select(lit(400L).as("src"), lit(3L).as("dst"))
        .write.format("graft-adjacency").mode("append")
        .save(s"$root/edges")
      withConfs(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = selfJoin()
        assert(shuffles(j) == 0,
          "sidecar-respecting append must keep SPJ eligibility")
        val got = j.collect().map(_.toString).toSeq
        assert(got.size == want.size + 1) // src=400 joins itself once
      }

      // a file claiming a bucket id at/past the spec'd count (layout
      // drift) demotes too — claiming key-grouping over it could
      // co-locate the wrong rows
      Files.writeString(
        Paths.get(root, "edges", s"part-b$n-drift-0.adj"), "600 1\n")
      withConfs(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        assert(shuffles(selfJoin()) > 0,
          "out-of-range bucket id must demote the scan")
      }
      Files.delete(Paths.get(root, "edges", s"part-b$n-drift-0.adj"))

      // a file the connector did NOT write (manual drop — the one way
      // an impure file can appear) voids the guarantee: the scan
      // demotes to per-file splits + unknown partitioning, results
      // stay right
      Files.writeString(Paths.get(root, "edges", "manual.adj"), "500 4\n")
      withConfs(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = selfJoin()
        assert(shuffles(j) > 0, "impure table must not claim SPJ")
        val got = j.collect().map(_.toString).toSeq
        assert(got.size == want.size + 2) // src=400 and src=500
      }
    } finally {
      deleteRec(root)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  test("two DIFFERENT co-bucketed tables join exchange-free, and a " +
    "DELETE keeps SPJ eligibility") {
    val root = Files.createTempDirectory("graft_spj2").toString
    val cat = "graft_spj2_cat"
    try {
      spark.conf.set(s"spark.sql.catalog.$cat",
        classOf[AdjacencyCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      val n = 8
      spark.range(300).select((col("id") % 23).as("src"),
          (col("id") % 5).as("dst"))
        .writeTo(s"$cat.clicks").partitionedBy(bucket(n, col("src")))
        .create()
      spark.range(60).select((col("id") % 23).as("src"),
          (col("id") % 3).as("dst"))
        .writeTo(s"$cat.buys").partitionedBy(bucket(n, col("src")))
        .create()
      def joined(): DataFrame =
        spark.table(s"$cat.clicks").as("a")
          .join(spark.table(s"$cat.buys").as("b"),
            col("a.src") === col("b.src"))
          .groupBy(col("a.src").as("src"))
          .agg(count(lit(1)).as("n_pairs"))
      withConfs(
        "spark.sql.sources.v2.bucketing.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1",
        "spark.sql.adaptive.enabled" -> "false") {
        val j = joined()
        assert(shuffles(j) == 0,
          s"two co-bucketed tables must join exchange-free:\n${
            j.queryExecution.executedPlan}")
        val want = j.collect().map(_.toString).toSeq.sorted
        // DELETE rewrites files IN PLACE (names preserved): the table
        // stays bucket-pure and the next join still plans SPJ
        spark.sql(s"DELETE FROM $cat.clicks WHERE src >= 20")
        val j2 = joined()
        assert(shuffles(j2) == 0, "post-DELETE join lost SPJ")
        val got = j2.collect().map(_.toString).toSeq.sorted
        assert(got == want.filterNot { s =>
          val src = s.stripPrefix("[").takeWhile(_ != ',').toLong
          src >= 20
        })
      }
    } finally {
      deleteRec(root)
      spark.conf.unset(s"spark.sql.catalog.$cat")
      spark.conf.unset(s"spark.sql.catalog.$cat.root")
    }
  }

  test("streaming write into a bucketed table is rejected loudly") {
    val root = Files.createTempDirectory("graft_spj_stream").toString
    try {
      AdjacencySource.writeBucketSpec(s"$root/t", 4,
        new org.apache.hadoop.conf.Configuration())
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)]
      ms.addData((1L, 2L))
      val ex = intercept[Exception] {
        val q = ms.toDF().select(col("_1").as("src"), col("_2").as("dst"))
          .writeStream.format("graft-adjacency")
          .option("checkpointLocation", s"$root/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(s"$root/t")
        q.awaitTermination(120000)
        ()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(_.contains("bucketed")), ex)
    } finally deleteRec(root)
  }

  test("spj gate census equals the oracle restatement at sf0.001") {
    val got = graft.sources.CatalogAudit.spjSelfJoinAudit(spark, sf)
      .collect().map(_.toString).toSeq
    val ed = Tables.customer(spark, sf)
      .select(pmod(col("c_custkey").cast("long"), lit(100L)).as("src"),
        col("c_nationkey").cast("long").as("dst"))
    val want = ed.as("a").join(ed.as("b"), col("a.src") === col("b.src"))
      .groupBy(col("a.src").as("src"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("a.dst") + col("b.dst")).as("dst_sum"))
      .orderBy("src").collect().map(_.toString).toSeq
    assert(got == want)
  }
}
