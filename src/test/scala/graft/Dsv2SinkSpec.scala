package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** W550: the DSv2 adjacency STREAMING sink — epoch-granular
  * exactly-once by idempotent naming (final names carry only
  * (epoch, partition)), hidden tmps never visible to readers,
  * append-only contract, restart-safe on one checkpoint lineage.
  */
class Dsv2SinkSpec extends SparkSpec {

  private def deleteRec(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }

  private def edgesBack(sink: String): Seq[(Long, Long)] =
    spark.read.format("graft-adjacency").load(sink)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("streaming sink: exactly-once naming, no tmp leaks, " +
    "restart-safe, epochs append") {
    val root = Files.createTempDirectory("graft_sink_spec").toString
    try {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[(Long, Long)]
      val sink = s"$root/edges"
      val ckpt = s"$root/ckpt"
      def drain(): Unit = {
        val q = ms.toDF().select(col("_1").as("src"), col("_2").as("dst"))
          .writeStream.format("graft-adjacency")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start(sink)
        assert(q.awaitTermination(120000), "sink backfill did not stop")
      }
      ms.addData((1L, 2L), (1L, 3L), (2L, 5L))
      drain()
      val first = edgesBack(sink)
      assert(first == Seq((1L, 2L), (1L, 3L), (2L, 5L)))
      // final names carry only (epoch, partition); no tmps left behind
      // (hidden "."-prefixed entries are local-FS .crc artifacts the
      // reader ignores — only .tmp leftovers would be a leak)
      import scala.jdk.CollectionConverters._
      def allNames() = Files.list(Paths.get(sink)).iterator().asScala
        .map(_.getFileName.toString).toSeq
      def names() = allNames().filterNot(_.startsWith("."))
      assert(names().nonEmpty &&
        names().forall(_.matches("part-e\\d+-\\d+\\.adj")), names())
      assert(!allNames().exists(_.endsWith(".tmp")), allNames())
      // restart on the same checkpoint with NO new data: the commit
      // log replays nothing — sink unchanged
      drain()
      assert(edgesBack(sink) == first)
      // new data lands as a NEW epoch; earlier epochs untouched
      ms.addData((2L, 7L))
      drain()
      assert(edgesBack(sink) == (first :+ ((2L, 7L))).sorted)
      assert(names().forall(_.matches("part-e\\d+-\\d+\\.adj")))
      assert(!allNames().exists(_.endsWith(".tmp")), allNames())
    } finally deleteRec(root)
  }

  test("replay census equals the batch restatement at sf0.001") {
    val got = graft.streaming.StreamReplay.dsv2SinkReplay(spark, sf)
      .collect().map(_.toString).toSeq
    val want = Tables.events(spark, sf)
      .select(pmod(col("user_id"), lit(50L)).as("src"),
        pmod(col("event_id"), lit(1000L)).as("dst"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_edges"), sum(col("dst")).as("dst_sum"))
      .orderBy("src").collect().map(_.toString).toSeq
    assert(got == want)
  }

  test("complete-mode (truncate) streaming write is rejected loudly") {
    val root = Files.createTempDirectory("graft_sink_rej").toString
    try {
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[(Long, Long)]
      ms.addData((1L, 2L))
      val ex = intercept[Exception] {
        val q = ms.toDF().groupBy(col("_1").as("src"))
          .agg(count(lit(1)).as("dst"))
          .select(col("src"), col("dst").cast("long").as("dst"))
          .writeStream.format("graft-adjacency")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("complete")
          .trigger(Trigger.AvailableNow())
          .start(s"$root/edges")
        q.awaitTermination(120000)
        ()
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(e =>
          Option(e.getMessage).toSeq ++ msgs(e.getCause))
      assert(msgs(ex).exists(m => m.contains("append-only") ||
        m.contains("Data source graft-adjacency does not support " +
          "Complete output mode") || m.contains("complete")), ex)
    } finally deleteRec(root)
  }
}
