package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.AdjacencyStreamOffset

/** W551: the DSv2 adjacency MICRO_BATCH_READ surface — file-arrival
  * micro-batches with set-difference offsets, maxFilesPerTrigger
  * admission control, AvailableNow termination, and exactly-once
  * delivery across restarts on one checkpoint lineage.
  */
class Dsv2SourceStreamSpec extends SparkSpec {

  private def deleteRec(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }

  private def writeEdges(table: String, rows: Seq[(Long, Long)]): Unit = {
    import spark.implicits._
    rows.toDF("src", "dst").coalesce(1)
      .write.format("graft-adjacency").mode("append").save(table)
  }

  private def drain(table: String, out: String, ckpt: String,
                    maxFiles: Int): Long = {
    val q = spark.readStream.format("graft-adjacency")
      .option("maxFilesPerTrigger", maxFiles.toString)
      .load(table)
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", out)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "source drain did not stop")
    // batches that moved data (numInputRows > 0)
    q.recentProgress.count(_.numInputRows > 0).toLong
  }

  test("file-admission control, exactly-once across restarts, " +
    "late-arriving files picked up") {
    val root = Files.createTempDirectory("graft_src_spec").toString
    try {
      val table = s"$root/edges"
      val out = s"$root/out"
      val ckpt = s"$root/ckpt"
      // three file generations through the connector's batch writer
      writeEdges(table, Seq((1L, 2L), (1L, 3L)))
      writeEdges(table, Seq((2L, 5L)))
      writeEdges(table, Seq((3L, 7L), (3L, 8L)))
      // maxFilesPerTrigger=1 over 3 files: three data-moving batches
      val dataBatches = drain(table, out, ckpt, maxFiles = 1)
      assert(dataBatches == 3, s"expected 3 data batches, got $dataBatches")
      def sunk(): Seq[(Long, Long)] = spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      val all = Seq((1L, 2L), (1L, 3L), (2L, 5L), (3L, 7L), (3L, 8L))
      assert(sunk() == all)
      // restart on the same checkpoint, nothing new: zero reprocessing
      val again = drain(table, out, ckpt, maxFiles = 1)
      assert(again == 0, s"restart reprocessed $again batches")
      assert(sunk() == all)
      // a late-arriving file is picked up as exactly its delta
      writeEdges(table, Seq((4L, 9L)))
      drain(table, out, ckpt, maxFiles = 1)
      assert(sunk() == (all :+ ((4L, 9L))).sorted)
    } finally deleteRec(root)
  }

  test("streaming scan prunes columns and applies src pushdown " +
    "semantics identically to the batch scan") {
    val root = Files.createTempDirectory("graft_src_prune").toString
    try {
      val table = s"$root/edges"
      writeEdges(table, Seq((1L, 2L), (2L, 5L), (2L, 6L), (9L, 1L)))
      val out = s"$root/out"
      val q = spark.readStream.format("graft-adjacency").load(table)
        .where(col("src") === 2L).select("dst")
        .writeStream.format("parquet")
        .option("checkpointLocation", s"$root/ckpt")
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(120000))
      val got = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
      assert(got.toSeq == Seq(5L, 6L))
    } finally deleteRec(root)
  }

  test("offset JSON roundtrip, including escapable characters") {
    val off = AdjacencyStreamOffset(Seq("/a/part-1.adj", "/a/part-0.adj"))
    val back = AdjacencyStreamOffset.fromJson(off.json())
    assert(back.files.sorted == off.files.sorted)
    val tricky = AdjacencyStreamOffset(Seq("""/p/we"ird\name.adj"""))
    assert(AdjacencyStreamOffset.fromJson(tricky.json()) == tricky)
    assert(AdjacencyStreamOffset(Nil).json() == "[]")
  }

  test("replay census equals the batch restatement at sf0.001") {
    val got = graft.streaming.StreamReplay.dsv2SourceReplay(spark, sf)
      .collect().map(_.toString).toSeq
    val want = Tables.events(spark, sf)
      .select(pmod(col("user_id"), lit(50L)).as("src"),
        pmod(col("event_id"), lit(1000L)).as("dst"))
      .groupBy("src")
      .agg(count(lit(1)).as("n_edges"), sum(col("dst")).as("dst_sum"))
      .orderBy("src").collect().map(_.toString).toSeq
    assert(got == want)
  }
}
