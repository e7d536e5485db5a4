package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{GraftCountingStateStoreProvider,
  GraftStateStoreCounters}

/** W553: the pluggable StateStoreProvider surface — a user-supplied
  * provider class (delegating + counting) runs a stateful query
  * bit-identically to the built-in provider, across a checkpoint
  * restart, and its counters prove the query's keyed traffic actually
  * flowed through it.
  */
class StateStoreProviderSpec extends SparkSpec {

  private def deleteRec(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    val p = Paths.get(dir)
    if (Files.exists(p))
      Files.walk(p).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }

  test("custom provider: dedup runs through it (counters move), " +
    "restart survives on the same checkpoint, census exact") {
    val root = Files.createTempDirectory("graft_cstore").toString
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    try {
      spark.conf.set(key, classOf[GraftCountingStateStoreProvider].getName)
      implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
      import spark.implicits._
      val ms = MemoryStream[(Long, Long)]
      val out = s"$root/out"
      def drain(): Unit = {
        val q = ms.toDF().select(col("_1").as("k"), col("_2").as("v"))
          .dropDuplicates("k")
          .writeStream.format("parquet")
          .option("checkpointLocation", s"$root/ckpt")
          .option("path", out)
          .outputMode("append")
          .trigger(Trigger.AvailableNow())
          .start()
        assert(q.awaitTermination(120000), "drain did not stop")
      }
      GraftStateStoreCounters.reset()
      ms.addData((1L, 10L), (2L, 20L), (1L, 11L), (3L, 30L))
      drain()
      val c1 = GraftStateStoreCounters.snapshot
      assert(c1("puts") >= 3, s"expected >=3 puts, got $c1")
      assert(c1("gets") >= 4, s"expected >=4 gets, got $c1")
      assert(c1("commits") >= 1, s"expected >=1 commit, got $c1")
      def sunk(): Seq[(Long, Long)] = spark.read.parquet(out)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
      assert(sunk() == Seq((1L, 10L), (2L, 20L), (3L, 30L)))
      // restart on the same checkpoint: state reloads through the
      // custom provider; the duplicate is still recognized, the new
      // key passes
      ms.addData((2L, 21L), (4L, 40L))
      drain()
      assert(sunk() == Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L)))
      val c2 = GraftStateStoreCounters.snapshot
      assert(c2("puts") > c1("puts") || c2("gets") > c1("gets"),
        s"restart batch did not route through the provider: $c1 -> $c2")
    } finally {
      prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
      deleteRec(root)
    }
  }

  test("replay census equals SELECT DISTINCT at sf0.001, and the " +
    "provider conf is restored afterwards") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    GraftStateStoreCounters.reset()
    val got = graft.streaming.StreamReplay
      .customStateStoreReplay(spark, sf)
      .collect().map(_.toString).toSeq.sorted
    val want = Tables.events(spark, sf)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct().collect().map(_.toString).toSeq.sorted
    assert(got == want)
    assert(GraftStateStoreCounters.snapshot("puts") > 0,
      "gate did not route through the custom provider")
    assert(spark.conf.getOption(key) == before)
  }
}
