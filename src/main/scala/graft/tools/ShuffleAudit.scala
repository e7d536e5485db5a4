package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool: measured shuffle volumes per query (the "measure, don't
  * guess" check behind SCALING.md's data-movement claims). Runs each
  * named query twice — once to warm codegen/caches, once measured —
  * and prints rows, shuffle bytes written, and records written.
  *
  * Usage: runMain graft.tools.ShuffleAudit [sfDir] [q1,q2,...]
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.lift(1).map(_.split(',').toSeq).getOrElse(Seq(
      "q5_monthly", "pmi_pairs", "dedup_minhash", "contamination",
      "asof_join", "asof_join_native"))
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    object L extends SparkListener {
      @volatile var bytes = 0L
      @volatile var records = 0L
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          bytes += m.shuffleWriteMetrics.bytesWritten
          records += m.shuffleWriteMetrics.recordsWritten
        }
      }
      def reset(): Unit = { bytes = 0L; records = 0L }
    }
    s.sparkContext.addSparkListener(L)

    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      fn(s, dir).count() // warm: codegen + any persisted intermediates
      s.catalog.clearCache()
      // let the async listener bus drain warm-run events (dev tool;
      // the public API has no flush, and 2s dwarfs event latency)
      Thread.sleep(2000)
      L.reset()
      val rows = fn(s, dir).count()
      Thread.sleep(2000)
      println(f"[shuffle] $name%-22s rows=$rows%8d " +
        f"shuffleWrite=${L.bytes / 1024.0 / 1024.0}%8.2f MB " +
        f"records=${L.records}%10d")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
