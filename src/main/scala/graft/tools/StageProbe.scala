package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev tool (OPTIMIZATION r11): per-STAGE time decomposition for one or
  * more queries — tasks, run/cpu/gc/deser milliseconds, shuffle
  * read/write volumes, and the stage name (callsite) — to find WHERE a
  * query's executor time actually goes (guide §1/§7).
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        if (m != null && m.executorRunTime > 200) {
          println(f"[st] id=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"run=${m.executorRunTime / 1e3}%7.2f cpu=${m.executorCpuTime / 1e9}%7.2f " +
            f"gc=${m.jvmGCTime / 1e3}%5.2f des=${m.executorDeserializeTime / 1e3}%6.2f " +
            f"sr=${m.shuffleReadMetrics.totalBytesRead / 1048576.0}%7.1fM " +
            f"sw=${m.shuffleWriteMetrics.bytesWritten / 1048576.0}%7.1fM " +
            f"rows=${m.shuffleWriteMetrics.recordsWritten}%10d " +
            si.name.take(60))
        }
      }
    })
    s.read.parquet(s"$dir/lineitem.parquet").count()
    for (n <- args; pass <- Seq("warm1", "warm2")) {
      println(s"===== $n/$pass =====")
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(s, dir).count()
      println(f"[q] $n/$pass ${(System.nanoTime() - t0) / 1e9}%.2f s")
      graft.CacheScope.release(s, blocking = true)
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      Thread.sleep(1200)
    }
    s.stop()
  }
}
