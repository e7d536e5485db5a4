package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.AtomicLong

/** Dev tool (OPTIMIZATION r11): per-query executor time decomposition —
  * task run time vs CPU time vs JVM GC time — to tell GC-bound from
  * CPU-bound from scheduling-bound before touching any code (guide §1).
  *
  * Usage: runMain graft.tools.GcProbe q1 q2 ...  (SPARK_GRAFT_SF_DIR,
  * SPARK_GRAFT_CPUS, and the JVM heap via SPARK_DRIVER_MEM apply).
  */
object GcProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val run = new AtomicLong; val cpu = new AtomicLong
    val gc = new AtomicLong; val deser = new AtomicLong
    s.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          run.addAndGet(m.executorRunTime)
          cpu.addAndGet(m.executorCpuTime / 1000000L)
          gc.addAndGet(m.jvmGCTime)
          deser.addAndGet(m.executorDeserializeTime)
          ()
        }
      }
    })
    s.read.parquet(s"$dir/lineitem.parquet").count()
    for (n <- args; pass <- Seq("cold", "warm")) {
      Seq(run, cpu, gc, deser).foreach(_.set(0L))
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(s, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.CacheScope.release(s, blocking = true)
      s.catalog.clearCache()
      s.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      Thread.sleep(1500) // let the listener bus drain (dev tool)
      println(f"[gc] $n%-28s $pass%-4s wall=$wall%7.2f s  " +
        f"run=${run.get / 1e3}%8.1f s  cpu=${cpu.get / 1e3}%8.1f s  " +
        f"gc=${gc.get / 1e3}%7.1f s  deser=${deser.get / 1e3}%6.1f s")
    }
    s.stop()
  }
}
