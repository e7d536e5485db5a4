package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only: per-query wall time + per-job breakdown for any list of
  * `SparkEntry.queries` names (args), at `SPARK_GRAFT_SF_DIR`. Each
  * query runs twice (cold, warm) so codegen/JIT cost is attributable.
  */
object QProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master(
        "local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.read.parquet(s"$dir/lineitem.parquet").count()
    @volatile var cur = ""
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { st =>
          val d = (j.time - st) / 1000.0
          if (d > 0.1) println(f"[job] $cur ${j.jobId}%3d $d%5.2f s")
        }
    })
    for (n <- args; pass <- Seq("cold", "warm")) {
      cur = s"$n/$pass"
      val t0 = System.nanoTime
      SparkEntry.queries(n)(s, dir).count()
      println(f"[q] $n/$pass ${(System.nanoTime - t0) / 1e9}%.2f s")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
