package graft.tools
import org.apache.spark.sql.SparkSession
import graft.SparkEntry
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s.read.parquet(s"$dir/documents.parquet").count()
    @volatile var cur = ""
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = starts(j.jobId) = j.time
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { st =>
          val d = (j.time - st) / 1000.0
          if (d > 0.1) println(f"[job] $cur ${j.jobId}%3d $d%5.2f s")
        }
    })
    for (n <- Seq("dedup_simhash", "dedup_fuzzy")) {
      cur = n
      val t0 = System.nanoTime
      SparkEntry.queries(n)(s, dir).count()
      println(f"[q] $n ${(System.nanoTime-t0)/1e9}%.2f s")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
