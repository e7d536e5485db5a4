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
    // bench-like warmup
    s.read.parquet(s"$dir/lineitem.parquet").count()
    s.read.parquet(s"$dir/documents.parquet")
      .select(org.apache.spark.sql.functions.explode(
        graft.functions.TextFns.tokenize(
          org.apache.spark.sql.functions.col("text")))).count()
    locally {
      import org.apache.spark.sql.functions.{col}
      val tiny = s.range(40).select((col("id") % 10).as("src"), ((col("id") + 1) % 10).as("dst"))
      graft.operators.Graph.topK(graft.operators.Graph.personalizedPageRank(tiny, Seq(1L, 2L), 2), Seq(1L, 2L), 3).count()
      graft.operators.Graph.connectedComponents(tiny).count()
    }
    s.catalog.clearCache()
    val names = Seq("ppr_top10", "graph_components", "curation_pipeline", "dedup_fuzzy", "dedup_jaccard", "tfidf_topk")
    // listener prints jobs per query
    @volatile var cur = ""
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = starts(j.jobId) = j.time
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { st =>
          val d = (j.time - st) / 1000.0
          if (d > 0.15) println(f"[job] $cur ${j.jobId}%3d $d%5.2f s")
        }
    })
    names.foreach { n =>
      cur = n
      val t0 = System.nanoTime
      SparkEntry.queries(n)(s, dir).count()
      println(f"[q] $n ${(System.nanoTime-t0)/1e9}%.2f s")
      s.catalog.clearCache()
    }
    s.stop()
  }
}
