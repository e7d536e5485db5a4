package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Dev-only timing probe for the graph tier (not part of the contract). */
object PprProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.serializer",
        sys.env.getOrElse("SPARK_GRAFT_SERIALIZER",
          "org.apache.spark.serializer.JavaSerializer"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      private val starts = scala.collection.concurrent.TrieMap[Int, Long]()
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        starts(j.jobId) = j.time
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { s =>
          println(f"[job] id=${j.jobId}%3d ${(j.time - s) / 1000.0}%6.2f s")
        }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    t("tiny warmup") {
      val tiny = spark.range(40).select(
        (col("id") % 10).as("src"), ((col("id") + 1) % 10).as("dst"))
      Graph.topK(Graph.personalizedPageRank(tiny, Seq(1L, 2L), 2),
        Seq(1L, 2L), 3).count()
      Graph.connectedComponents(tiny).count()
    }
    t("components bench-like") {
      println("  rows=" + Graph.connectedComponents(
        Graph.customerSupplierEdges(spark, dir), symmetric = true)
        .groupBy("comp").count().count())
    }
    t("ppr_top10 bench-like") {
      println("  rows=" + Graph.pprTopK(spark, dir, Seq(1L, 2L), 8, 10).collect().length)
    }
    t("ppr_top10 warm") {
      println("  rows=" + Graph.pprTopK(spark, dir, Seq(1L, 2L), 8, 10).collect().length)
    }
    spark.stop()
  }
}
