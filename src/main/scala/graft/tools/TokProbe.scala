package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Index}

object TokProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime} yield (c - s) / 1000.0
        if (dur.exists(_ > 1.0))
          println(f"[slowstage] id=${si.stageId} tasks=${si.numTasks} dur=${dur.get}%6.2f")
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    t("bool_postfix_fetch") {
      Index.booleanQueryFetch(spark, dir, "hash join AND scan OR").count()
    }
    spark.catalog.clearCache()
    t("bool_postfix_fetch 2") {
      Index.booleanQueryFetch(spark, dir, "hash join AND scan OR").count()
    }
    spark.catalog.clearCache()
    t("ppr_top10") { Graph.pprTopK(spark, dir, Seq(1L, 2L), 8, 10).count() }
    spark.catalog.clearCache()
    t("components") {
      Graph.connectedComponents(Graph.customerSupplierEdges(spark, dir)).count()
    }
    spark.stop()
  }
}
