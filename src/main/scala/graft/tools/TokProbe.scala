package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev-only single-query timing probe with slow-stage reporting:
  * `sbt "runMain graft.tools.TokProbe <query> [query...]"`.
  */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else Seq("ppr_top10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = for {s <- si.submissionTime; c <- si.completionTime}
          yield (c - s) / 1000.0
        if (dur.exists(_ > 1.0))
          println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%3d dur=${dur.get}%5.2f")
      }
    })
    spark.read.parquet(s"$dir/lineitem.parquet").count()
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(n)(spark, dir).count()
      println(f"[probe] $n%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$rows")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
