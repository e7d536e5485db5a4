package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: row counts for every contract query at an SF dir —
  * flags queries whose result degenerates to zero rows at that scale
  * (a thresholded operator tuned at sf0.01 can silently go empty at
  * sf0.1, which the sf0.01 correctness gate cannot see).
  */
object RowScan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val n = try fn(spark, dir).count() catch { case _: Throwable => -1L }
      if (n <= 0) println(s"[rowscan] $name: $n rows")
      spark.catalog.clearCache()
    }
    println("[rowscan] done")
    spark.stop()
  }
}
