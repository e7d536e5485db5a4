package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Dev tool: scan every contract query's physical plan for operators
  * that are usually accidents at scale (cartesian products, nested-loop
  * joins, single-partition exchanges) and print which queries have them.
  *
  * Audit result (round 3 end, 139 queries, sf0.001): every hit is
  * intentional — BroadcastNestedLoopJoin appears only for 1-row
  * broadcast scalars (PMI marginals, PPR dangling mass,
  * tf-idf/doc-similarity/unigram-LM doc counts and totals, equi-depth
  * boundaries, Q22's positive average, chi-square's total, triangle
  * census' percentile cut), tiny broadcast spines with range
  * predicates (date_spine_fill's nation×month cross,
  * rolling_active_users' day window), and the two documented
  * brute-force baselines (knn_brute, dedup_embedding) whose scale
  * paths are knn_ivf / dedup_embedding_lsh; SinglePartition appears
  * under global scalar aggregates (q1, auc, time_to_convert's
  * percentile gather), dimension-sized global windows
  * (revenue_share's 25-row frame), and zorder_cluster's total range
  * order (a layout rewrite IS a global range partitioning — see its
  * scaladoc).
  */
object PlanScan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val suspects = Seq("CartesianProduct", "BroadcastNestedLoopJoin",
      "SinglePartition")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, dir).queryExecution.executedPlan.toString
        val hits = suspects.filter(plan.contains)
        if (hits.nonEmpty) println(s"[planscan] $name: ${hits.mkString(", ")}")
      } catch { case e: Throwable =>
        println(s"[planscan] $name: ERROR ${e.getClass.getSimpleName}")
      }
      spark.catalog.clearCache()
    }
    println("[planscan] done")
    spark.stop()
  }
}
