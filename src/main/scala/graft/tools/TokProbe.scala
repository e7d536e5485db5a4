package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFns._

object TokProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    t("read only") { docs.select(col("doc_id"), col("text")).count() }
    t("read only 2") { docs.select(col("doc_id"), col("text")).count() }
    val toks = docs.select(col("doc_id"), tokenize(col("text")).as("ts"))
    t("tokenize") { toks.select(sum(size(col("ts")))).collect() }
    t("tokenize 2") { toks.select(sum(size(col("ts")))).collect() }
    val sh = toks.select(col("doc_id"), Dedup.shingles(col("ts"), 3).as("shs"))
    t("tok+shingles") { sh.select(sum(size(col("shs")))).collect() }
    val shd = toks.select(col("doc_id"), array_distinct(Dedup.shingles(col("ts"), 3)).as("shs"))
    t("tok+shingles+distinct") { shd.select(sum(size(col("shs")))).collect() }
    spark.stop()
  }
}
