package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.functions.TextFns._
import graft.expressions.HashExpressions._

/** Dev-only stage timing for the dedup tier. */
object DedupProbe {
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
    val docSh = docs
      .select(col("doc_id"), tokenize(col("text")).as("ts"))
      .select(col("doc_id"),
        array_distinct(Dedup.shingles(col("ts"), 3)).as("shs"))
      .persist()
    t("docShingles materialize") { docSh.count() }
    val sig = docSh.select(col("doc_id"),
      minhashSignature(col("shs"), 64).as("sig"))
    t("signatures") { sig.count() }
    val banded = sig.select(col("doc_id"),
      explode(expr("transform(sequence(0, 15), b -> struct(b AS band, " +
        "hash(slice(sig, b * 4 + 1, 4)) AS bh))")).as("t"))
      .select(col("doc_id"), col("t.band"), col("t.bh")).persist()
    t("banded materialize") { banded.count() }
    val l = banded.select(col("doc_id").as("doc_a"), col("band"), col("bh"))
    val r = banded.select(col("doc_id").as("doc_b"), col("band"), col("bh"))
    val cand = l.join(r, Seq("band", "bh"))
      .filter(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
      .persist()
    t("band join candidates") { println("  cand=" + cand.count()) }
    val ver = cand
      .join(docSh.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(docSh.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (size(array_intersect(col("sa"), col("sb"))).cast("double") /
          size(array_union(col("sa"), col("sb")))).as("jaccard"))
      .filter(col("jaccard") >= 0.8)
    t("verify join") { println("  pairs=" + ver.count()) }
    // exact jaccard via shingle join
    val ex = docSh.select(col("doc_id"), explode(col("shs")).as("sh")).persist()
    t("explode shingles") { println("  ex=" + ex.count()) }
    val a = ex.select(col("doc_id").as("doc_a"), col("sh"))
    val b = ex.select(col("doc_id").as("doc_b"), col("sh"))
    val inter = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    t("shingle self-join + agg") { println("  inter rows=" + inter.count()) }
    spark.stop()
  }
}
