package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Dev probe: two formulations of neighborhood-Jaccard pair counting —
  * the shipped customer-key self-join vs an in-partition pair
  * expansion over per-customer supplier sets. Warm timings decide
  * which ships.
  */
object NjProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def pairsViaExpand(): DataFrame = {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_suppkey")
      val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
      val cs = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sup"))
      // per-customer sorted distinct supplier set, pairs expanded
      // in-partition via a nested transform (no self-join)
      val sets = cs.groupBy("c")
        .agg(array_sort(collect_set(col("sup"))).as("sups"))
      val pairs = sets.select(explode(flatten(
        transform(col("sups"), (x, i) =>
          transform(slice(col("sups"), i + lit(2),
            greatest(size(col("sups")) - i - 1, lit(0))),
            y => struct(x.as("s1"), y.as("s2")))))).as("p"))
        .select(col("p.s1"), col("p.s2"))
        .groupBy("s1", "s2").agg(count(lit(1)).as("shared"))
      val deg = cs.distinct().groupBy("sup").agg(count(lit(1)).as("deg"))
      pairs
        .join(deg.select(col("sup").as("s1"), col("deg").as("d1")), "s1")
        .join(deg.select(col("sup").as("s2"), col("deg").as("d2")), "s2")
        .select(col("s1"), col("s2"), col("shared"),
          round(col("shared") / (col("d1") + col("d2") - col("shared")), 6)
            .as("jaccard"))
        .filter(col("jaccard") >= 0.25)
    }

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[nj] $label%-18s rows=$n%6d ${(System.nanoTime - t0) / 1e9}%6.2f s")
      s.catalog.clearCache()
    }
    t("join cold")(graft.operators.Graph.neighborJaccard(s, dir).count())
    t("join warm")(graft.operators.Graph.neighborJaccard(s, dir).count())
    t("expand cold")(pairsViaExpand().count())
    t("expand warm")(pairsViaExpand().count())
    s.stop()
  }
}
