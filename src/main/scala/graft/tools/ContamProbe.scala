package graft.tools

import org.apache.spark.sql.SparkSession

/** Timing probe for the contamination operator (dev tool, not part of
  * the query surface): cold + warm wall time at an arbitrary SF dir.
  */
object ContamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .appName("contam-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $name: ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    t("warmup")(s.range(10).count())
    t("contamination cold")(
      println(graft.operators.Curation.contamination(s, dir).count()))
    t("contamination warm")(
      println(graft.operators.Curation.contamination(s, dir).count()))
    s.stop()
  }
}
