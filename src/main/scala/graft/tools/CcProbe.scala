package graft.tools
import org.apache.spark.sql.SparkSession
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[probe] $name: ${(System.nanoTime-t0)/1e9}%.2f s"); r
    }
    t("warmup")(s.range(10).count())
    t("curate cold")(println(graft.operators.Pipeline.curate(s, dir).count()))
    s.catalog.clearCache()
    t("curate again")(println(graft.operators.Pipeline.curate(s, dir).count()))
    s.stop()
  }
}
