package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    import graft.expressions.HashExpressions._
    import graft.expressions.VectorExpressions._
    val df = Seq((Seq("a","b","c"), Seq(1f,2f), Seq(3f,4f))).toDF("ts","a","b")
    val out = df.select(simhash64($"ts"), minhashSignature($"ts", 8),
      cosineSim($"a", $"b")).collect()
    println("CODEGEN_ONLY_OK " + out(0))
    spark.stop()
  }
}
