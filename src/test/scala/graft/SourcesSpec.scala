package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.sources.Sources
import graft.operators.{Ml, Relational}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("readTbl parses '|'-separated positional rows with a named schema") {
    val dir = Files.createTempDirectory("tbl")
    val f = dir.resolve("nation.tbl")
    Files.writeString(f, "0|ALGERIA|0|\n1|ARGENTINA|1|\n")
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    val got = Sources.readTbl(spark, f.toString, schema).collect()
    assert(got.map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet ==
      Set((0, "ALGERIA", 0), (1, "ARGENTINA", 1)))
  }

  test("readLines assigns stable unique line ids") {
    val dir = Files.createTempDirectory("txt")
    val f = dir.resolve("lines.txt")
    Files.writeString(f, "alpha\nbeta\ngamma\n")
    val got = Sources.readLines(spark, f.toString).collect()
    assert(got.length == 3)
    assert(got.map(_.getLong(0)).distinct.length == 3)
    assert(got.map(_.getString(1)).toSet == Set("alpha", "beta", "gamma"))
  }

  test("semi + anti join partition the customer set") {
    val semi = Relational.semiJoin(spark, sf, "1996-01-01").count()
    val anti = Relational.antiJoin(spark, sf, "1996-01-01").count()
    val all = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(semi + anti == all && semi > 0)
  }

  test("auc: perfect separation gives 1.0, reversed gives 0.0, ties 0.5") {
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)).toDF("s", "y")
    val reversed = Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)).toDF("s", "y")
    val allTied = Seq((0.5, 1), (0.5, 1), (0.5, 0)).toDF("s", "y")
    def v(df: org.apache.spark.sql.DataFrame): Double =
      Ml.auc(df, "s", "y").collect()(0).getDouble(0)
    assert(v(perfect) == 1.0)
    assert(v(reversed) == 0.0)
    assert(v(allTied) == 0.5)
  }
}
