package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** OPTIMIZATION r11: the fused [[graft.expressions.TextExpressions
  * .WordShingles]] must be element-for-element identical to the pre-r11
  * built-ins composite it replaced — on the fixture corpus' token
  * arrays and on adversarial shapes: arrays shorter than n (single
  * joined element), exactly n, empty arrays (one "" element), and
  * several widths n.
  */
class ShinglesExprSpec extends SparkSpec {
  import spark.implicits._

  test("fused shingles == built-ins composite (fixture + edges)") {
    val fixture = Tables.documents(spark, sf)
      .select(graft.functions.TextFns.tokenize(col("text")).as("ts"))
    val edge = Seq(
      Seq("a"), Seq("a", "b"), Seq("a", "b", "c"),
      Seq("a", "b", "c", "d", "e"), Seq.empty[String],
      Seq("x", "", "y"), Seq("solo")).toDF("ts")
    for (df <- Seq(fixture, edge); n <- Seq(1, 2, 3, 4, 5)) {
      val both = df.select(
        Dedup.shingles(col("ts"), n).as("fused"),
        Dedup.shinglesBuiltins(col("ts"), n).as("ref"))
      val bad = both.filter(not(col("fused") <=> col("ref")))
      assert(bad.count() == 0, s"n=$n: " + bad.take(5).mkString("; "))
    }
  }

  test("schema matches the composite") {
    val df = Seq(Seq("a", "b")).toDF("ts")
    val out = df.select(Dedup.shingles(col("ts"), 3).as("fused"),
      Dedup.shinglesBuiltins(col("ts"), 3).as("ref"))
    assert(out.schema("fused").dataType == out.schema("ref").dataType,
      out.schema.treeString)
  }
}
