package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** OPTIMIZATION r11: the fused codegen [[graft.expressions
  * .TextExpressions.Tokenize]] must be token-for-token identical to the
  * pre-r11 pure-built-ins composite (`split` + `transform(regexp_replace)`
  * + `filter`) it replaced — on the fixture corpus AND on adversarial
  * strings covering every boundary the regexes decided: each `\s` class
  * member, leading/trailing whitespace (regex split's empty first
  * field), interior non-letters (only EDGE runs strip), no-letter
  * tokens, Unicode uppercase with length-changing lowercase mappings,
  * empty and null inputs.
  */
class TokenizeExprSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial = Seq(
    "Hello,  World!",
    "  leading and trailing  ",
    "tabs\tand\nnewlinesvt\ffeed\rcr",
    "123 456a 7b8 a9 ..!!",
    "don't strip-interior n0n-letters",
    "ALL CAPS MiXeD",
    "İstanbul STRASSE Weiß ΣΙΣΥΦΟΣ",
    "", "   ", "\t\n", "a", "9", "~a~", "~~", "a~a",
    "x".repeat(1000) + "!Y?",
    "écolé CAFÉ naïve")

  test("fused tokenizer == built-ins composite (fixture corpus + edges)") {
    val fixture = Tables.documents(spark, sf).select(col("text"))
    val edge = adversarial.toDF("text")
    for (df <- Seq(fixture, edge)) {
      val both = df.select(
        TextFns.tokenize(col("text")).as("fused"),
        TextFns.tokenizeBuiltins(col("text")).as("ref"))
      val bad = both.filter(not(col("fused") <=> col("ref")))
      assert(bad.count() == 0, bad.take(5).mkString("; "))
    }
  }

  test("null input yields null, schema matches the composite") {
    val df = Seq[Option[String]](None, Some("a b")).toDF("text")
    val out = df.select(TextFns.tokenize(col("text")).as("fused"),
      TextFns.tokenizeBuiltins(col("text")).as("ref"))
    assert(out.schema("fused").dataType == out.schema("ref").dataType)
    val rows = out.collect()
    assert(rows.exists(r => r.isNullAt(0) && r.isNullAt(1)))
  }
}
