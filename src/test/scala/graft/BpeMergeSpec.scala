package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.expressions.TextExpressions

/** OPTIMIZATION r11: the fused [[TextExpressions.BpeMergeOnce]] must be
  * symbol-for-symbol identical to the pre-r11 interpreted
  * `aggregate(split(tok, ""), struct-fold)` greedy merge it replaced —
  * on the fixture corpus' tokens and on adversarial cases: overlapping
  * self-pairs (x == y), merges at token start/end, repeated merges,
  * no-match tokens, multi-byte code points.
  */
class BpeMergeSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-r11 built-ins fold, verbatim. */
  private def foldReference(tok: Column, x: String, y: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("carry"))
    aggregate(split(tok, ""), zero,
      (acc, c) => struct(
        when(acc("carry").isNull, acc("out"))
          .when(acc("carry") === lit(x) && c === lit(y),
            concat(acc("out"), array(lit(x + y))))
          .otherwise(concat(acc("out"), array(acc("carry")))).as("out"),
        when(acc("carry").isNull, c)
          .when(acc("carry") === lit(x) && c === lit(y),
            lit(null).cast("string"))
          .otherwise(c).as("carry")),
      acc => when(acc("carry").isNull, acc("out"))
        .otherwise(concat(acc("out"), array(acc("carry")))))
  }

  private val tokens = Seq(
    "ab", "aab", "aba", "abab", "ababab", "ba", "bb", "aaa", "aaaa",
    "xyzzy", "a", "ab" * 50, "caféab", "ζabζ", "aqb")

  test("fused BPE merge == struct-fold reference (fixture + edges)") {
    val fixture = Tables.documents(spark, sf)
      .select(explode(graft.functions.TextFns.tokenize(col("text")))
        .as("tok"))
      .filter(length(col("tok")) >= 2)
    val edge = tokens.toDF("tok")
    for ((df, pairs) <- Seq(
      (fixture, Seq(("t", "h"), ("a", "a"))),
      (edge, Seq(("a", "b"), ("a", "a"), ("b", "a"), ("q", "q"))))) {
      for ((x, y) <- pairs) {
        val both = df.select(
          TextExpressions.bpeMergeOnce(col("tok"), x, y).as("fused"),
          foldReference(col("tok"), x, y).as("ref"))
        val bad = both.filter(not(col("fused") <=> col("ref")))
        assert(bad.count() == 0,
          s"pair ($x,$y): " + bad.take(5).mkString("; "))
      }
    }
  }
}
