package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns
import graft.operators.Cooccur

class CooccurSpec extends SparkSpec {
  import spark.implicits._

  test("tokenizer: punctuation stripping, case, empties") {
    val got = Seq("'Tis—so! The 2nd EST. 123 ab-ba  x")
      .toDF("text")
      .select(TextFns.tokenize($"text").as("ts"))
      .collect()(0).getSeq[String](0)
    // "'Tis—so!" -> lowercase "'tis—so!" -> strip edges -> "tis—so"
    // (inner non-letters survive, as in the reference regex)
    assert(got == Seq("tis—so", "the", "nd", "est", "ab-ba", "x"))
  }

  test("distinctWindow caps before dedup") {
    val arr = (1 to 120).map(i => s"w${i % 50}")  // repeats past 100
    val got = Seq(arr).toDF("ts")
      .select(TextFns.distinctWindow($"ts", 100).as("d"))
      .collect()(0).getSeq[String](0)
    assert(got.toSet == (1 to 100).map(i => s"w${i % 50}").toSet)
  }

  test("bigram RF sums to 1 per leading word (the reference's bug case)") {
    val rf = Cooccur.bigramRelFreq(spark, sf)
    val sums = rf.groupBy("w1").agg(sum("rf").as("s")).collect()
    assert(sums.nonEmpty)
    sums.foreach(r => assert(math.abs(r.getAs[Double]("s") - 1.0) < 1e-9))
  }

  test("pmi threshold boundary: no pair below minCount appears") {
    val pmi = Cooccur.pmiPairs(spark, sf, minCount = 10).collect()
    assert(pmi.forall(_.getAs[Long]("cnt") >= 10))
    // symmetric: (a,b) present implies (b,a) present with equal count
    val m = pmi.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    m.foreach { case ((a, b), c) => assert(m((b, a)) == c) }
  }

  test("word count matches naive recount") {
    val wc = Cooccur.wordCount(spark, sf)
    val total = wc.agg(sum("cnt")).collect()(0).getLong(0)
    val naive = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(TextFns.tokenize($"text"))).count()
    assert(total == naive && total > 0)
  }
}
