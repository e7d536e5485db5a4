package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expressions.OptimizerBarrier
import graft.functions.TextFns._

/** Text-analytics tier: word/prefix counting, bigram relative frequency,
  * PMI co-occurrence (references: `WordCount.java`, `PrefixCount.java`,
  * `ComputeBigramRelativeFrequencyPairs.scala`, `PairsPMI.java`,
  * `StripesPMI.java`).
  *
  * Scale posture: everything is explode → hash-aggregate, so map-side
  * partial aggregation (the reference's hand-written combiners /
  * in-mapper combining, `WordCount.java:56-87`) is automatic. The
  * reference's pairs-vs-stripes distinction was a shuffle-size tradeoff;
  * a partial-agg'd `groupBy(w1, w2)` subsumes both layouts.
  */
object Cooccur {

  /** Word count (reference `WordCount.java:37-54`). */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokenize(col("text"))).as("word"))
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Two-char prefix count of words with length >= 2
    * (reference `PrefixCount.java:49-53`).
    */
  def prefixCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(tokenize(col("text"))).as("word"))
      .filter(length(col("word")) >= 2)
      .select(substring(col("word"), 1, 2).as("prefix"))
      .groupBy("prefix")
      .agg(count(lit(1)).as("cnt"))

  /** Bigram relative frequency `c(w1,w2) / c(w1,*)` (reference
    * `ComputeBigramRelativeFrequencyPairs.scala:41-56`). The reference's
    * running-sum-across-a-sorted-partition implementation is wrong at
    * partition boundaries (`assignment2.md:16-29`); a window aggregate
    * partitioned on `w1` is correct by construction and shuffles once.
    */
  def bigramRelFreq(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(tokenize(col("text")).as("ts"))
      .filter(OptimizerBarrier.noPushdown(size(col("ts")) >= 2))
    val bigrams = toks.select(
      explode(expr(
        "transform(slice(ts, 1, size(ts)-1), (x, i) -> " +
          "struct(x AS w1, element_at(ts, i+2) AS w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val counts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
    counts.withColumn("rf",
      col("cnt") / sum(col("cnt")).over(Window.partitionBy("w1")))
  }

  /** Pairwise PMI with the reference's exact semantics
    * (`PairsPMI.java:55-78,210-224`): per line, first `cap` tokens,
    * de-duplicated; all ordered pairs of distinct tokens co-occur;
    * pairs kept when count >= `minCount`;
    * `pmi = log10(N * c(x,y) / (c(x) * c(y)))` with N = line count.
    *
    * The reference needed two chained MR jobs with a hand-rolled
    * side-file exchange of marginals; here marginals and the line total
    * are two small aggregates broadcast back into one pipeline.
    */
  def pmiPairs(s: SparkSession, dir: String,
               minCount: Int = 10, cap: Int = 100): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(distinctWindow(tokenize(col("text")), cap).as("ts"))
    val total = toks.agg(count(lit(1)).as("n_lines"))
    val marg = toks.select(explode(col("ts")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cw"))
    val pairs = toks
      .select(explode(col("ts")).as("w1"), col("ts"))
      .select(col("w1"), explode(col("ts")).as("w2"))
      .filter(col("w1") =!= col("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
    val m1 = marg.select(col("w").as("w1"), col("cw").as("cw1"))
    val m2 = marg.select(col("w").as("w2"), col("cw").as("cw2"))
    pairs
      .join(broadcast(m1), "w1")
      .join(broadcast(m2), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("cnt"),
        round(log10(col("cnt") * col("n_lines") / (col("cw1") * col("cw2"))), 6)
          .as("pmi"))
  }
}
