package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{CacheScope, Tables}
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

  /** TextRank keyword extraction (Mihalcea & Tarau 2004): weighted
    * PageRank over the adjacent-token co-occurrence graph — the
    * unsupervised keyword scorer that needs no training data, built
    * from the same tokenize pass as [[pmiPairs]] and the same fixpoint
    * shape as `Graph.pagerankGlobal`. The graph is VOCABULARY-bounded
    * (nodes = distinct tokens, edges = distinct adjacent pairs), so at
    * 100 TB the corpus-bound stage is the one bigram count shuffle;
    * the iteration moves |vocab| rank rows per round with the weighted
    * structure cached. The undirected graph has no dangling nodes, so
    * the damping feedback is structurally closed; ranks ride doubles
    * and the final surface rounds at 9 dp before the top-k cut (the
    * `pagerank_global` contract — sub-ulp gather-order noise rounds
    * away, the selected SET is deterministic).
    */
  def textrank(s: SparkSession, dir: String, rounds: Int = 8,
               damping: Double = 0.85, k: Int = 20): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(tokenize(col("text")).as("ts"))
      .filter(size(col("ts")) >= 2)
    val pairs = toks.select(
      explode(expr("transform(slice(ts, 1, size(ts)-1), (x, i) -> " +
        "struct(x AS a, element_at(ts, i+2) AS b))")).as("p"))
      .select(col("p.a"), col("p.b"))
      .filter(col("a") =!= col("b"))
    val e = CacheScope.track(pairs.select(
        explode(array(struct(col("a").as("src"), col("b").as("dst")),
          struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src"), col("e.dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .persist())
    val outw = e.groupBy("src").agg(sum("w").as("wout"))
    val struct0 = CacheScope.track(e.join(outw, "src").persist())
    val nodes = CacheScope.track(
      e.select(col("src").as("id")).distinct().persist())
    val n = nodes.count()
    var ranks = nodes.select(col("id"), lit(1.0 / n).as("r"))
    // checkpoint EVERY round (r12 revert of the r11 every-2nd-round
    // fusion): the builder's own full cold board contradicted the
    // isolated warm A/B that justified fusing — textrank task 65→77 s
    // WITH the fusion (VERDICT r11 #3/#6); the fused double-join job's
    // larger live state loses what the removed barrier saves.
    for (_ <- 1 to rounds) {
      ranks = struct0.join(ranks, struct0("src") === ranks("id"))
        .select(col("dst").as("id"),
          (col("r") * col("w") / col("wout")).as("c"))
        .groupBy("id").agg(sum("c").as("recv"))
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) * col("recv")).as("r"))
        .localCheckpoint()
    }
    ranks.orderBy(round(col("r"), 9).desc, col("id"))
      .limit(k)
      .select(col("id").as("token"), round(col("r"), 9).as("rank"))
  }
}
