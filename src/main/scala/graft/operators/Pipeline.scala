package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.CacheScope

/** Composed curation pipeline — the end-to-end shape a training-data
  * run actually executes, demonstrating that the engine's operators
  * compose as ordinary DataFrames: every stage below is an independent
  * declarative plan, so Catalyst prunes columns across the joins and
  * the stages share scans where possible.
  *
  * keep(doc) ⇔ language-ID says English
  *           ∧ quality score ≥ threshold
  *           ∧ doc is its near-dup cluster's canonical survivor
  *
  * Scale shape: three doc_id-keyed joins (co-partitioned after the
  * first shuffle); the expensive stages (LSH pair generation, component
  * clustering) are the already-bounded operators they reuse.
  */
object Pipeline {

  def curate(s: SparkSession, dir: String,
             minQuality: Double = 0.2): DataFrame = {
    // tokenize ONCE: quality, language ID and the minhash stage all
    // project from the same cached (doc_id, ts) intermediate (eagerly
    // materialized — the stages are concurrent subtrees of one action,
    // the cache-stampede shape). At cluster scale this cache is the
    // pipeline's materialized tokenized table.
    val toks = TextStats.tokenized(s, dir).persist()
    CacheScope.register(toks)
    val qual = TextStats.qualityTokens(toks)
      .select(col("doc_id"), col("quality"), col("n_tokens"))
    val lang = TextStats.langIdTokens(toks)
      .select(col("doc_id"), col("pred_lang"))
    val canon = Dedup.assignCanonicalDocs(
      toks.select(col("doc_id")),
      Dedup.minhashPairsTokens(toks, 0.8))
    qual.join(lang, "doc_id")
      .join(canon, "doc_id")
      .filter(col("pred_lang") === "en" &&
        col("quality") >= minQuality &&
        col("doc_id") === col("canonical_id"))
      .select(col("doc_id"), col("n_tokens"), col("quality"))
  }

  /** Post-curation mix report: per-source document and token counts of
    * the SURVIVING corpus with token share — the number a training-mix
    * owner reads before shipping shards (curation shifts the mix, and
    * nobody should learn that from the trained model). One broadcast
    * join of the (small) survivor table back to sources, one aggregate.
    */
  def curatedMix(s: SparkSession, dir: String,
                 minQuality: Double = 0.2): DataFrame = {
    val kept = curate(s, dir, minQuality).select("doc_id", "n_tokens")
    val src = graft.Tables.documents(s, dir).select("doc_id", "source")
    val bySource = kept.join(src, "doc_id")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).cast("long").as("n_tokens"))
      .persist()
    CacheScope.register(bySource) // eager: total + share projection both read it
    val total = bySource.agg(sum(col("n_tokens")).as("tok_total"))
    bySource.crossJoin(broadcast(total))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens") / col("tok_total"), 6).as("token_share"))
  }
}
