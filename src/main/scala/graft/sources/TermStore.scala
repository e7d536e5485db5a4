package graft.sources

import scala.collection.immutable.SortedSet

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7 — the reference's external-KV postings store
  * (`BuildInvertedIndexHBase.java`, `BooleanRetrievalHBase.java:124-141`:
  * one HBase row per term, one `Get` per query term), re-expressed as a
  * PLUGGABLE point-lookup interface so the engine doesn't hard-wire any
  * store. The contract mirrors the reference's two lookups:
  * `fetchPostings(term)` → doc-id-sorted (doc, tf) pairs, and
  * `fetchDocumentSet(term)` → the sorted doc-id set boolean retrieval
  * intersects/unions.
  *
  * The default backend is parquet: the store is the `postingsLists`
  * table written range-partitioned + sorted on `term`, so a point
  * lookup prunes to a handful of row groups via parquet min/max and
  * dictionary filters — the LSM/HBase `Get` path's moral equivalent on
  * immutable files, with zero extra infrastructure. A deployment with a
  * real KV store implements the same trait; everything downstream
  * (interactive boolean retrieval over a pre-built index) is
  * backend-agnostic.
  *
  * Scale note: a point lookup returns ONE term's postings to the
  * driver — same contract as the reference's `Get`. Set algebra over
  * many huge postings lists belongs in `Index.booleanQuery`, which
  * stays fully distributed; this store serves the interactive
  * few-terms path.
  */
trait TermStore extends AutoCloseable {
  /** Doc-id-sorted (doc_id, tf) postings of one term; empty if absent. */
  def fetchPostings(term: String): Seq[(Long, Long)]

  /** The term's doc-id set (reference `fetchDocumentSet`). */
  def fetchDocumentSet(term: String): SortedSet[Long] =
    SortedSet(fetchPostings(term).map(_._1): _*)

  override def close(): Unit = ()
}

object TermStore {

  /** Write `postingsLists`-shaped rows (term, df, postings[(doc_id,
    * tf)]) as a term-ordered parquet store: `repartitionByRange` gives
    * disjoint term ranges per file and the in-file sort makes parquet
    * page/row-group min-max stats selective, so `term = x` prunes to
    * one file and few pages.
    */
  def write(postingsLists: DataFrame, path: String, files: Int = 8): Unit =
    postingsLists
      .repartitionByRange(files, col("term"))
      .sortWithinPartitions("term")
      .write.mode("overwrite").parquet(path)

  /** Parquet-backed store over a directory written by [[write]]. Each
    * lookup is one pruned scan (`PushedFilters: [EqualTo(term, ...)]`)
    * collecting a single term's list — the `Get`. */
  def parquetBacked(s: SparkSession, path: String): TermStore =
    new TermStore {
      private val table = s.read.parquet(path)
      override def fetchPostings(term: String): Seq[(Long, Long)] =
        table.filter(col("term") === term)
          .select(explode(col("postings")).as("p"))
          .select(col("p.doc_id"), col("p.tf"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .sortBy(_._1).toSeq
    }
}
