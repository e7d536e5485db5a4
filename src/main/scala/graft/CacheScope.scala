package graft

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped registry of the persisted intermediates graft
  * operators create, so a long-lived library session can reclaim them
  * without nuking the CALLER's caches via `catalog.clearCache()`.
  *
  * Operators persist an intermediate exactly when the final plan reads
  * it from more than one subtree (the cache-stampede rule: concurrent
  * subtrees of one action would otherwise recompute it). The cache must
  * outlive the operator call — the caller's ACTION is what reads it —
  * so operators cannot unpersist on exit. Instead every such persist is
  * tracked here, and the contract is:
  *
  * {{{
  *   val df = SparkEntry.queries("doc_similarity")(spark, dir)
  *   df.write.parquet(out)        // the action that consumes the caches
  *   CacheScope.release(spark)    // then reclaim graft's intermediates
  * }}}
  *
  * or equivalently `CacheScope.scoped(spark) { ... run + act ... }`.
  * `graft.Verify` and `graft.Bench` follow this contract per query.
  * Releasing between queries bounds cached storage by one query's
  * working set instead of growing monotonically until eviction
  * pressure (the failure mode in a 1000-executor long-running driver).
  */
object CacheScope {
  private val tracked =
    mutable.Map.empty[SparkSession, mutable.ArrayBuffer[DataFrame]]

  /** Track an already-persisted intermediate for later [[release]].
    * Use for LAZY persists (first action materializes them). */
  def track[T <: DataFrame](df: T): T = synchronized {
    tracked.getOrElseUpdate(df.sparkSession, mutable.ArrayBuffer.empty) += df
    df
  }

  /** Track an already-persisted intermediate AND materialize it eagerly
    * — the stampede guard for intermediates that multiple concurrent
    * subtrees of the final action will read. */
  def register[T <: DataFrame](df: T): T = {
    df.count()
    track(df)
  }

  /** Unpersist every intermediate tracked for `spark`
    * (already-unpersisted entries are no-ops). Non-blocking by default
    * — library callers shouldn't stall on block removal; measurement
    * harnesses pass `blocking = true` so one query's removals can't
    * land on the next query's clock (VERDICT r7 #2). */
  def release(spark: SparkSession, blocking: Boolean = false): Unit = {
    val drained = synchronized { tracked.remove(spark) }
    drained.foreach(_.foreach(_.unpersist(blocking)))
  }

  /** Run `body` (a query build plus the action consuming it), then
    * release this session's tracked intermediates. */
  def scoped[T](spark: SparkSession)(body: => T): T =
    try body finally release(spark)
}
