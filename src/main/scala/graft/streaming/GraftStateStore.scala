package graft.streaming

import java.util.concurrent.atomic.LongAdder

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.expressions.UnsafeRow
import org.apache.spark.sql.execution.streaming.state.{
  KeyStateEncoderSpec, StateSchemaProvider, StateStore,
  StateStoreCheckpointInfo, StateStoreConf, StateStoreCustomMetric,
  StateStoreId, StateStoreInstanceMetric, StateStoreIterator,
  StateStoreMetrics, StateStoreProvider, UnsafeRowPair}
import org.apache.spark.sql.types.StructType

/** JVM-global counters for [[GraftCountingStateStoreProvider]] (W553).
  * On `local[*]` every store instance lives in one JVM so the adders
  * see the whole query; on a cluster each executor counts its own
  * stores — the production aggregation path is
  * `supportedCustomMetrics` + the progress listener (the counters here
  * are the audit's ground truth, not a metrics pipeline).
  */
object GraftStateStoreCounters {
  val gets = new LongAdder
  val puts = new LongAdder
  val removes = new LongAdder
  val commits = new LongAdder
  def reset(): Unit = {
    gets.reset(); puts.reset(); removes.reset(); commits.reset()
  }
  def snapshot: Map[String, Long] = Map(
    "gets" -> gets.sum, "puts" -> puts.sum,
    "removes" -> removes.sum, "commits" -> commits.sum)
}

/** Custom `StateStoreProvider` (W553) — the pluggable-state-backend
  * surface (`spark.sql.streaming.stateStore.providerClass`, the same
  * hook RocksDB ships through): delegates storage to the built-in
  * HDFS-backed provider (instantiated via the provider registry's own
  * `StateStoreProvider.create`, since the class is session-private)
  * and instruments every keyed operation through
  * [[GraftStateStoreCounters]]. The point of the tour is the
  * contract, pinned by spec: a stateful query runs bit-identically on
  * a user-supplied provider class, checkpoint lineage included —
  * which is what lets a 100 TB deployment swap state backends
  * (RocksDB, a custom tier) without touching query code.
  */
class GraftCountingStateStoreProvider extends StateStoreProvider {
  private val inner = StateStoreProvider.create(
    "org.apache.spark.sql.execution.streaming.state" +
      ".HDFSBackedStateStoreProvider")

  override def init(stateStoreId: StateStoreId, keySchema: StructType,
                    valueSchema: StructType,
                    keyStateEncoderSpec: KeyStateEncoderSpec,
                    useColumnFamilies: Boolean,
                    storeConfs: StateStoreConf, hadoopConf: Configuration,
                    useMultipleValuesPerKey: Boolean,
                    stateSchemaProvider: Option[StateSchemaProvider])
      : Unit =
    inner.init(stateStoreId, keySchema, valueSchema, keyStateEncoderSpec,
      useColumnFamilies, storeConfs, hadoopConf, useMultipleValuesPerKey,
      stateSchemaProvider)

  override def stateStoreId: StateStoreId = inner.stateStoreId
  override def close(): Unit = inner.close()
  override def getStore(version: Long,
                        uniqueId: Option[String]): StateStore =
    new CountingStateStore(inner.getStore(version, uniqueId))
  // reads (state source/readers) pass through uncounted — the audit
  // counts the QUERY's keyed traffic
  override def getReadStore(version: Long, uniqueId: Option[String])
      : org.apache.spark.sql.execution.streaming.state.ReadStateStore =
    inner.getReadStore(version, uniqueId)
  override def doMaintenance(): Unit = inner.doMaintenance()
  override def supportedCustomMetrics: Seq[StateStoreCustomMetric] =
    inner.supportedCustomMetrics
  override def supportedInstanceMetrics: Seq[StateStoreInstanceMetric] =
    inner.supportedInstanceMetrics
}

/** Delegating [[StateStore]] that counts gets/puts/removes/commits. */
private[streaming] class CountingStateStore(inner: StateStore)
    extends StateStore {
  import GraftStateStoreCounters._

  override def id: org.apache.spark.sql.execution.streaming.state
    .StateStoreId = inner.id
  override def version: Long = inner.version

  override def get(key: UnsafeRow, colFamilyName: String): UnsafeRow = {
    gets.increment(); inner.get(key, colFamilyName)
  }
  override def valuesIterator(key: UnsafeRow, colFamilyName: String)
      : Iterator[UnsafeRow] = {
    gets.increment(); inner.valuesIterator(key, colFamilyName)
  }
  override def prefixScan(prefixKey: UnsafeRow, colFamilyName: String)
      : StateStoreIterator[UnsafeRowPair] =
    inner.prefixScan(prefixKey, colFamilyName)
  override def iterator(colFamilyName: String)
      : StateStoreIterator[UnsafeRowPair] = inner.iterator(colFamilyName)

  override def createColFamilyIfAbsent(
      colFamilyName: String, keySchema: StructType,
      valueSchema: StructType, keyStateEncoderSpec: KeyStateEncoderSpec,
      useMultipleValuesPerKey: Boolean, isInternal: Boolean): Unit =
    inner.createColFamilyIfAbsent(colFamilyName, keySchema, valueSchema,
      keyStateEncoderSpec, useMultipleValuesPerKey, isInternal)
  override def removeColFamilyIfExists(colFamilyName: String): Boolean =
    inner.removeColFamilyIfExists(colFamilyName)

  override def put(key: UnsafeRow, value: UnsafeRow,
                   colFamilyName: String): Unit = {
    puts.increment(); inner.put(key, value, colFamilyName)
  }
  override def putList(key: UnsafeRow, values: Array[UnsafeRow],
                       colFamilyName: String): Unit = {
    puts.increment(); inner.putList(key, values, colFamilyName)
  }
  override def remove(key: UnsafeRow, colFamilyName: String): Unit = {
    removes.increment(); inner.remove(key, colFamilyName)
  }
  override def merge(key: UnsafeRow, value: UnsafeRow,
                     colFamilyName: String): Unit = {
    puts.increment(); inner.merge(key, value, colFamilyName)
  }
  override def mergeList(key: UnsafeRow, values: Array[UnsafeRow],
                         colFamilyName: String): Unit = {
    puts.increment(); inner.mergeList(key, values, colFamilyName)
  }

  override def commit(): Long = { commits.increment(); inner.commit() }
  override def abort(): Unit = inner.abort()
  override def release(): Unit = inner.release()
  override def metrics: StateStoreMetrics = inner.metrics
  override def getStateStoreCheckpointInfo: StateStoreCheckpointInfo =
    inner.getStateStoreCheckpointInfo
  override def hasCommitted: Boolean = inner.hasCommitted
}
