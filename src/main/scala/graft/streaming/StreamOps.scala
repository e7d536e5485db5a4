package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of the batch event operators
  * (`graft.operators.Events`): the same session/window semantics
  * expressed over an unbounded source. The reference is batch-only
  * (SURVEY §1.1 "Stream: none"); these are north-star additions.
  *
  * Scale posture: state is per-user (sessionize) or per-(window, type)
  * (windowedAgg) — both keyed, so state shards across executors with the
  * shuffle; watermarks bound state size.
  */
object StreamOps {

  /** One event on the wire (epoch seconds; event_id breaks same-second
    * ties so the session fold's order never depends on shuffle order).
    */
  case class Event(user_id: Long, event_id: Long, ep: Long, value: Double)

  /** A closed session emitted downstream. */
  case class Session(user_id: Long, session_seq: Long, n_events: Long,
                     start_epoch: Long, end_epoch: Long, sum_value: Double)

  /** Open-session state carried between micro-batches (field names avoid
    * single letters: the state encoder's generated code clashes on them).
    */
  case class OpenSession(seq: Long, start: Long, last: Long,
                         nEv: Long, total: Double)

  /** Windowed counts+sums per event type with a watermark — the
    * streaming form of `Events.hourlyAgg`. Append-mode compatible.
    */
  def windowedAgg(events: DataFrame, windowLen: String = "1 hour",
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))

  /** Built-in dynamic-gap session windows (W497):
    * `session_window(ts, gap)` — Spark's NATIVE session-window
    * aggregation, the declarative twin of [[sessionize]]'s explicit
    * flatMapGroupsWithState state machine (same semantics class, zero
    * custom state code; the engine merges windows that overlap or
    * TOUCH — measured: a gap of exactly `gap` still merges — so a new
    * session starts iff the inter-event gap is strictly > `gap`, at
    * full microsecond precision, matching the explicit variant's
    * boundary). Watermark-evicted like any windowed agg; append mode
    * emits each session once it can no longer grow.
    */
  def sessionWindowNative(events: DataFrame, gap: String = "30 minutes",
                          watermarkDelay: String = "10 minutes")
  : DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))

  /** Gap-based sessionization with explicit state
    * (`flatMapGroupsWithState`): a session closes when a later event
    * arrives more than `gapSeconds` after the previous one (or the group
    * times out); closed sessions are emitted append-style. Batch twin:
    * `Events.sessionize`.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long,
                 timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout != GroupStateTimeout.NoTimeout

    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[OpenSession]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        state.getOption.foreach { s =>
          out += Session(userId, s.seq, s.nEv, s.start, s.last, s.total)
        }
        state.remove()
      } else {
        var cur = state.getOption
        it.toSeq.sortBy(e => (e.ep, e.event_id)).foreach { e =>
          cur match {
            case Some(s) if e.ep - s.last <= gapSeconds =>
              cur = Some(s.copy(last = e.ep, nEv = s.nEv + 1,
                total = s.total + e.value))
            case Some(s) =>
              out += Session(userId, s.seq, s.nEv, s.start, s.last, s.total)
              cur = Some(OpenSession(s.seq + 1, e.ep, e.ep, 1, e.value))
            case None =>
              cur = Some(OpenSession(1, e.ep, e.ep, 1, e.value))
          }
        }
        cur.foreach { s =>
          state.update(s)
          // arming a timeout keeps the trigger loop hot (Spark schedules
          // empty batches to fire it) — only do so when the caller opted in
          if (useTimeout) state.setTimeoutDuration(gapSeconds * 1000)
        }
      }
      out.iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fold)
  }

  /** A timed event for the EVENT-TIME-timeout sessionizer: carries a
    * real timestamp column so a watermark can be declared on it. */
  case class TEvent(ts: java.sql.Timestamp, user_id: Long,
                    event_id: Long, value: Double)

  /** Sessionizer state with a tombstone flag: a session CLOSED by an
    * event-time timeout keeps its (closed) state so a later new
    * session continues the per-user sequence numbering — removing
    * state on timeout would restart `seq` at 1 and break parity with
    * the batch sessionizer. (A production variant bounds tombstones
    * by folding the last seq into a compact per-user record.) */
  case class SessState(seq: Long, start: Long, last: Long,
                       nEv: Long, total: Double, closed: Boolean)

  /** Gap sessionization closed by EVENT-TIME TIMEOUTS: a session is
    * emitted when the WATERMARK passes its last event + gap — not
    * when (if ever) the user's next event happens to arrive, which is
    * the liveness gap of the successor-closed variant above (a user
    * who never returns never gets their last session emitted). With
    * every group armed via `setTimeoutTimestamp(last + gap)`, the
    * final sink on a drained stream equals the BATCH sessionizer
    * exactly — including each user's final session — which is what
    * the oracle (the batch `sessionize` restatement) checks.
    */
  def sessionizeEventTime(events: Dataset[TEvent], gapSeconds: Long,
                          watermarkDelay: String = "1 second")
      : Dataset[Session] = {
    import events.sparkSession.implicits._

    def fold(userId: Long, it: Iterator[TEvent],
             state: GroupState[SessState]): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      if (state.hasTimedOut) {
        val s = state.get
        if (!s.closed) {
          out += Session(userId, s.seq, s.nEv, s.start, s.last, s.total)
          state.update(s.copy(closed = true))
          // park the tombstone's timeout far past any real watermark
          state.setTimeoutTimestamp((s.last + gapSeconds) * 1000L +
            (100L * 365 * 86400 * 1000))
        }
      } else {
        var cur = state.getOption
        it.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          val ep = e.ts.getTime / 1000
          cur match {
            case Some(s) if !s.closed && ep - s.last <= gapSeconds =>
              cur = Some(s.copy(last = ep, nEv = s.nEv + 1,
                total = s.total + e.value))
            case Some(s) =>
              // gap exceeded (or tombstone): the prior OPEN session
              // emits here; a tombstone already emitted at timeout
              if (!s.closed)
                out += Session(userId, s.seq, s.nEv, s.start, s.last,
                  s.total)
              cur = Some(SessState(s.seq + 1, ep, ep, 1, e.value,
                closed = false))
            case None =>
              cur = Some(SessState(1, ep, ep, 1, e.value, closed = false))
          }
        }
        cur.foreach { s =>
          state.update(s)
          if (!s.closed)
            state.setTimeoutTimestamp((s.last + gapSeconds) * 1000L)
        }
      }
      out.iterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fold)
  }

  /** Streaming exact dedup on a key column with a watermark — the
    * streaming form of the dedup tier's exact path (an LLM-ingest
    * pipeline dedups as documents ARRIVE, not in a later batch).
    * `dropDuplicatesWithinWatermark` keys state on the dedup column
    * ALONE (a repeat key at a different timestamp is still a
    * duplicate); the watermark lets Spark evict key state older than
    * the delay, which is what keeps state bounded on an unbounded
    * stream.
    */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
                  watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream inner join within a time window (the attribution
    * shape: each right-side event joins left-side events of the same
    * user from the preceding `windowSecs`). Both sides carry
    * watermarks and the join condition bounds the time skew, so
    * Spark can evict buffered state for either side once the
    * watermark passes — without the interval bound the state would
    * grow forever. Batch twin: `Events.rangeJoin`.
    */
  def streamStreamJoin(left: DataFrame, right: DataFrame,
                       windowSecs: Long,
                       watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id").as("l_event_id"),
        col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id").as("r_event_id"),
        col("ts").as("r_ts"))
    l.join(r,
      l("user_id") === r("user_id") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $windowSecs SECONDS") &&
        col("l_ts") <= col("r_ts"))
      .select(l("user_id"), col("l_event_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"))
  }

  /** LEFT-OUTER stream-stream join (W515): [[streamStreamJoin]]'s
    * attribution shape plus the UNMATCHED lefts — a click with no
    * purchase inside the window eventually emits with a null right
    * side, but only once the WATERMARK has passed click-ts + window
    * (until then a matching purchase could still arrive, so append
    * mode must hold the row back). State on both sides evicts at the
    * same horizon; the replay pushes a far-future sentinel through
    * both streams to flush every pending outer row deterministically.
    */
  def streamStreamJoinOuter(left: DataFrame, right: DataFrame,
                            windowSecs: Long,
                            watermarkDelay: String = "0 seconds"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
      .select(col("user_id"), col("event_id").as("l_event_id"),
        col("ts").as("l_ts"))
    val r = right.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("r_user_id"),
        col("event_id").as("r_event_id"), col("ts").as("r_ts"))
    l.join(r,
      col("user_id") === col("r_user_id") &&
        col("l_ts") >= col("r_ts") - expr(s"INTERVAL $windowSecs SECONDS") &&
        col("l_ts") <= col("r_ts"),
      "left_outer")
      .select(col("user_id"), col("l_event_id"), col("r_event_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Watermark-bounded streaming dedup (W516):
    * `dropDuplicatesWithinWatermark` — unlike plain `dropDuplicates`,
    * state for a key is DROPPABLE once the watermark passes its event
    * time + delay, so the dedup store is bounded by the lateness
    * horizon instead of growing with every key ever seen — the only
    * sane shape for an at-least-once ingest firehose at corpus scale.
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           delay: String = "3650 days"): DataFrame =
    events.withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Running per-user counters carried across micro-batches
    * (`mapGroupsWithState`, Update mode): each batch folds its events
    * into the user's persistent (n_events, sum_value) state and emits
    * the updated row — the live-profile/feature-store shape where
    * downstream wants the CURRENT per-key aggregate after every
    * batch, not a windowed slice. State is two numbers per user, so
    * it shards with the key shuffle like all keyed state here.
    */
  case class UserStats(user_id: Long, n_events: Long, sum_value: Double)

  def runningCounts(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption
            .getOrElse(UserStats(userId, 0L, 0.0))
          val cur = it.foldLeft(prev) { (acc, e) =>
            UserStats(userId, acc.n_events + 1, acc.sum_value + e.value)
          }
          state.update(cur)
          cur
      }
  }

  /** Stream-static enrichment join: every micro-batch joins against the
    * (small) static dimension, broadcast so the streaming side never
    * shuffles — the standard lookup/enrichment stage of an ingest
    * pipeline. The static side is re-resolvable per batch (Spark
    * re-plans it), so a slowly-changing dimension backed by a table
    * picks up updates between batches.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** One CDC/upsert record: the latest (ep, event_id)-versioned value
    * per (user, type) key is the live row. */
  case class CdcRow(user_id: Long, event_type: String, event_id: Long,
                    ep: Long, value: Double)

  /** Streaming CDC apply (W242): maintain the last-write-wins snapshot
    * per key across micro-batches with `mapGroupsWithState` — the
    * streaming twin of the batch `latest_snapshot` compaction (W84).
    * Out-of-order updates WITHIN the replay are resolved by the same
    * (ep, event_id) version order the batch window uses, so a drained
    * stream's final state equals the batch snapshot exactly. Update
    * mode emits the key's current snapshot every time it changes; a
    * real pipeline would sink that into a keyed store.
    */
  def cdcLatest(rows: Dataset[CdcRow]): Dataset[CdcRow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(r => (r.user_id, r.event_type))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (_: (Long, String), it: Iterator[CdcRow],
         state: GroupState[CdcRow]) =>
          val cur = it.foldLeft(state.getOption.orNull) { (best, e) =>
            if (best == null || e.ep > best.ep ||
              (e.ep == best.ep && e.event_id > best.event_id)) e
            else best
          }
          state.update(cur)
          cur
      }
  }

  /** Token-bucket state: current tokens plus the refill anchor (the
    * epoch second up to which refill has been credited — carrying the
    * anchor instead of a float rate keeps the bucket EXACT integer
    * arithmetic; while the bucket sits at capacity the anchor snaps to
    * "now" so idle time doesn't bank beyond the cap). */
  case class Bucket(tokens: Long, anchor: Long)

  /** Passed event emitted by [[rateLimit]]. */
  case class Passed(user_id: Long, event_id: Long, ep: Long,
                    tokens_left: Long)

  /** Per-user token-bucket rate limiter (`flatMapGroupsWithState`,
    * append mode): an event passes iff its user's bucket holds ≥ 1
    * token (consume one); buckets refill one token per `refillSecs`
    * of EVENT time and cap at `capacity` — the stateful throttle a
    * streaming ingest pipeline puts in front of per-key quotas
    * (sampling hot users without touching quiet ones). Entirely
    * integer state: (tokens, refill anchor), so the drained-stream
    * output replays exactly in the oracle's per-user recursive fold.
    * Like [[sessionize]], events sort (ep, event_id) within a batch
    * and rely on batch-ordered arrival across batches (the replay
    * contract; a production deployment puts a watermark-sorted stage
    * in front).
    */
  def rateLimit(events: Dataset[Event], capacity: Long,
                refillSecs: Long): Dataset[Passed] = {
    import events.sparkSession.implicits._
    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[Bucket]): Iterator[Passed] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Passed]
      var cur = state.getOption
      it.toSeq.sortBy(e => (e.ep, e.event_id)).foreach { e =>
        val b = cur match {
          case None => Bucket(capacity, e.ep)
          case Some(b0) =>
            val add = (e.ep - b0.anchor) / refillSecs
            if (b0.tokens + add >= capacity) Bucket(capacity, e.ep)
            else Bucket(b0.tokens + add, b0.anchor + add * refillSecs)
        }
        cur = Some(
          if (b.tokens >= 1) {
            out += Passed(userId, e.event_id, e.ep, b.tokens - 1)
            b.copy(tokens = b.tokens - 1)
          } else b)
      }
      cur.foreach(state.update)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }

  /** (event_type, user_id) streaming input for [[hllSketch]]. */
  case class TypeUser(event_type: String, user_id: Long)

  /** Per-type HLL state: monotone max registers + an update counter
    * (the counter only identifies the final snapshot in update-mode
    * sinks; the registers are the sketch). */
  case class HllState(event_type: String, n: Long, regs: Seq[Long])

  /** The replicable 2^40 poly hash + 4 (multiply, xorshift) scramble
    * rounds → (bucket, rank) — digit-for-digit the column chain of
    * `Events.hllErrorAudit` and its oracle CTE. */
  private[graft] def hllBucketRank(uid: Long): (Int, Long) = {
    var h = 0L
    uid.toString.foreach(c => h = (h * 31 + c.toLong) % 1099511627776L)
    for (_ <- 1 to 4) {
      h = (h * 8388593L) % 1099511627776L
      h = h ^ (h >>> 20)
    }
    val suffix = h >>> 4
    val bitlen =
      if (suffix == 0L) 0
      else 64 - java.lang.Long.numberOfLeadingZeros(suffix)
    ((h % 16L).toInt, 37L - bitlen)
  }

  /** Streaming HyperLogLog per event type (`mapGroupsWithState`,
    * update): registers are per-bucket MAX ranks, so the state merge
    * is idempotent, commutative and monotone — duplicates are free
    * (HLL's defining property; no per-key distinct needed upstream)
    * and batch boundaries provably can't change the drained sketch.
    * This is the shape of a production streaming distinct-count:
    * m longs per key, never a user set.
    */
  def hllSketch(events: Dataset[TypeUser]): Dataset[HllState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout) {
        (tpe: String, it: Iterator[TypeUser],
         state: GroupState[HllState]) =>
          val prev = state.getOption
            .getOrElse(HllState(tpe, 0L, Seq.fill(16)(0L)))
          val regs = prev.regs.toArray
          var n = prev.n
          it.foreach { e =>
            val (b, r) = hllBucketRank(e.user_id)
            if (r > regs(b)) regs(b) = r
            n += 1
          }
          val cur = HllState(tpe, n, regs.toIndexedSeq)
          state.update(cur)
          cur
      }
  }

  /** Census row emitted by [[typeCensus]]: a user's running event
    * total and distinct event-type count. */
  case class TypeCensus(user_id: Long, n_events: Long, n_types: Long)

  /** Per-user distinct-event-type census on Spark 4's
    * `transformWithState` (W506) — the arbitrary-stateful-processing
    * v2 API: typed `ValueState`/`MapState` handles over the RocksDB
    * state store, the declared successor of [[runningCounts]]'s
    * mapGroupsWithState (which round-trips the WHOLE state value per
    * key per batch; here the type→count map updates per-entry and
    * only touched entries hit the store). State composition shown on
    * purpose: a MapState (type → count) plus a ValueState (total).
    * Emits the updated census once per (key, micro-batch); batching
    * changes which INTERMEDIATE censuses appear, but each user's
    * final census (its max-n_events row) is batch-invariant and
    * equals the batch `groupBy(user).agg(count, countDistinct)` — the
    * replay contract. Scale: state is per-user and per-(user, type) —
    * keyed, sharded with the shuffle, entries bounded by the type
    * vocabulary.
    */
  class TypeCensusProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TypeUser, TypeCensus] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode,
      TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("type_counts",
        E.STRING, E.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("total", E.scalaLong,
        TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[TypeUser],
        timerValues: TimerValues): Iterator[TypeCensus] = {
      var n = if (total.exists()) total.get() else 0L
      rows.foreach { r =>
        n += 1
        val c = if (counts.containsKey(r.event_type))
          counts.getValue(r.event_type) else 0L
        counts.updateValue(r.event_type, c + 1)
      }
      total.update(n)
      Iterator.single(TypeCensus(key, n, counts.keys().size.toLong))
    }
  }

  /** [[TypeCensusProcessor]] wired over a keyed stream. Requires the
    * RocksDB state store provider (transformWithState's backing
    * store) — the replay harness sets it for the run. */
  def typeCensus(events: Dataset[TypeUser]): Dataset[TypeCensus] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCensusProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update())
  }

  /** One per-user warm-start seed for [[typeCensusWarmStart]]: the
    * batch-computed census a stream resumes FROM. */
  case class CensusSeed(user_id: Long, type_counts: Map[String, Long],
                        total: Long)

  /** [[TypeCensusProcessor]] with BATCH-seeded initial state (W507) —
    * `StatefulProcessorWithInitialState`, the backfill→stream handoff
    * API: a batch job computes per-key state once (here the census of
    * everything already ingested), the streaming query loads it on
    * first run, and live events continue the SAME state — no
    * reprocessing of history through the stream and no cold-start
    * window where counts lie. `handleInitialState` writes each seed
    * into the same MapState/ValueState handles the input path uses,
    * so the drained census over (batch prefix as seed) + (stream
    * suffix as input) is provably the full-corpus census.
    */
  class TypeCensusWarmStartProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessorWithInitialState[
        Long, TypeUser, TypeCensus, CensusSeed] {
    import org.apache.spark.sql.streaming.{MapState, TTLConfig, TimeMode,
      TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var counts: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counts = getHandle.getMapState[String, Long]("type_counts",
        E.STRING, E.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("total", E.scalaLong,
        TTLConfig.NONE)
    }
    override def handleInitialState(key: Long, seed: CensusSeed,
        timerValues: TimerValues): Unit = {
      seed.type_counts.foreach { case (t, c) => counts.updateValue(t, c) }
      total.update(seed.total)
    }
    override def handleInputRows(key: Long, rows: Iterator[TypeUser],
        timerValues: TimerValues): Iterator[TypeCensus] = {
      var n = if (total.exists()) total.get() else 0L
      rows.foreach { r =>
        n += 1
        val c = if (counts.containsKey(r.event_type))
          counts.getValue(r.event_type) else 0L
        counts.updateValue(r.event_type, c + 1)
      }
      total.update(n)
      Iterator.single(TypeCensus(key, n, counts.keys().size.toLong))
    }
  }

  /** [[TypeCensusWarmStartProcessor]] wired over a keyed stream with a
    * batch-computed seed. Same provider requirement as [[typeCensus]].
    */
  def typeCensusWarmStart(events: Dataset[TypeUser],
                          seed: Dataset[CensusSeed]): Dataset[TypeCensus] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TypeCensusWarmStartProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Update(),
        seed.groupByKey(_.user_id))
  }

  /** Typed event for [[funnelHits]] (type + ids; epoch seconds come
    * off the timestamp at emit time). */
  case class TypedEvent(ts: java.sql.Timestamp, user_id: Long,
                        event_id: Long, event_type: String)

  /** One detected pattern completion emitted by [[funnelHits]]. */
  case class FunnelHit(user_id: Long, event_id: Long, ep: Long)

  /** Streaming consecutive-funnel detector on `transformWithState`
    * LIST state (W511) — the remaining v2 state primitive after
    * ValueState/MapState (W506) and timers (W508): a bounded
    * ListState buffer holds each user's last `pattern.length − 1`
    * event types IN ORDER (the one state shape Value/Map can't
    * express without encoding tricks), and an arriving event
    * completing the exact consecutive sequence emits a hit. The
    * ingest-time "user just converted through the funnel" tripwire:
    * O(|pattern|) state per key, each event touched once, append
    * output. Batch twin: a 2-lag window over (ts, event_id) order —
    * the oracle. Like the other replay ops, events sort within a
    * batch and rely on batch-ordered arrival across batches.
    */
  class FunnelProcessor(pattern: Seq[String])
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TypedEvent, FunnelHit] {
    import org.apache.spark.sql.streaming.{ListState, TTLConfig, TimeMode,
      TimerValues}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var tail: ListState[String] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      tail = getHandle.getListState[String]("tail", E.STRING,
        TTLConfig.NONE)
    override def handleInputRows(key: Long, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[FunnelHit] = {
      val keep = pattern.length - 1
      var buf = if (tail.exists()) tail.get().toVector
        else Vector.empty[String]
      val out = scala.collection.mutable.ArrayBuffer.empty[FunnelHit]
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        if (buf.length == keep && buf :+ e.event_type == pattern)
          out += FunnelHit(key, e.event_id, e.ts.getTime / 1000)
        buf = (buf :+ e.event_type).takeRight(keep)
      }
      tail.put(buf.toArray)
      out.iterator
    }
  }

  /** [[FunnelProcessor]] wired over a keyed stream. Same provider
    * requirement as [[typeCensus]]. */
  def funnelHits(events: Dataset[TypedEvent],
                 pattern: Seq[String] = Seq("view", "click", "purchase"))
      : Dataset[FunnelHit] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(pattern),
        org.apache.spark.sql.streaming.TimeMode.None(),
        OutputMode.Append())
  }

  /** Gap sessionization on `transformWithState` EVENT-TIME TIMERS
    * (W508) — the third leg of the v2 API after state vars (W506) and
    * initial state (W507), and THE feature FMGS timeouts can't match:
    * timers are explicit per-key alarms (register/delete by expiry
    * time, several may coexist), where `GroupStateTimeout` allows only
    * one implicit deadline overwritten on every state update. A
    * session's close alarm is registered at (last + gap); an
    * extending event DELETES the stale alarm and arms the new one; the
    * alarm firing (watermark passing it) emits the session from
    * [[StreamOps.Session]]-shaped state and clears it — no tombstone
    * machinery, unlike [[sessionizeEventTime]]'s closed-flag dance,
    * because a cleared key with a deleted timer simply has no state.
    * A persistent seq counter (second ValueState) numbers a user's
    * sessions across closes. Same session semantics as the FMGS
    * variants: batch-sorted arrival, gap strictly > `gapSeconds`
    * starts a new session.
    */
  class TimerSessionProcessor(gapSeconds: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, TEvent, Session] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TTLConfig,
      TimeMode, TimerValues, ValueState}
    import org.apache.spark.sql.{Encoders => E}
    @transient private var sess: ValueState[OpenSession] = _
    @transient private var seqCtr: ValueState[Long] = _
    private def expiryMs(s: OpenSession): Long =
      (s.last + gapSeconds) * 1000L
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      sess = getHandle.getValueState[OpenSession]("sess",
        E.product[OpenSession], TTLConfig.NONE)
      seqCtr = getHandle.getValueState[Long]("seq_ctr", E.scalaLong,
        TTLConfig.NONE)
    }
    override def handleInputRows(key: Long, rows: Iterator[TEvent],
        timerValues: TimerValues): Iterator[Session] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Session]
      var cur = if (sess.exists()) Some(sess.get()) else None
      def nextSeq(): Long = {
        val n = (if (seqCtr.exists()) seqCtr.get() else 0L) + 1L
        seqCtr.update(n)
        n
      }
      rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
        val ep = e.ts.getTime / 1000
        cur match {
          case Some(s) if ep - s.last <= gapSeconds =>
            getHandle.deleteTimer(expiryMs(s))
            cur = Some(s.copy(last = ep, nEv = s.nEv + 1,
              total = s.total + e.value))
          case Some(s) =>
            // gap exceeded by a LATER event before the alarm fired:
            // the prior session closes here, its stale alarm dies
            out += Session(key, s.seq, s.nEv, s.start, s.last, s.total)
            getHandle.deleteTimer(expiryMs(s))
            cur = Some(OpenSession(nextSeq(), ep, ep, 1, e.value))
          case None =>
            cur = Some(OpenSession(nextSeq(), ep, ep, 1, e.value))
        }
      }
      cur.foreach { s =>
        sess.update(s)
        getHandle.registerTimer(expiryMs(s))
      }
      out.iterator
    }
    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      if (sess.exists()) {
        val s = sess.get()
        // only the CURRENT session's alarm closes it — a stale timer
        // (deleted-but-raced) must not emit a live session early
        if (expiredTimerInfo.getExpiryTimeInMs() == expiryMs(s)) {
          sess.clear()
          Iterator.single(Session(key, s.seq, s.nEv, s.start, s.last,
            s.total))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** [[TimerSessionProcessor]] wired over a watermarked keyed stream
    * (TimeMode.EventTime — timers fire when the watermark passes
    * their expiry). Same provider requirement as [[typeCensus]]. */
  def timerSessions(events: Dataset[TEvent], gapSeconds: Long,
                    watermarkDelay: String = "1 second")
      : Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new TimerSessionProcessor(gapSeconds),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        OutputMode.Append())
  }

  /** Running per-user moments on the 1e-3 value grid (all LONG-safe:
    * vi ≤ ~1e6, Σvi² ≤ ~1e15 at fixture value ranges). */
  case class Mom(n: Long, sv: Long, sv2: Long)

  /** Flagged anomaly emitted by [[anomalyFlag]]. */
  case class Flagged(user_id: Long, event_id: Long, ep: Long,
                     value: Double)

  /** Per-user streaming z-score anomaly flagger
    * (`flatMapGroupsWithState`, append): an event is flagged iff the
    * user's RUNNING state — built from strictly-preceding events only —
    * has n ≥ `minN` and the event deviates more than `z`·σ from the
    * running mean. The ingest-time data-quality tripwire: it sees each
    * event exactly once, keeps O(1) state per key, and never looks
    * ahead.
    *
    * State is exact integers on the 1e-3 value grid (n, Σv, Σv²) and
    * the flag decision is the cross-multiplied integer test
    * `(vi·n − sv)²·(n−1) > z²·n·(n·sv2 − sv²)` evaluated in BigInt
    * (HUGEINT in the oracle) — no division or floating point ever
    * decides a flag, so the drained stream equals the batch
    * preceding-rows-window restatement bit-exactly. Zero running
    * variance flags ANY deviation from the constant history (the
    * strict inequality's natural reading). Like [[rateLimit]], events
    * sort (ep, event_id) within a batch and rely on batch-ordered
    * arrival across batches (the replay contract).
    */
  def anomalyFlag(events: Dataset[Event], minN: Long = 5,
                  z: Long = 3): Dataset[Flagged] = {
    import events.sparkSession.implicits._
    def fold(userId: Long, it: Iterator[Event],
             state: GroupState[Mom]): Iterator[Flagged] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Flagged]
      var cur = state.getOption.getOrElse(Mom(0L, 0L, 0L))
      it.toSeq.sortBy(e => (e.ep, e.event_id)).foreach { e =>
        val vi = math.floor(e.value * 1000 + 0.5).toLong
        if (cur.n >= minN) {
          val dev = BigInt(vi) * cur.n - cur.sv
          val lhs = dev * dev * (cur.n - 1)
          val rhs = BigInt(z * z) * cur.n *
            (BigInt(cur.n) * cur.sv2 - BigInt(cur.sv) * cur.sv)
          if (lhs > rhs) out += Flagged(userId, e.event_id, e.ep, e.value)
        }
        cur = Mom(cur.n + 1, cur.sv + vi, cur.sv2 + vi * vi)
      }
      state.update(cur)
      out.iterator
    }
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fold)
  }
}
