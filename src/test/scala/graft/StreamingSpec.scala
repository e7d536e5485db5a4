package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.{StreamOps, StreamReplay}
import graft.streaming.StreamOps.{Event, Session}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("windowedAgg over a memory stream matches batch totals") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.windowedAgg(df, "1 hour", "10 minutes")
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out").start()
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    in.addData(
      (ts(0), "click", 1.0), (ts(10), "click", 2.0),
      (ts(70), "click", 4.0), (ts(5), "view", 8.0))
    q.processAllAvailable()
    val got = spark.table("win_out")
      .select(col("event_type"), col("cnt"), col("sum_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    assert(got == Set(("click", 2L, 3.0), ("click", 1L, 4.0), ("view", 1L, 8.0)))
  }

  test("streaming sessionize closes a session when the gap passes") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.sessionize(in.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()
    in.addData(Event(1L, 1L, 1000L, 1.0), Event(1L, 2L, 1600L, 2.0))
    q.processAllAvailable()
    // second batch: 2h later -> closes the first session
    in.addData(Event(1L, 3L, 9000L, 4.0))
    q.processAllAvailable()
    val got = spark.table("sess_out").as[Session].collect()
    q.stop()
    assert(got.length == 1)
    assert(got(0) == Session(1L, 1L, 2L, 1000L, 1600L, 3.0))
  }

  test("streamStreamJoin matches lefts in the preceding window only") {
    implicit val ctx = spark.sqlContext
    val lin = MemoryStream[(Timestamp, Long, Long)]
    val rin = MemoryStream[(Timestamp, Long, Long)]
    val l = lin.toDF().toDF("ts", "user_id", "event_id")
    val r = rin.toDF().toDF("ts", "user_id", "event_id")
    val q = StreamOps.streamStreamJoin(l, r, windowSecs = 600)
      .writeStream.outputMode("append")
      .format("memory").queryName("ssj_out").start()
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    lin.addData((ts(0), 1L, 100L), (ts(30), 1L, 101L), (ts(0), 2L, 102L))
    rin.addData((ts(5), 1L, 200L))   // joins 100 (5 min before), not 101
    q.processAllAvailable()
    val got = spark.table("ssj_out")
      .select("l_event_id", "r_event_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    q.stop()
    assert(got == Set((100L, 200L)))
  }

  test("dedupStream drops in-watermark duplicates") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val df = in.toDF().toDF("ts", "doc_key")
    val q = StreamOps.dedupStream(df, Seq("doc_key"), "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    in.addData((ts(0), "a"), (ts(0), "a"), (ts(0), "b"), (ts(1), "c"))
    q.processAllAvailable()
    // same key at a LATER ts inside the watermark is still a duplicate
    in.addData((ts(2), "a"), (ts(2), "d"))
    q.processAllAvailable()
    val got = spark.table("dedup_out").select("doc_key")
      .collect().map(_.getString(0)).sorted.toSeq
    q.stop()
    assert(got == Seq("a", "b", "c", "d"))
  }

  test("enrichStream broadcast-joins the static dimension per batch") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val q = StreamOps.enrichStream(
        in.toDF().toDF("user_id", "value"), dim, "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    in.addData((1L, 10.0), (2L, 20.0), (3L, 30.0))
    q.processAllAvailable()
    val got = spark.table("enrich_out")
      .collect().map(r => (r.getLong(0), Option(r.getString(2)))).toSet
    q.stop()
    // left join: unknown user 3 survives with a null tier
    assert(got == Set((1L, Some("gold")), (2L, Some("basic")), (3L, None)))
  }

  test("windowedAgg streams to a parquet file sink with a checkpoint") {
    implicit val ctx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("ssink").toString
    val in = MemoryStream[(Timestamp, String, Double)]
    val df = in.toDF().toDF("ts", "event_type", "value")
    // file sinks are append-only: watermark-closed windows only
    val q = StreamOps.windowedAgg(df, "1 hour", "10 minutes")
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$out/_chk")
      .format("parquet").start(s"$out/data")
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)
    in.addData((ts(0), "click", 1.0), (ts(10), "click", 2.0))
    q.processAllAvailable()
    // advance the watermark far enough to close the first hour window
    in.addData((ts(200), "view", 4.0))
    q.processAllAvailable()
    q.stop()
    val got = spark.read.parquet(s"$out/data")
      .selectExpr("event_type", "cnt", "sum_value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq(("click", 2L, 3.0)))
  }

  test("runningCounts carries per-user state across micro-batches") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[Event]
    val q = StreamOps.runningCounts(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("run_out").start()
    in.addData(Event(1L, 1L, 10L, 1.0), Event(1L, 2L, 20L, 2.0), Event(2L, 3L, 10L, 5.0))
    q.processAllAvailable()
    in.addData(Event(1L, 4L, 30L, 4.0))
    q.processAllAvailable()
    val got = spark.table("run_out")
      .groupBy("user_id")
      .agg(max("n_events").as("n"), max("sum_value").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    q.stop()
    // user 1's second batch folds ON TOP of batch-1 state: 3 events, 7.0
    assert(got == Set((1L, 3L, 7.0), (2L, 1L, 5.0)))
  }

  test("sessionizeEventTime: watermark timeout closes a silent user's session") {
    implicit val ctx = spark.sqlContext
    import StreamOps.TEvent
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val in = MemoryStream[TEvent]
    val q = StreamOps.sessionizeEventTime(in.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("tmo_out").start()
    // user 1 goes silent after two events; user 2 keeps the stream
    // alive and drives the watermark past user 1's last + gap
    in.addData(TEvent(ts(1000), 1L, 1L, 1.0), TEvent(ts(1600), 1L, 2L, 2.0))
    q.processAllAvailable()
    in.addData(TEvent(ts(9000), 2L, 3L, 4.0))
    q.processAllAvailable()
    in.addData(TEvent(ts(50000), 2L, 4L, 1.0))
    q.processAllAvailable()
    val got = spark.table("tmo_out").as[Session].collect()
    q.stop()
    // user 1's session closed by TIMEOUT (no successor event existed);
    // user 2's first session closed by its own later event's gap
    assert(got.toSet == Set(
      Session(1L, 1L, 2L, 1000L, 1600L, 3.0),
      Session(2L, 1L, 1L, 9000L, 9000L, 4.0)))
  }

  test("sessionizeEventTime: seq numbering survives a timeout tombstone") {
    implicit val ctx = spark.sqlContext
    import StreamOps.TEvent
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val in = MemoryStream[TEvent]
    val q = StreamOps.sessionizeEventTime(in.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("tmo_out2").start()
    in.addData(TEvent(ts(1000), 1L, 1L, 1.0))
    q.processAllAvailable()
    // another user's event fires user 1's timeout (watermark passes)
    in.addData(TEvent(ts(10000), 2L, 2L, 1.0))
    q.processAllAvailable()
    // user 1 returns AFTER the timeout: must be session_seq 2, not 1
    in.addData(TEvent(ts(20000), 1L, 3L, 5.0))
    q.processAllAvailable()
    in.addData(TEvent(ts(90000), 2L, 4L, 1.0))
    q.processAllAvailable()
    val got = spark.table("tmo_out2").as[Session].collect()
      .filter(_.user_id == 1L).sortBy(_.session_seq)
    q.stop()
    assert(got.map(_.session_seq).toSeq == Seq(1L, 2L),
      s"timeout tombstone must preserve numbering: $got")
  }

  test("cdcLatest keeps the higher version when updates arrive late") {
    implicit val ctx = spark.sqlContext
    import StreamOps.CdcRow
    val in = MemoryStream[CdcRow]
    val q = StreamOps.cdcLatest(in.toDS())
      .writeStream.outputMode("update")
      .format("memory").queryName("cdc_out").start()
    in.addData(CdcRow(1L, "click", 10L, 500L, 1.0))
    q.processAllAvailable()
    // a LOWER-version update arrives in a later batch: state must not
    // regress; a same-ep higher-event_id row must win the tiebreak
    in.addData(CdcRow(1L, "click", 5L, 400L, 9.0),
      CdcRow(1L, "click", 11L, 500L, 2.0))
    q.processAllAvailable()
    val fin = spark.table("cdc_out").as[CdcRow].collect()
      .maxBy(r => (r.ep, r.event_id))
    q.stop()
    assert(fin == CdcRow(1L, "click", 11L, 500L, 2.0),
      s"late lower-version update regressed the snapshot: $fin")
  }

  test("rateLimit: token bucket passes/refills exactly, across batches") {
    implicit val ctx = spark.sqlContext
    import StreamOps.{Event, Passed}
    val in = MemoryStream[Event]
    // capacity 2, refill one token / 21600 s of event time
    val q = StreamOps.rateLimit(in.toDS(), 2L, 21600L)
      .writeStream.outputMode("append")
      .format("memory").queryName("rl_out").start()
    // batch 1: burst of three — third must drop
    in.addData(Event(1L, 1L, 0L, 1.0), Event(1L, 2L, 10L, 1.0),
      Event(1L, 3L, 20L, 1.0))
    q.processAllAvailable()
    // batch 2 (state carried across the boundary): one refill at
    // 21620, immediate next drops, another refill at 43300 passes
    in.addData(Event(1L, 4L, 21620L, 1.0), Event(1L, 5L, 21630L, 1.0),
      Event(1L, 6L, 43300L, 1.0))
    q.processAllAvailable()
    val got = spark.table("rl_out").as[Passed].collect()
      .sortBy(_.event_id)
    q.stop()
    assert(got.map(p => (p.event_id, p.tokens_left)).toSeq ==
      Seq((1L, 1L), (2L, 0L), (4L, 0L), (6L, 0L)), got.toSeq)
  }

  test("sessionWindowNative: the >= gap boundary splits; < gap merges") {
    implicit val ctx = spark.sqlContext
    import java.sql.Timestamp
    val in = MemoryStream[StreamReplay.REvent]
    def ev(id: Long, sec: Long) = StreamReplay.REvent(
      new Timestamp(1704067200000L + sec * 1000), id, 7L, "view", 1.0)
    val q = StreamOps.sessionWindowNative(in.toDF())
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("start_us"),
        col("n_events"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sw_out").start()
    // events at t=0 and t=1799 merge; an exactly-1800s gap would
    // still merge (touching windows), so the third event sits 1801 s
    // after the second → a NEW session; a far sentinel closes both
    in.addData(ev(1, 0), ev(2, 1799), ev(3, 3600))
    q.processAllAvailable()
    in.addData(StreamReplay.REvent(
      new Timestamp(1704067200000L + 86400L * 1000), -1L, -1L,
      "__flush__", 0.0))
    q.processAllAvailable()
    val got = spark.table("sw_out")
      .filter(col("user_id") === 7L).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    q.stop()
    spark.catalog.dropTempView("sw_out")
    assert(got.toSeq == Seq(
      (1704067200000000L, 2L),
      (1704067200000000L + 3600L * 1000000, 1L)), got.toSeq)
  }

  test("typeCensus (transformWithState): state carries across batches " +
      "and the final census is batch-invariant") {
    import graft.streaming.{StreamOps, StreamReplay}
    // the replay at different batch counts must converge to the same
    // final per-user census, which equals the batch groupBy
    val want = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val one = StreamReplay.typeCensusReplay(spark, sf, nBatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    val four = StreamReplay.typeCensusReplay(spark, sf, nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(one.toSeq == want.toSeq)
    assert(four.toSeq == want.toSeq)
  }

  test("typeCensusWarmStart: seeded state continues, not restarts") {
    import graft.streaming.StreamOps
    implicit val ctx = spark.sqlContext
    import spark.implicits._
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider")
    try {
      // user 1 seeded with {view: 2} total 2 then streams a purchase
      // (census must CONTINUE: 3 events, 2 types); user 2 exists only
      // in the seed and must not emit (no input rows)
      val seed = Seq(
        StreamOps.CensusSeed(1L, Map("view" -> 2L), 2L),
        StreamOps.CensusSeed(2L, Map("click" -> 5L), 5L)).toDS()
      val in = MemoryStream[StreamOps.TypeUser]
      val q = StreamOps.typeCensusWarmStart(in.toDS(), seed)
        .writeStream.outputMode("update").format("memory")
        .queryName("tws_warm").start()
      in.addData(StreamOps.TypeUser("purchase", 1L))
      q.processAllAvailable()
      val got = spark.table("tws_warm").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      q.stop()
      spark.catalog.dropTempView("tws_warm")
      assert(got.toSeq == Seq((1L, 3L, 2L)), got.toSeq)
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("timerSessions: alarm fires on silence, extension re-arms it, " +
      "seq persists across timer closes") {
    import graft.streaming.StreamOps
    implicit val ctx = spark.sqlContext
    import java.sql.Timestamp
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider")
    try {
      val base = 1704067200000L
      def ev(sec: Long, id: Long, uid: Long = 5L) = StreamOps.TEvent(
        new Timestamp(base + sec * 1000), uid, id, 1.0)
      val in = MemoryStream[StreamOps.TEvent]
      val q = StreamOps.timerSessions(in.toDS(), gapSeconds = 1800)
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_timer").start()
      // two events 100 s apart: the second must DELETE the first's
      // alarm and re-arm at its own (last + gap)
      in.addData(ev(0, 1), ev(100, 2))
      q.processAllAvailable()
      // sentinel drives the watermark past 100+1800 → alarm fires,
      // session 1 (2 events) emits via handleExpiredTimer
      in.addData(ev(5000, 90, uid = -1L))
      q.processAllAvailable()
      // a fresh event starts session TWO — the seq counter must have
      // survived the timer close
      in.addData(ev(10000, 3))
      q.processAllAvailable()
      in.addData(ev(20000, 91, uid = -1L))
      q.processAllAvailable()
      val got = spark.table("tws_timer")
        .filter(col("user_id") === 5L).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .sortBy(_._1)
      q.stop()
      spark.catalog.dropTempView("tws_timer")
      val t0 = base / 1000
      assert(got.toSeq == Seq(
        (1L, 2L, t0, t0 + 100),
        (2L, 1L, t0 + 10000, t0 + 10000)), got.toSeq)
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("funnelHits (ListState): tail buffer survives a batch boundary") {
    import graft.streaming.StreamOps
    implicit val ctx = spark.sqlContext
    import java.sql.Timestamp
    val prevProv = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider")
    try {
      val base = 1704067200000L
      def ev(sec: Long, id: Long, tpe: String) = StreamOps.TypedEvent(
        new Timestamp(base + sec * 1000), 9L, id, tpe)
      val in = MemoryStream[StreamOps.TypedEvent]
      val q = StreamOps.funnelHits(in.toDS())
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_funnel").start()
      // the (view, click) prefix lands in batch 1; the completing
      // purchase arrives in batch 2 — the ListState tail must carry
      in.addData(ev(0, 1, "view"), ev(10, 2, "click"))
      q.processAllAvailable()
      in.addData(ev(20, 3, "purchase"), ev(30, 4, "view"),
        ev(40, 5, "purchase")) // view→purchase is NOT a triple
      q.processAllAvailable()
      val got = spark.table("tws_funnel").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      q.stop()
      spark.catalog.dropTempView("tws_funnel")
      assert(got.toSeq == Seq((9L, 3L, base / 1000 + 20)), got.toSeq)
    } finally {
      prevProv match {
        case Some(v) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("funnelReplay: hit set is batch-invariant and equals the batch " +
      "2-lag window") {
    import graft.streaming.StreamReplay
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val want = Tables.events(spark, sf)
      .select(col("user_id"), col("event_id"),
        expr("unix_timestamp(ts)").as("ep"), col("event_type"),
        lag(col("event_type"), 2).over(w).as("t2"),
        lag(col("event_type"), 1).over(w).as("t1"))
      .filter(col("t2") === "view" && col("t1") === "click" &&
        col("event_type") === "purchase")
      .select("user_id", "event_id", "ep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val one = StreamReplay.funnelReplay(spark, sf, nBatches = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    val five = StreamReplay.funnelReplay(spark, sf, nBatches = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(one.toSeq == want.toSeq)
    assert(five.toSeq == want.toSeq)
  }

  test("typeCensusWarmReplay: seed half + stream half = full census") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val got = StreamReplay.typeCensusWarmReplay(spark, sf, nBatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == want.toSeq)
  }

  test("foreachBatchReplay: double-committed batches stay exactly-once " +
      "and batch-invariant") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val one = StreamReplay.foreachBatchReplay(spark, sf, nBatches = 1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    val five = StreamReplay.foreachBatchReplay(spark, sf, nBatches = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(one.toSeq == want.toSeq)
    assert(five.toSeq == want.toSeq)
  }

  test("changelogRestartReplay: a cold mid-stream restart under " +
      "changelog checkpointing loses no state") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // 4 batches → restart after 2: half the census arrives before the
    // cold stop, so a state reload that dropped ANY key would misreport
    // that key's n_events and fail the exact compare
    val got = StreamReplay.changelogRestartReplay(spark, sf, nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == want.toSeq)
  }

  test("stateSourceAudit: statestore batch read equals the half-prefix " +
      "batch aggregate") {
    import graft.streaming.StreamReplay
    val evs = Tables.events(spark, sf)
      .select(col("user_id"), col("value"))
      .orderBy("ts", "event_id")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val half = math.min(
      2 * math.max(1, math.ceil(evs.length / 4.0).toInt), evs.length)
    val want = evs.take(half).groupBy(_._1).map { case (uid, xs) =>
      // same fold order as the stream: (ts, event_id) arrival sequence
      (uid, xs.length.toLong,
        math.round(xs.foldLeft(0.0)(_ + _._2) * 1e4) / 1e4)
    }.toSeq.sorted
    val got = StreamReplay.stateSourceAudit(spark, sf, nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sorted
    assert(got.toSeq == want.toSeq)
  }

  test("outerJoinReplay: inner pairs equal the batch join and every " +
      "unmatched click flushes with the -1 sentinel") {
    import graft.streaming.StreamReplay
    val c = Tables.events(spark, sf).filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("l_event_id"),
        col("ts").as("l_ts"))
    val p = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"),
        col("event_id").as("r_event_id"), col("ts").as("r_ts"))
    val want = c.join(p,
        col("user_id") === col("p_user_id") &&
          col("l_ts") >= col("r_ts") - expr("INTERVAL 3600 SECONDS") &&
          col("l_ts") <= col("r_ts"), "left_outer")
      .select(col("user_id"), col("l_event_id"),
        coalesce(col("r_event_id"), lit(-1L)).as("r_event_id"),
        unix_timestamp(col("l_ts")).as("l_ep"),
        coalesce(unix_timestamp(col("r_ts")), lit(-1L)).as("r_ep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted
    val got = StreamReplay.outerJoinReplay(spark, sf, nBatches = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted
    assert(got.toSeq == want.toSeq)
    assert(got.exists(_._3 == -1L), "no outer rows surfaced — the " +
      "flush sentinel did not advance the watermark")
  }

  test("dedupWithinWatermarkReplay: re-delivered tails and in-batch " +
      "dups collapse to exactly-once") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ep"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sorted
    val got = StreamReplay.dedupWithinWatermarkReplay(spark, sf,
        nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("stateMetadataAudit: the checkpoint registry surfaces the one " +
      "FMGS operator with its batch span") {
    import graft.streaming.StreamReplay
    val got = StreamReplay.stateMetadataAudit(spark, sf).collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getLong(0) == 0L && r.getString(1) == "flatMapGroupsWithState"
      && r.getString(2) == "default" && r.getInt(3) == 4 &&
      r.getLong(4) == 0L && r.getLong(5) == 1L, r.toString)
  }

  test("xmlRoundtrip: the to_xml/from_xml hop preserves the typed " +
      "aggregates bit-exactly") {
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"),
        sum(col("user_id")).as("uid_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    val got = graft.operators.VariantOps.xmlRoundtrip(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("availableNowReplay: file-source backfill census is " +
      "split-invariant and equals the batch aggregate") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    val got = StreamReplay.availableNowReplay(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == want.toSeq)
  }

  test("namedParamsSql: :m/:r binding equals the literal-inlined SQL") {
    val want = Tables.events(spark, sf)
      .filter(pmod(col("user_id"), lit(7)) === 3)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    val got = graft.operators.Relational.namedParamsSql(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == want.toSeq && got.nonEmpty)
  }

  test("variantRoundtrip: variant_get recovers the typed aggregates " +
      "bit-exactly and the missing path stays null") {
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"),
        sum(col("user_id")).as("uid_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), 0L)).sorted
    val got = graft.operators.VariantOps.variantRoundtrip(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).sorted
    assert(got.toSeq == want.toSeq)
  }

  test("unionReplay: two alternating feeds census to the single-source " +
      "aggregate") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    val got = StreamReplay.unionReplay(spark, sf, nBatches = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == want.toSeq)
  }

  test("observeStreamReplay: folded per-batch observed metrics equal " +
      "the batch totals") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .agg(count(lit(1)).as("rows_total"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("cents_total"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    val got = StreamReplay.observeStreamReplay(spark, sf, nBatches = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(got == want)
  }

  test("concurrentReplay: two ProcessingTime-clocked queries running " +
      "at once census to the single-source aggregate") {
    import graft.streaming.StreamReplay
    val want = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    val got = StreamReplay.concurrentReplay(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted
    assert(got.toSeq == want.toSeq)
  }

  test("csvRoundtrip and orcRoundtrip: serde hops preserve the typed " +
      "aggregates bit-exactly") {
    val base = Tables.events(spark, sf)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(floor(col("value") * 100 + lit(0.5)).cast("long"))
          .as("v_cents"),
        sum(col("user_id")).as("uid_sum"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    val csv = graft.operators.VariantOps.csvRoundtrip(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sorted.toSeq
    assert(csv == base)
    val orc = graft.operators.VariantOps.orcRoundtrip(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sorted.toSeq
    assert(orc == base.map(t => (t._1, t._2, t._3)))
  }
}
