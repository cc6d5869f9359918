package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** stream_exec_tumbling's core claim — the drained streaming result
  * equals the batch GROUP BY regardless of micro-batch boundaries —
  * proven here by FORCING many tiny micro-batches (far smaller than
  * the operator's production trigger) and comparing against the
  * one-shot batch aggregate over the same topic. */
class StreamExecParitySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("forced multi-batch streaming drain equals the batch aggregate") {
    val root = Files.createTempDirectory("graft-sx").toString
    val log = TopicLog.create(spark, root, "t", 2)
    def ts(hour: Int, i: Int) =
      new java.sql.Timestamp(1700000000000L + hour * 3600000L + i * 1000L)
    // 40 records across 3 hours and 2 types
    val rows = for (i <- 0 until 40) yield
      (s"k$i", s"v$i", ts(i % 3, i), i % 2, if (i % 4 == 0) "a" else "b")
    val df = rows.toDF("k", "v", "ts", "partition", "etype")
      .select(col("k").cast("binary").as("key"),
        col("v").cast("binary").as("value"),
        map(lit("event_type"), col("etype").cast("binary")).as("headers"),
        col("ts"), col("partition").cast("int").as("partition"))
    log.produce(df, partitioner = col("partition"))

    val name = "sx_parity"
    val q = spark.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 7L) // forces ≥6 micro-batches
      .load(s"$root/t")
      .select(col("ts"),
        element_at(col("headers"), "event_type").cast("string").as("etype"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("etype"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName(name)
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sx-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "the drain must actually have crossed micro-batch boundaries")

    val streamed = spark.table(name)
      .select(col("w.start").as("ws"), col("etype"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    val batch = log.read()
      .select(col("ts"),
        element_at(col("headers"), "event_type").cast("string").as("etype"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("etype"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("etype"), col("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      .toSet
    assert(streamed === batch)
    assert(batch.size === 6, "3 hours x 2 types")
  }

  /** stream_exec_join_watermarked's two claims, on planted data with
    * forced tiny micro-batches: (1) the drained watermarked interval
    * join equals the batch interval join (the watermark admits every
    * row — arrival is event-time-ordered, so nothing is ever late);
    * (2) state EVICTION actually happens — the final batch's join
    * state holds a small tail of the stream, not everything fed
    * (the bounded-state property that makes the form production-safe
    * on an unbounded stream). */
  test("watermarked interval join: batch parity AND state eviction") {
    val root = Files.createTempDirectory("graft-sxw").toString
    val log = TopicLog.create(spark, root, "t", 2)
    // 240 records over 10 days of event time, ts-ordered per
    // partition; view i and purchase i share k = i % 5 and sit 5
    // minutes apart — every match is within the 10-minute interval,
    // and a 1-hour watermark delay evicts state days behind the
    // frontier during the drain.
    def ts(i: Int, off: Long) =
      new java.sql.Timestamp(1700000000000L + i * 3600000L + off)
    val rows = (0 until 120).flatMap { i =>
      Seq((s"${2 * i}", "view", i % 5, ts(i, 0), i % 2),
        (s"${2 * i + 1}", "purchase", i % 5, ts(i, 300000L), i % 2))
    }
    val df = rows.toDF("id", "etype", "k", "ts", "partition")
      .select(col("id").cast("binary").as("key"),
        to_json(struct(col("k"))).cast("binary").as("value"),
        map(lit("event_type"), col("etype").cast("binary")).as("headers"),
        col("ts"), col("partition").cast("int").as("partition"))
    log.produce(df, partitioner = col("partition"))

    def side(stream: org.apache.spark.sql.DataFrame, t: String, a: String) =
      stream
        .filter(element_at(col("headers"), "event_type").cast("string") === t)
        .select(col("key").cast("string").cast("long").as(s"${a}_id"),
          col("ts").as(s"${a}_ts"),
          get_json_object(col("value").cast("string"), "$.k").cast("long")
            .as(s"${a}_k"))
    val stream = spark.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 24L) // forces ≥10 micro-batches
      .load(s"$root/t")
    val name = "sxw_parity"
    val q = side(stream, "view", "v").withWatermark("v_ts", "1 hour")
      .join(side(stream, "purchase", "p").withWatermark("p_ts", "1 hour"),
        col("v_k") === col("p_k") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sxw-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "the drain must actually have crossed micro-batch boundaries")

    val streamed = spark.table(name)
      .select("v_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batchSide = log.read()
    val bv = side(batchSide, "view", "v")
    val bp = side(batchSide, "purchase", "p")
    val batch = bv.join(bp,
        col("v_k") === col("p_k") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"))
      .select("v_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch, "watermark must not have dropped a match")
    assert(batch.size === 120, "each view matches exactly its paired purchase")

    // eviction: the final micro-batch's join state must hold only the
    // watermark tail (~1 h + interval of a 10-day stream), not the
    // 240 rows fed — without eviction numRowsTotal would be ~240
    val lastState = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).get.stateOperators
      .map(_.numRowsTotal).sum
    assert(lastState < 60,
      s"join state must be a small tail of the stream, was $lastState")
    assert(q.recentProgress.flatMap(_.stateOperators)
        .exists(_.numRowsRemoved > 0),
      "the watermark must actually have evicted state rows")
  }

  /** stream_exec_custom_state's claim — the flatMapGroupsWithState
    * fold emits the same chunks whatever the micro-batch boundaries —
    * proven by forcing tiny batches that SPLIT chunks mid-fill: 3
    * users × 17 events (3 full chunks + a 2-event tail each) drained
    * 7 records/trigger, so nearly every chunk spans a boundary and
    * the carried ChunkState is what completes it. The trailing
    * partial chunk must be withheld. */
  test("custom keyed state: chunks survive micro-batch boundaries") {
    import graft.operators.{ChunkEvent, Streams}
    val root = Files.createTempDirectory("graft-sxc").toString
    val log = TopicLog.create(spark, root, "t", 2)
    // per (partition, user) the offsets are ts-ordered — the arrival
    // premise of the production topic, reproduced on planted data
    val rows = for (u <- 0 until 3; i <- 0 until 17) yield
      (u * 100L + i, u.toLong, // event_id, user_id
        new java.sql.Timestamp(1700000000000L + i * 60000L + u * 7L),
        i + 1L, u % 2) // k, partition
    val df = rows.toDF("event_id", "user_id", "ts", "k", "partition")
      .select(col("event_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("k"))).cast("binary").as("value"),
        map(lit("user_id"), col("user_id").cast("string").cast("binary"))
          .as("headers"),
        col("ts"), col("partition").cast("int").as("partition"))
    log.produce(df, partitioner = col("partition"))

    def typed(d: org.apache.spark.sql.DataFrame) = d.select(
        element_at(col("headers"), "user_id").cast("string").cast("long")
          .as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("key").cast("string").cast("long").as("event_id"),
        get_json_object(col("value").cast("string"), "$.k").cast("long")
          .as("k"))
      .as[ChunkEvent]
    val name = "sxc_parity"
    val q = typed(spark.readStream.format("graft-topic")
        .option("maxOffsetsPerTrigger", 7L) // splits chunks mid-fill
        .load(s"$root/t"))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        org.apache.spark.sql.streaming.OutputMode.Append,
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)(
        Streams.chunkFold)
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sxc-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "the drain must actually have crossed micro-batch boundaries")

    val streamed = spark.table(name)
      .select("user_id", "chunk_idx", "n_events", "start_us", "end_us",
        "sum_k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // batch formulation: rank per user, chunk = rank DIV cap, full
    // chunks only — 3 per user; k = i+1 so chunk sums are exact
    val batch = (for (u <- 0 until 3; c <- 0 until 3) yield {
      val ks = (c * 5 until c * 5 + 5).map(_ + 1L)
      (u.toLong, c.toLong, 5L,
        1700000000000000L + (c * 5) * 60000000L + u * 7000L,
        1700000000000000L + (c * 5 + 4) * 60000000L + u * 7000L,
        ks.sum)
    }).toSet
    assert(streamed === batch,
      "drained chunks must equal the batch formulation; the 2-event tail is withheld")
  }

  /** stream_exec_tws_gaps' claim — the transformWithState (state API
    * v2) gap fold emits the same rows whatever the micro-batch
    * boundaries: 2 users × 12 events with gaps alternating 1 h / 7 h,
    * drained 5 records/trigger so most gap pairs SPAN a boundary and
    * the carried ValueState is what detects them. RocksDB provider
    * scoped to an isolated session (the v2 API requires it). */
  test("transformWithState: gap detection survives micro-batch boundaries") {
    import graft.operators.{ChunkEvent, GapProcessor, GapRow}
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val root = Files.createTempDirectory("graft-tws").toString
    val log = TopicLog.create(ss, root, "t", 2)
    // per user: events at +0, +1h, +8h, +9h, +16h, ... (odd steps 1 h,
    // even steps 7 h) → gaps > 6 h at every even step: 5 per user
    val rows = for (u <- 0 until 2; i <- 0 until 12) yield {
      val ts = (0 until i).map(s => if (s % 2 == 0) 3600000L else 25200000L).sum
      (u * 100L + i, u.toLong,
        new java.sql.Timestamp(1700000000000L + ts + u * 7L), i + 1L, u)
    }
    val df = rows.toDF("event_id", "user_id", "ts", "k", "partition")
      .select(col("event_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("k"))).cast("binary").as("value"),
        map(lit("user_id"), col("user_id").cast("string").cast("binary"))
          .as("headers"),
        col("ts"), col("partition").cast("int").as("partition"))
    log.produce(df, partitioner = col("partition"))

    val name = "tws_parity"
    val q = ss.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 5L) // splits gap pairs mid-fold
      .load(s"$root/t")
      .select(
        element_at(col("headers"), "user_id").cast("string").cast("long")
          .as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("key").cast("string").cast("long").as("event_id"),
        get_json_object(col("value").cast("string"), "$.k").cast("long")
          .as("k"))
      .as[ChunkEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new GapProcessor(6L * 3600 * 1000 * 1000),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-tws-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "the drain must actually have crossed micro-batch boundaries")

    val streamed = ss.table(name)
      .select("user_id", "prev_id", "event_id", "gap_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    // closed form: odd steps s are 7 h, so the gap ends at event
    // i = s+1, i.e. every EVEN i ≥ 2: i ∈ {2, 4, 6, 8, 10}
    val batch = (for (u <- 0 until 2; i <- 2 until 12 by 2) yield
      (u.toLong, u * 100L + i - 1, u * 100L + i, 25200000000L)).toSet
    assert(streamed === batch,
      "gaps must equal the batch lag-window formulation")
  }

  /** The last unexercised v2 state-config surface: TTLConfig. Every
    * gate processor passes TTLConfig.NONE (their state must live for
    * the whole drain), so this leg proves the TTL machinery itself —
    * a 1 ms processing-time TTL expires a ValueState BETWEEN
    * micro-batches (batch scheduling overhead ≫ 1 ms), while the
    * NONE control carries it: the same two-batch topic yields
    * per-user counts {1, 1} under TTL and {1, 2} under NONE. */
  test("transformWithState TTLConfig: state expires between batches") {
    import graft.operators.ChunkEvent
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    // transformWithState in ProcessingTime mode reports
    // shouldRunAnotherBatch = true UNCONDITIONALLY (so wall-clock
    // timers can fire), which under Trigger.AvailableNow schedules
    // empty micro-batches FOREVER — the drain never terminates
    // (observed: 1,600+ empty batches; TransformWithStateExecBase
    // .shouldRunAnotherBatch). No-data batches are irrelevant here —
    // TTL expiry is evaluated when the SECOND data batch reads the
    // state — so turn them off and let AvailableNow stop at data
    // exhaustion. Event-time drains (the gates) are unaffected: their
    // shouldRunAnotherBatch is watermark-gated and terminates.
    ss.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    import ss.implicits._
    val root = Files.createTempDirectory("graft-ttl").toString
    val log = TopicLog.create(ss, root, "t", 1)
    // 2 events per user, forced into SEPARATE micro-batches by a
    // 2-record trigger over 2 users
    val rows = for (i <- 0 until 2; u <- 0 until 2) yield
      (u * 100L + i, u.toLong,
        new java.sql.Timestamp(1700000000000L + i * 60000L), 0)
    val df = rows.toDF("event_id", "user_id", "ts", "partition")
      .select(col("event_id").cast("string").cast("binary").as("key"),
        lit("x").cast("binary").as("value"),
        map(lit("user_id"), col("user_id").cast("string").cast("binary"))
          .as("headers"),
        col("ts"), col("partition").cast("int").as("partition"))
    log.produce(df.orderBy("ts"), partitioner = col("partition"))

    // returns the per-user count sequences AND the committed data
    // batches' trigger timestamps (ms) — the TTL leg must VERIFY the
    // inter-batch gap instead of assuming scheduler overhead > TTL
    // (round-13 advice: two batches inside the same millisecond would
    // carry state under a 1 ms TTL and flake the assertion)
    def drain(ttl: org.apache.spark.sql.streaming.TTLConfig,
        name: String): (Map[Long, Seq[Long]], Seq[Long]) = {
      val q = ss.readStream.format("graft-topic")
        .option("maxOffsetsPerTrigger", 2L) // one event/user/batch
        .load(s"$root/t")
        .select(
          element_at(col("headers"), "user_id").cast("string").cast("long")
            .as("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("key").cast("string").cast("long").as("event_id"),
          lit(0L).as("k"))
        .as[ChunkEvent]
        .groupByKey(_.user_id)
        .transformWithState(new TtlCountProcessor(ttl),
          // state TTL requires ProcessingTime mode; the NONE control
          // runs under the same mode so only the TTL differs
          org.apache.spark.sql.streaming.TimeMode.ProcessingTime(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-ttl-$name").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val dataBatches = q.recentProgress.filter(_.numInputRows > 0)
      assert(dataBatches.length >= 2,
        "the TTL probe needs its events in separate micro-batches")
      val tsMs = dataBatches.map(p =>
        java.time.Instant.parse(p.timestamp).toEpochMilli).sorted.toSeq
      (ss.table(name).as[(Long, Long, Long)].collect()
        .groupBy(_._1).map { case (u, rs) =>
          u -> rs.sortBy(_._2).map(_._3).toSeq }.toMap, tsMs)
    }
    // control first: NONE carries state → counts climb 1, 2
    val (none, _) =
      drain(org.apache.spark.sql.streaming.TTLConfig.NONE, "ttl_none")
    assert(none === Map(0L -> Seq(1L, 2L), 1L -> Seq(1L, 2L)),
      "NONE control must carry the count across batches")
    // 1 ms TTL: the inter-batch gap (scheduler overhead, normally
    // ≫ 1 ms) expires the state → every event restarts at 1. The gap
    // is MEASURED from the committed batch timestamps; the rare
    // same-millisecond commit re-drains instead of flaking.
    var ttlCounts = Map.empty[Long, Seq[Long]]
    var gapOk = false
    var attempt = 0
    while (!gapOk && attempt < 5) {
      val (m, ts) = drain(org.apache.spark.sql.streaming.TTLConfig(
        java.time.Duration.ofMillis(1)), s"ttl_1ms_$attempt")
      gapOk = ts.sliding(2).forall { case Seq(a, b) => b - a > 1L }
      ttlCounts = m
      attempt += 1
    }
    assert(gapOk,
      "five consecutive drains committed both micro-batches within 1 ms")
    assert(ttlCounts === Map(0L -> Seq(1L, 1L), 1L -> Seq(1L, 1L)),
      "a 1 ms TTL must expire the carried state between micro-batches")
  }

  /** stream_exec_tws_chunks' claim — the ListState re-implementation
    * of the count-capped chunk fold emits EXACTLY the v1
    * (flatMapGroupsWithState) rows whatever the batch boundaries:
    * same 3-user/17-event fixture shape as the v1 leg, 7-record
    * triggers splitting chunks mid-fill so the buffered PARTIAL
    * survives in the ListState (clear + ordered appendList) across
    * batches. */
  test("transformWithState ListState: buffered chunks survive boundaries") {
    import graft.operators.{ChunkEvent, ChunkListProcessor}
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val root = Files.createTempDirectory("graft-sxl").toString
    val log = TopicLog.create(ss, root, "t", 2)
    val rows = for (u <- 0 until 3; i <- 0 until 17) yield
      (u * 100L + i, u.toLong,
        new java.sql.Timestamp(1700000000000L + i * 60000L + u * 7L),
        i + 1L, u % 2)
    val df = rows.toDF("event_id", "user_id", "ts", "k", "partition")
      .select(col("event_id").cast("string").cast("binary").as("key"),
        to_json(struct(col("k"))).cast("binary").as("value"),
        map(lit("user_id"), col("user_id").cast("string").cast("binary"))
          .as("headers"),
        col("ts"), col("partition").cast("int").as("partition"))
    log.produce(df, partitioner = col("partition"))

    val name = "sxl_parity"
    val q = ss.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 7L) // splits chunks mid-fill
      .load(s"$root/t")
      .select(
        element_at(col("headers"), "user_id").cast("string").cast("long")
          .as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("key").cast("string").cast("long").as("event_id"),
        get_json_object(col("value").cast("string"), "$.k").cast("long")
          .as("k"))
      .as[ChunkEvent]
      .groupByKey(_.user_id)
      .transformWithState(new ChunkListProcessor(5),
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sxl-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "the drain must actually have crossed micro-batch boundaries")
    val streamed = ss.table(name)
      .select("user_id", "chunk_idx", "n_events", "start_us", "end_us",
        "sum_k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val batch = (for (u <- 0 until 3; c <- 0 until 3) yield {
      val ks = (c * 5 until c * 5 + 5).map(_ + 1L)
      (u.toLong, c.toLong, 5L,
        1700000000000000L + (c * 5) * 60000000L + u * 7000L,
        1700000000000000L + (c * 5 + 4) * 60000000L + u * 7000L,
        ks.sum)
    }).toSet
    assert(streamed === batch,
      "ListState chunks must equal the v1 fold; the 2-event tail is withheld")
  }

  /** stream_exec_tws_running's claim — the MapState per-(user, type)
    * counters survive micro-batch boundaries: 2 users × 12 events
    * with types cycling A B A, tiny triggers so most (user, type)
    * ordinals increment across batches from the carried sub-map. */
  test("transformWithState MapState: running counts survive boundaries") {
    import graft.operators.{RunningCountProcessor, TypedEvent}
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val root = Files.createTempDirectory("graft-sxm").toString
    val log = TopicLog.create(ss, root, "t", 2)
    val types = Seq("A", "B", "A") // i % 3 cycle
    val rows = for (u <- 0 until 2; i <- 0 until 12) yield
      (u * 100L + i, u.toLong, types(i % 3),
        new java.sql.Timestamp(1700000000000L + i * 60000L + u * 7L), u)
    val df = rows.toDF("event_id", "user_id", "etype", "ts", "partition")
      .select(col("event_id").cast("string").cast("binary").as("key"),
        lit("x").cast("binary").as("value"),
        map(lit("user_id"), col("user_id").cast("string").cast("binary"),
          lit("event_type"), col("etype").cast("binary")).as("headers"),
        col("ts"), col("partition").cast("int").as("partition"))
    log.produce(df, partitioner = col("partition"))

    val name = "sxm_parity"
    val q = ss.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 5L) // ordinals span boundaries
      .load(s"$root/t")
      .select(
        element_at(col("headers"), "user_id").cast("string").cast("long")
          .as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("key").cast("string").cast("long").as("event_id"),
        element_at(col("headers"), "event_type").cast("string").as("etype"))
      .as[TypedEvent]
      .groupByKey(_.user_id)
      .transformWithState(new RunningCountProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sxm-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "the drain must actually have crossed micro-batch boundaries")
    val streamed = ss.table(name)
      .select("user_id", "event_id", "event_type", "running_n")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    // closed form: event i has type types(i % 3); its ordinal is the
    // count of j ≤ i with the same type
    val batch = (for (u <- 0 until 2; i <- 0 until 12) yield {
      val tpe = types(i % 3)
      val n = (0 to i).count(j => types(j % 3) == tpe).toLong
      (u.toLong, u * 100L + i, tpe, n)
    }).toSet
    assert(streamed === batch,
      "running counts must equal the batch window formulation")
  }

  /** stream_exec_tws_timers' claims, on planted data with forced tiny
    * micro-batches: (1) the emitted sessions equal the batch 6 h
    * sessionization under the pinned final-watermark cutoff; (2)
    * event-time timers ACTUALLY fire (expired-timer count grows) —
    * the round-12 verdict's zero-coverage path; (3) in-drain closes
    * still ride the input path (both paths emit identical rows); (4)
    * the timer-expiry boundary is exactly `expiry_ms ≤ W_ms`
    * (INCLUSIVE — planted probes at W − 1 ms, W, and W + 1 ms; the
    * probe run that pinned this had the strict hypothesis fail on
    * the at-W row). Single-partition topic in event-time order = the
    * global-prefix admission that makes the watermark a true lower
    * bound on unadmitted data. */
  test("transformWithState timers: session close on expiry, exact boundary") {
    import graft.operators.{ChunkEvent, SessionTimerProcessor, Streams}
    val ss = spark.newSession()
    ss.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import ss.implicits._
    val root = Files.createTempDirectory("graft-twt").toString
    val log = TopicLog.create(ss, root, "t", 1)
    val baseUs = 1700000000000000L
    val hourUs = 3600000000L
    // user 0: 12 events, steps alternating 1 h / 6.5 h → six
    // 2-event sessions; each 6.5 h gap closes via INPUT (the closing
    // event is admitted before any row that could push the watermark
    // past end + 6 h, because admission follows global time order)
    val t0 = (0 until 12).scanLeft(0L) { (acc, s) =>
      acc + (if (s % 2 == 0) hourUs else 23400000000L)
    }.take(12)
    // user 1 ("clock"): 21 events at 10 h spacing drive the final
    // watermark to W = 200 h − 1 h (its own sessions are singletons)
    val clock = (0 to 20).map(i => i * 10L * hourUs)
    val wMs = (baseUs + 200 * hourUs) / 1000 - 3600000L
    // boundary probes (single-event users): expiry at exactly W
    // (user 2 — EMITTED: the boundary is inclusive), at W − 1 ms
    // (user 3 — emitted), at W + 1 ms (user 5 — withheld), and well
    // inside (user 4)
    val aUs = (wMs - 21600000L) * 1000
    val bUs = (wMs - 21600001L) * 1000
    val cUs = (wMs - 57600000L) * 1000
    val dUs = (wMs - 21599999L) * 1000
    val rows =
      t0.zipWithIndex.map { case (ts, i) => (i + 1L, 0L, baseUs + ts) } ++
      clock.zipWithIndex.map { case (ts, i) => (100L + i, 1L, baseUs + ts) } ++
      Seq((200L, 2L, aUs), (201L, 3L, bUs), (202L, 4L, cUs),
        (203L, 5L, dUs))
    val df = rows.toDF("event_id", "user_id", "ts_us")
      .select(col("event_id").cast("string").cast("binary").as("key"),
        to_json(struct(lit(0L).as("k"))).cast("binary").as("value"),
        map(lit("user_id"), col("user_id").cast("string").cast("binary"))
          .as("headers"),
        expr("timestamp_micros(ts_us)").as("ts"),
        lit(0).as("partition"))
    log.produce(df.orderBy("ts_us"), partitioner = col("partition"))

    val timer0 = SessionTimerProcessor.timerCloses.get()
    val input0 = SessionTimerProcessor.inputCloses.get()
    val name = "twt_parity"
    val q = ss.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 7L) // 36 rows → ≥5 micro-batches
      .load(s"$root/t")
      .select(
        element_at(col("headers"), "user_id").cast("string").cast("long")
          .as("user_id"),
        col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        col("key").cast("string").cast("long").as("event_id"),
        lit(0L).as("k"))
      .withWatermark("ts", "1 hour")
      .drop("ts")
      .as[ChunkEvent]
      .groupByKey(_.user_id)
      .transformWithState(
        new SessionTimerProcessor(Streams.TwsGapUs),
        org.apache.spark.sql.streaming.TimeMode.EventTime(),
        org.apache.spark.sql.streaming.OutputMode.Append())
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-twt-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 4,
      "the drain must actually have crossed micro-batch boundaries")

    val streamed = ss.table(name)
      .select("user_id", "session_idx", "n_events", "start_us", "end_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    val expected =
      (0 until 6).map(j => (0L, j.toLong, 2L,
        baseUs + t0(2 * j), baseUs + t0(2 * j + 1))).toSet ++
      (0 until 20).map(i => (1L, i.toLong, 1L,
        baseUs + clock(i), baseUs + clock(i))).toSet ++
      Set((2L, 0L, 1L, aUs, aUs),   // expiry exactly W: emitted
          (3L, 0L, 1L, bUs, bUs),   // expiry W − 1 ms: emitted
          (4L, 0L, 1L, cUs, cUs))   // well inside: emitted
      // user 5 (expiry W + 1 ms) withheld — the inclusive boundary's
      // other side; the clock's trailing session (W + 5 h) withheld
    assert(streamed === expected,
      "emitted sessions must equal the batch sessionization under the " +
        "inclusive expiry <= W cutoff")
    assert(SessionTimerProcessor.timerCloses.get() - timer0 >= 2L,
      "event-time timers must actually have fired")
    assert(SessionTimerProcessor.inputCloses.get() - input0 >= 5L,
      "in-drain closes must ride the input path")
  }

  /** stream_exec_outer_join_watermarked's claims, on planted data
    * with forced tiny micro-batches: (1) matched pairs equal the
    * batch interval join; (2) NULL-padded lefts are emitted for
    * exactly the unmatched views whose join horizon sits strictly
    * more than 1 ms inside the final watermark W = min over both
    * sides of (ms-floored max event time) − delay — the boundary the
    * round-12 probe bracketed at ±1 ms / ±500 µs / ±1 µs / equality;
    * (3) outer state is actually evicted during the drain. The
    * fixture plants FOUR boundary rows at exactly those offsets, so
    * a future Spark changing the emission predicate fails here, not
    * in the gate. */
  test("watermarked LEFT OUTER join: matches, exact null boundary, eviction") {
    val root = Files.createTempDirectory("graft-sxo").toString
    val log = TopicLog.create(spark, root, "t", 2)
    val baseUs = 1700000000000000L
    // views hourly over 120 h, purchases only for even i (5 min
    // later, inside the 10-min interval); odd views are unmatched
    val mainRows = (0 until 120).flatMap { i =>
      val v = Seq((2 * i.toLong, "view", i % 5, baseUs + i * 3600000000L, i % 2))
      val p = if (i % 2 == 0)
        Seq((2 * i + 1L, "purchase", i % 5, baseUs + i * 3600000000L + 300000000L, i % 2))
      else Nil
      v ++ p
    }
    // final maxima: v_max = view 119, p_max = purchase 118 + 5 min →
    // W = p_max − 1 h (min policy). Boundary rows (unmatched k = 9):
    // horizons at W (withheld), W − 1 µs (withheld), W − 500 µs
    // (withheld), W − 1 ms (emitted)
    val wUs = (baseUs + 118 * 3600000000L + 300000000L) - 3600000000L
    val horizon = (h: Long) => h - 600000000L // v_ts for horizon h
    val boundaryRows = Seq(
      (900L, "view", 9, horizon(wUs), 0),
      (901L, "view", 9, horizon(wUs - 1L), 1),
      (902L, "view", 9, horizon(wUs - 500L), 0),
      (903L, "view", 9, horizon(wUs - 1000L), 1))
    val rows = mainRows ++ boundaryRows
    val df = rows.toDF("id", "etype", "k", "ts_us", "partition")
      .select(col("id").cast("string").cast("binary").as("key"),
        to_json(struct(col("k"))).cast("binary").as("value"),
        map(lit("event_type"), col("etype").cast("binary")).as("headers"),
        expr("timestamp_micros(ts_us)").as("ts"),
        col("partition").cast("int").as("partition"))
    // ts-ordered per partition — the production topic's premise
    log.produce(df.orderBy("ts_us"), partitioner = col("partition"))

    def side(stream: org.apache.spark.sql.DataFrame, t: String, a: String) =
      stream
        .filter(element_at(col("headers"), "event_type").cast("string") === t)
        .select(col("key").cast("string").cast("long").as(s"${a}_id"),
          col("ts").as(s"${a}_ts"),
          get_json_object(col("value").cast("string"), "$.k").cast("long")
            .as(s"${a}_k"))
    val stream = spark.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 24L) // forces ≥10 micro-batches
      .load(s"$root/t")
    val name = "sxo_parity"
    val q = side(stream, "view", "v").withWatermark("v_ts", "1 hour")
      .join(side(stream, "purchase", "p").withWatermark("p_ts", "1 hour"),
        col("v_k") === col("p_k") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"),
        "leftOuter")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sxo-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "the drain must actually have crossed micro-batch boundaries")

    val out = spark.table(name)
    val matched = out.filter(col("p_id").isNotNull)
      .select("v_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matched === (0 until 120 by 2).map(i => (2L * i, 2L * i + 1)).toSet,
      "matched pairs must equal the batch interval join")
    val nulls = out.filter(col("p_id").isNull)
      .select("v_id").collect().map(_.getLong(0)).toSet
    // emitted: odd-i views with v_ts + 10 min ≤ W − 1 ms, plus
    // boundary row 903 (horizon exactly W − 1 ms); 900/901/902
    // withheld (horizon > W − 1 ms), as are odd i ∈ {117, 119}
    val expectedNulls = (1 until 120 by 2)
      .filter(i => baseUs + i * 3600000000L + 600000000L <= wUs - 1000L)
      .map(2L * _).toSet + 903L
    assert(nulls === expectedNulls,
      "null padding must follow the pinned strict-1ms watermark boundary")
    assert(q.recentProgress.flatMap(_.stateOperators)
        .exists(_.numRowsRemoved > 0),
      "the watermark must actually have evicted outer state")
  }

  /** stream_exec_semi_join_watermarked's claims (round 15):
    * (1) each view with ≥1 qualifying purchase emits EXACTLY ONCE,
    * with no purchase columns, even when several purchases match —
    * once-only is the join's state discipline (matched-flag), not a
    * downstream DISTINCT; (2) unmatched views NEVER emit — the semi
    * join has no null-emission boundary at all, so drained = batch
    * semi join with no watermark term; (3) semi state is actually
    * evicted during the drain. */
  test("watermarked LEFT SEMI join: once-only emission, silent drop, eviction") {
    val root = Files.createTempDirectory("graft-sxs").toString
    val log = TopicLog.create(spark, root, "t", 2)
    val baseUs = 1700000000000000L
    // views hourly over 120 h; even i carries TWO qualifying
    // purchases (+5 min, +7 min — both inside the 10-min interval),
    // so a once-only failure would DOUBLE those views; odd i is
    // unmatched and must never appear
    val rows = (0 until 120).flatMap { i =>
      val v = Seq((2000 + 2 * i.toLong, "view", i % 5, baseUs + i * 3600000000L, i % 2))
      val p = if (i % 2 == 0) Seq(
        (2000 + 2 * i + 1L, "purchase", i % 5, baseUs + i * 3600000000L + 300000000L, i % 2),
        (4000 + i.toLong, "purchase", i % 5, baseUs + i * 3600000000L + 420000000L, i % 2))
      else Nil
      v ++ p
    }
    val df = rows.toDF("id", "etype", "k", "ts_us", "partition")
      .select(col("id").cast("string").cast("binary").as("key"),
        to_json(struct(col("k"))).cast("binary").as("value"),
        map(lit("event_type"), col("etype").cast("binary")).as("headers"),
        expr("timestamp_micros(ts_us)").as("ts"),
        col("partition").cast("int").as("partition"))
    log.produce(df.orderBy("ts_us"), partitioner = col("partition"))

    def side(stream: org.apache.spark.sql.DataFrame, t: String, a: String) =
      stream
        .filter(element_at(col("headers"), "event_type").cast("string") === t)
        .select(col("key").cast("string").cast("long").as(s"${a}_id"),
          col("ts").as(s"${a}_ts"),
          get_json_object(col("value").cast("string"), "$.k").cast("long")
            .as(s"${a}_k"))
    val stream = spark.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 24L) // forces ≥10 micro-batches
      .load(s"$root/t")
    val name = "sxs_parity"
    val q = side(stream, "view", "v").withWatermark("v_ts", "1 hour")
      .join(side(stream, "purchase", "p").withWatermark("p_ts", "1 hour"),
        col("v_k") === col("p_k") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"),
        "leftSemi")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sxs-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "the drain must actually have crossed micro-batch boundaries")

    val emitted = spark.table(name).select("v_id").collect().map(_.getLong(0))
    assert(emitted.length === emitted.distinct.length,
      "a doubly-matched view must still emit exactly once")
    assert(emitted.toSet === (0 until 120 by 2).map(2000L + 2 * _).toSet,
      "semi output must equal the batch semi join — matched views " +
        "only, odd views silently dropped with no watermark term")
    assert(spark.table(name).columns.toSet === Set("v_id", "v_ts", "v_k"),
      "the semi join must carry no purchase columns")
    assert(q.recentProgress.flatMap(_.stateOperators)
        .exists(_.numRowsRemoved > 0),
      "the watermark must actually have evicted semi state")
  }

  /** stream_exec_full_outer_join_watermarked's claims (round 15):
    * (1) matched pairs equal the batch interval join; (2) the LEFT
    * null direction follows the round-12 strict-1ms boundary
    * (horizon v_ts + interval ≤ W − 1 ms — same planted bracket as
    * the left-outer leg); (3) the RIGHT null direction follows ITS
    * state horizon — the last matchable view satisfies v_ts ≤ p_ts,
    * so an unmatched purchase null-emits iff p_ts ≤ W − 1 ms,
    * bracketed here at W / W − 1 µs / W − 500 µs / W − 1 ms; (4)
    * state is evicted. A Spark version moving either predicate
    * fails here, not in the gate (SURVEY §5.1). */
  test("watermarked FULL OUTER join: matches, BOTH null boundaries, eviction") {
    val root = Files.createTempDirectory("graft-sxf").toString
    val log = TopicLog.create(spark, root, "t", 2)
    val baseUs = 1700000000000000L
    // same main fixture as the left-outer leg: views hourly over
    // 120 h, purchases (+5 min) for even i only — every purchase in
    // the main rows is matched, so the right-null set is EXACTLY the
    // planted purchase probes
    val mainRows = (0 until 120).flatMap { i =>
      val v = Seq((2 * i.toLong, "view", i % 5, baseUs + i * 3600000000L, i % 2))
      val p = if (i % 2 == 0)
        Seq((2 * i + 1L, "purchase", i % 5, baseUs + i * 3600000000L + 300000000L, i % 2))
      else Nil
      v ++ p
    }
    // W = (purchase-side max) − 1 h under the min policy, as pinned
    val wUs = (baseUs + 118 * 3600000000L + 300000000L) - 3600000000L
    val horizon = (h: Long) => h - 600000000L // v_ts for left horizon h
    // left probes (unmatched k = 9): horizon at W / W−1µs / W−500µs
    // withheld, W−1ms emitted — the round-12 bracket
    val leftProbes = Seq(
      (900L, "view", 9, horizon(wUs), 0),
      (901L, "view", 9, horizon(wUs - 1L), 1),
      (902L, "view", 9, horizon(wUs - 500L), 0),
      (903L, "view", 9, horizon(wUs - 1000L), 1))
    // right probes (unmatched k = 8): p_ts IS the horizon — at W /
    // W−1µs / W−500µs withheld, W−1ms emitted
    val rightProbes = Seq(
      (910L, "purchase", 8, wUs, 0),
      (911L, "purchase", 8, wUs - 1L, 1),
      (912L, "purchase", 8, wUs - 500L, 0),
      (913L, "purchase", 8, wUs - 1000L, 1))
    val rows = mainRows ++ leftProbes ++ rightProbes
    val df = rows.toDF("id", "etype", "k", "ts_us", "partition")
      .select(col("id").cast("string").cast("binary").as("key"),
        to_json(struct(col("k"))).cast("binary").as("value"),
        map(lit("event_type"), col("etype").cast("binary")).as("headers"),
        expr("timestamp_micros(ts_us)").as("ts"),
        col("partition").cast("int").as("partition"))
    log.produce(df.orderBy("ts_us"), partitioner = col("partition"))

    def side(stream: org.apache.spark.sql.DataFrame, t: String, a: String) =
      stream
        .filter(element_at(col("headers"), "event_type").cast("string") === t)
        .select(col("key").cast("string").cast("long").as(s"${a}_id"),
          col("ts").as(s"${a}_ts"),
          get_json_object(col("value").cast("string"), "$.k").cast("long")
            .as(s"${a}_k"))
    val stream = spark.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", 24L) // forces ≥10 micro-batches
      .load(s"$root/t")
    val name = "sxf_parity"
    val q = side(stream, "view", "v").withWatermark("v_ts", "1 hour")
      .join(side(stream, "purchase", "p").withWatermark("p_ts", "1 hour"),
        col("v_k") === col("p_k") &&
          col("p_ts") >= col("v_ts") &&
          col("p_ts") <= col("v_ts") + expr("INTERVAL 10 MINUTES"),
        "fullOuter")
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-sxf-ckpt").toString)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) >= 5,
      "the drain must actually have crossed micro-batch boundaries")

    val out = spark.table(name)
    val matched = out.filter(col("p_id").isNotNull && col("v_id").isNotNull)
      .select("v_id", "p_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(matched === (0 until 120 by 2).map(i => (2L * i, 2L * i + 1)).toSet,
      "matched pairs must equal the batch interval join")
    val nullViews = out.filter(col("p_id").isNull)
      .select("v_id").collect().map(_.getLong(0)).toSet
    val expectedNullViews = (1 until 120 by 2)
      .filter(i => baseUs + i * 3600000000L + 600000000L <= wUs - 1000L)
      .map(2L * _).toSet + 903L
    assert(nullViews === expectedNullViews,
      "left null padding must follow the pinned strict-1ms boundary")
    val nullPurchases = out.filter(col("v_id").isNull)
      .select("p_id").collect().map(_.getLong(0)).toSet
    assert(nullPurchases === Set(913L),
      "right null padding must follow ITS strict-1ms boundary " +
        "(p_ts ≤ W − 1 ms): W / W−1µs / W−500µs withheld, W−1ms emitted")
    // Spark 4.1 metrics gap, pinned here so an upgrade that fixes it
    // gets noticed: the FULL OUTER symmetricHashJoin path reports
    // numRowsRemoved = 0 in every batch even while state is plainly
    // evicted (measured: each batch ADDS ~24 rows per numRowsUpdated,
    // yet numRowsTotal plateaus at ~28 and falls to ~10 by the final
    // no-data batch — the inner and left-outer paths DO count
    // removals). Eviction is therefore asserted from the
    // conservation law — rows added far exceed rows still held — the
    // same bounded-state property, metric gap or not.
    val progress = q.recentProgress.filter(_.stateOperators.nonEmpty)
    val added = progress.map(_.stateOperators.map(_.numRowsUpdated).sum).sum
    val finalTotal = progress.last.stateOperators.map(_.numRowsTotal).sum
    assert(q.recentProgress.flatMap(_.stateOperators)
        .forall(_.numRowsRemoved == 0),
      "numRowsRemoved is 0 on the 4.1 full-outer path — if this now " +
        "counts removals, restore the numRowsRemoved > 0 assertion")
    assert(added >= 150 && finalTotal < 60,
      s"full-outer state must be a small evicted tail: added=$added " +
        s"held=$finalTotal")
  }

  /** stream_exec_chained_agg's emission boundary, pinned on planted
    * data: TWO chained windowed aggregations (hourly → daily via
    * window_time) drain under tiny triggers; a clock row places the
    * final watermark EXACTLY on a daily window end in drain A (the
    * day must EMIT — the aggregation eviction boundary is INCLUSIVE,
    * end ≤ W, matching the session-window rule) and 1 ms before it in
    * drain B (the day must be WITHHELD). A Spark version flipping the
    * predicate fails here, not in the gate (SURVEY §5.1). */
  test("chained windowed aggs: daily rollup emits at the inclusive boundary") {
    val ss = spark.newSession()
    import ss.implicits._
    // D0 = an exact UTC midnight; day windows are UTC-aligned
    val d0Us = 1700006400000000L
    val hourUs = 3600000000L
    def drain(clockUs: Long, name: String): Set[(Long, String, Long, Long, Long)] = {
      val root = Files.createTempDirectory(s"graft-sxc-$name").toString
      val log = TopicLog.create(ss, root, "t", 1)
      val rows = Seq(
        (1L, "a", d0Us + hourUs + 1800000000L),        // D0 01:30
        (2L, "a", d0Us + 2 * hourUs + 900000000L),     // D0 02:15
        (3L, "a", d0Us + 2 * hourUs + 2700000000L),    // D0 02:45
        (4L, "a", d0Us + 86400000000L + 5 * hourUs),   // D1 05:00
        (5L, "c", clockUs))                            // the clock
      val df = rows.toDF("event_id", "event_type", "ts_us")
        .select(col("event_id").cast("string").cast("binary").as("key"),
          lit("{}").cast("binary").as("value"),
          map(lit("event_type"), col("event_type").cast("binary")).as("headers"),
          expr("timestamp_micros(ts_us)").as("ts"),
          lit(0).as("partition"))
      log.produce(df.orderBy("ts_us"), partitioner = col("partition"))
      val q = ss.readStream.format("graft-topic")
        .option("maxOffsetsPerTrigger", 2L)
        .load(s"$root/t")
        .select(col("ts"),
          element_at(col("headers"), "event_type").cast("string")
            .as("event_type"))
        .withWatermark("ts", "1 day")
        .groupBy(window(col("ts"), "1 hour").as("hw"), col("event_type"))
        .agg(count(lit(1)).as("n_hour"))
        .groupBy(window(window_time(col("hw")), "1 day").as("dw"),
          col("event_type"))
        .agg(sum("n_hour").as("n_day"), max("n_hour").as("peak_hour_n"),
          count(lit(1)).as("n_active_hours"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation",
          Files.createTempDirectory(s"graft-sxc-ckpt-$name").toString)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      assert(q.recentProgress.count(_.numInputRows > 0) >= 2,
        "the drain must cross micro-batch boundaries")
      ss.table(name)
        .select(unix_micros(col("dw.start")).as("ds_us"), col("event_type"),
          col("n_day"), col("peak_hour_n"), col("n_active_hours"))
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSet
    }
    val d0Row = (d0Us, "a", 3L, 2L, 2L)
    val d1Row = (d0Us + 86400000000L, "a", 1L, 1L, 1L)
    // drain A: clock at D3 00:00.000 → W = D2 00:00.000 = D1's window
    // end exactly — inclusive emission must release D1
    val atW = drain(d0Us + 3 * 86400000000L, "sxc_at")
    assert(atW === Set(d0Row, d1Row),
      "a day window ending exactly AT the watermark must emit (end ≤ W)")
    // drain B: clock 1 ms earlier → W = D1's end − 1 ms — withheld
    val beforeW = drain(d0Us + 3 * 86400000000L - 1000L, "sxc_before")
    assert(beforeW === Set(d0Row),
      "a day window ending 1 ms past the watermark must be withheld")
  }
}

/** Test instrument for the TTL leg: per-user running event count in
  * a (possibly TTL'd) ValueState — a count that RESTARTS at 1 proves
  * the carried state expired between micro-batches. */
private[streaming] class TtlCountProcessor(
    ttl: org.apache.spark.sql.streaming.TTLConfig)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, graft.operators.ChunkEvent, (Long, Long, Long)] {
  @transient private var n: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: org.apache.spark.sql.streaming.OutputMode,
      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
    n = getHandle.getValueState[Long]("n",
      org.apache.spark.sql.Encoders.scalaLong, ttl)

  override def handleInputRows(key: Long,
      rows: Iterator[graft.operators.ChunkEvent],
      timerValues: org.apache.spark.sql.streaming.TimerValues)
      : Iterator[(Long, Long, Long)] = {
    val sorted = rows.toArray.sortBy(e => (e.ts_us, e.event_id))
    sorted.map { e =>
      val c = (if (n.exists()) n.get() else 0L) + 1L
      n.update(c)
      (key, e.event_id, c)
    }.iterator
  }
}
