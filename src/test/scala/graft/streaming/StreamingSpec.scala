package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structured-Streaming coverage for the topic log: incremental
  * readStream tailing, streaming produce, watermarked windowed aggs,
  * and custom per-key state — the streaming form of the reference's
  * Producer/Consumer API roadmap. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpRoot(): String = Files.createTempDirectory("graft-stream").toString

  private def records(ids: Range) =
    ids.toDF("i").select(
      col("i"),
      concat(lit("k"), (col("i") % 5).cast("string")).cast("binary").as("key"),
      concat(lit("v"), col("i").cast("string")).cast("binary").as("value"))

  test("readStream tails the topic incrementally across produces") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "s1", 2)
    log.produce(records(0 until 20), Partitioners.byLongKey(2, col("i")))

    val q = log.readStream()
      .groupBy("partition").agg(count(lit(1)).as("n"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("s1_counts")
      .start()
    try {
      q.processAllAvailable()
      val c1 = spark.table("s1_counts").agg(sum("n")).collect()(0).getLong(0)
      assert(c1 === 20)

      log.produce(records(20 until 50), Partitioners.byLongKey(2, col("i")))
      q.processAllAvailable()
      val c2 = spark.table("s1_counts").agg(sum("n")).collect()(0).getLong(0)
      assert(c2 === 50)
    } finally q.stop()
  }

  test("produceStream routes a stream into the topic with offset assignment") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "s2", 2)
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Int]
    val source = mem.toDF().select(
      col("value").as("i"),
      col("value").cast("string").cast("binary").as("key"),
      concat(lit("payload"), col("value").cast("string")).cast("binary").as("value"))
    val q = log.produceStream(source, s"$root/_cp", Partitioners.byLongKey(2, col("i")))
    try {
      mem.addData(1 to 10: _*)
      q.processAllAvailable()
      assert(log.read().count() === 10)
      mem.addData(11 to 15: _*)
      q.processAllAvailable()
      assert(log.read().count() === 15)
      val ends = log.logEndOffsets()
      assert(ends.values.sum === 15)
    } finally q.stop()
  }

  test("produceIdempotent skips replayed micro-batches (exactly-once)") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "s5", 2)
    val batch = records(0 until 10)
    assert(log.produceIdempotent(batch, batchId = 0L))
    assert(log.read().count() === 10)
    // replay of the same batch id must be a no-op
    assert(!log.produceIdempotent(batch, batchId = 0L))
    assert(log.read().count() === 10)
    // next batch id applies
    assert(log.produceIdempotent(records(10 until 15), batchId = 1L))
    assert(log.read().count() === 15)
  }

  test("watermarked tumbling-window aggregation over the stream emits closed windows") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "s3", 1)
    def batch(hour: Int, n: Int) =
      (0 until n).toDF("i").select(
        col("i"),
        lit(null).cast("binary").as("key"),
        col("i").cast("string").cast("binary").as("value"),
        expr(s"timestamp'2024-01-01 0$hour:00:00' + make_interval(0,0,0,0,0, i % 50)").as("ts"))

    log.produce(batch(0, 30), Partitioners.byLongKey(1, col("i")))
    val q = log.readStream()
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("n"))
      .writeStream.outputMode("append")
      .format("memory").queryName("s3_win")
      .start()
    try {
      q.processAllAvailable()
      // hour-1 batch pushes the watermark past hour 0 → window closes
      log.produce(batch(2, 10), Partitioners.byLongKey(1, col("i")))
      q.processAllAvailable()
      val rows = spark.table("s3_win").collect().map(r => (r.getTimestamp(0).toString, r.getLong(1)))
      assert(rows.exists { case (ws, n) => ws.startsWith("2024-01-01 00:") && n == 30 })
    } finally q.stop()
  }

  test("stream-stream join: clicks join impressions within the time bound") {
    implicit val sq = spark.sqlContext
    val imps = MemoryStream[(Long, Int)] // (user, impression id)
    val clicks = MemoryStream[(Long, Int)] // (user, click id)
    val impDf = imps.toDF().toDF("user_id", "imp_id")
      .withColumn("imp_ts", current_timestamp())
      .withWatermark("imp_ts", "1 minute")
    val clickDf = clicks.toDF().toDF("user_id", "click_id")
      .withColumn("click_ts", current_timestamp())
      .withWatermark("click_ts", "1 minute")
    val joined = impDf.join(clickDf, Seq("user_id"))
      .filter(col("click_ts") >= col("imp_ts") - expr("INTERVAL 2 MINUTES"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("ss_join").start()
    try {
      imps.addData((1L, 100), (2L, 200))
      q.processAllAvailable()
      clicks.addData((1L, 9001))
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("user_id", "imp_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
      assert(rows.toSet === Set((1L, 100, 9001)), "only user 1 clicked")
    } finally q.stop()
  }

  test("state-store dedup suppresses duplicates beyond any watermark horizon") {
    // dropDuplicatesWithinWatermark forgets keys once the watermark
    // passes; a per-key state store never does — the idempotent
    // consumer for ids that can reappear arbitrarily late. State is
    // one boolean per key, partitioned by the shuffle on the key —
    // the 100 TB shape is bounded state per key, not a global set.
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)] // (event_id, payload)
    val deduped = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, String)], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else { state.update(true); rows.take(1) }
      }
    val q = deduped.toDF("event_id", "payload")
      .writeStream.outputMode("append")
      .format("memory").queryName("ss_dedup_state")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"), (1L, "a-dup-same-batch"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
      // the duplicate arrives MANY batches later — far beyond any
      // plausible watermark horizon — and is still suppressed
      (0 until 5).foreach { i => mem.addData((100L + i, s"f$i")); q.processAllAvailable() }
      mem.addData((1L, "a-dup-much-later"), (2L, "b-dup"))
      q.processAllAvailable()
      val rows = spark.table("ss_dedup_state").collect()
        .map(r => (r.getLong(0), r.getString(1)))
      assert(rows.map(_._1).distinct.length === rows.length, "duplicate ids delivered")
      assert(rows.count(_._1 == 1L) === 1)
      assert(rows.find(_._1 == 1L).get._2 === "a", "first occurrence must win")
      assert(rows.length === 8) // ids 1,2,3,100..104
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running per-key state across batches") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(String, Double)]
    val updates = mem.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[Double]) =>
          val total = state.getOption.getOrElse(0.0) + rows.map(_._2).sum
          state.update(total)
          Iterator.single((key, total))
      }
    val q = updates.toDF("k", "running")
      .writeStream.outputMode("append")
      .format("memory").queryName("s4_state")
      .start()
    try {
      mem.addData(("a", 1.0), ("a", 2.0), ("b", 5.0))
      q.processAllAvailable()
      mem.addData(("a", 4.0))
      q.processAllAvailable()
      val byKey = spark.table("s4_state").collect()
        .map(r => (r.getString(0), r.getDouble(1)))
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(byKey("a") === 7.0)
      assert(byKey("b") === 5.0)
    } finally q.stop()
  }
}
