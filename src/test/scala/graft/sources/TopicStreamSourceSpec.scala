package graft.sources

import java.nio.file.Files

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.{Partitioners, TopicLog}

/** Streaming consume through the DSv2 micro-batch source: stream
  * offsets are the topic's manifest log-end offsets, so batches cover
  * exact per-partition offset ranges, resume from the checkpoint, and
  * can never include uncommitted files. */
class TopicStreamSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def records(ids: Range) =
    ids.toDF("i").select(
      col("i"),
      col("i").cast("string").cast("binary").as("key"),
      concat(lit("v"), col("i").cast("string")).cast("binary").as("value"))

  test("offsets track manifest ends; checkpoint resume delivers each record once") {
    val root = Files.createTempDirectory("graft-stream-src").toString
    val log = TopicLog.create(spark, root, "s", 2)
    val part = Partitioners.byLongKey(2, col("i"))
    log.produce(records(0 until 20), part)

    val seen = mutable.ArrayBuffer.empty[String]
    def startQuery() = spark.readStream.format("graft-topic").load(log.topicDir)
      .writeStream
      .option("checkpointLocation", s"$root/_cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select(col("value").cast("string")).collect().map(_.getString(0))
        }
        ()
      }.start()

    val q1 = startQuery()
    try {
      q1.processAllAvailable()
      assert(seen.sorted === (0 until 20).map(i => s"v$i").sorted)

      // incremental: a new produce arrives as exactly its own records
      log.produce(records(20 until 30), part)
      q1.processAllAvailable()
      assert(seen.size === 30)

      // a crashed (uncommitted) produce contributes NOTHING to the stream
      log.failpointBeforeCommit = true
      intercept[IllegalStateException] { log.produce(records(100 until 110), part) }
      log.failpointBeforeCommit = false
      q1.processAllAvailable()
      assert(seen.size === 30, "stream consumed uncommitted files")
    } finally q1.stop()

    // produce while no query runs; a new query on the same checkpoint
    // resumes from the committed stream offset — no reprocessing
    log.produce(records(30 until 35), part)
    val q2 = startQuery()
    try {
      q2.processAllAvailable()
      assert(seen.size === 35, s"expected exactly the 5 new records, got ${seen.size - 30}")
      assert(seen.distinct.size === 35, "a record was delivered twice across restarts")
    } finally q2.stop()
  }

  test("maxOffsetsPerTrigger bounds every micro-batch under backlog") {
    val root = Files.createTempDirectory("graft-stream-adm").toString
    val log = TopicLog.create(spark, root, "adm", 2)
    log.produce(records(0 until 100), Partitioners.byLongKey(2, col("i")))

    val batchSizes = mutable.ArrayBuffer.empty[Long]
    val q = spark.readStream.format("graft-topic")
      .option("maxOffsetsPerTrigger", "30")
      .load(log.topicDir)
      .writeStream
      .option("checkpointLocation", s"$root/_cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batchSizes.sum === 100, s"all records delivered, got $batchSizes")
      assert(batchSizes.forall(_ <= 30), s"a batch exceeded the cap: $batchSizes")
      assert(batchSizes.count(_ > 0) >= 4, s"backlog must split into batches: $batchSizes")
    } finally q.stop()
  }

  test("admission splits the row budget proportionally to backlog") {
    // round-11 regression pin: partition-order allocation drained
    // partition 0 fully before partition 1 saw budget, which made
    // watermarked operators drop later partitions' rows as late and
    // serialized drains partition-by-partition
    val root = Files.createTempDirectory("graft-stream-prop").toString
    val log = TopicLog.create(spark, root, "prop", 3)
    // backlogs 60 / 30 / 10
    log.produce(records(0 until 60), lit(0))
    log.produce(records(0 until 30), lit(1))
    log.produce(records(0 until 10), lit(2))
    val sb = new GraftTopicScanBuilder(log.topicDir,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("maxOffsetsPerTrigger", "20")))
    val stream = sb.build().toMicroBatchStream(s"$root/_cp")
      .asInstanceOf[org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl]
    val start = stream
      .asInstanceOf[org.apache.spark.sql.connector.read.streaming.MicroBatchStream]
      .initialOffset()
    val end = stream.latestOffset(start,
      org.apache.spark.sql.connector.read.streaming.ReadLimit.maxRows(20L))
      .asInstanceOf[GraftTopicStreamOffset].ends
    assert(end.values.sum === 20L, s"budget must be spent exactly: $end")
    // proportional floor: 60/100·20=12, 30/100·20=6, 10/100·20=2
    assert(end === Map(0 -> 12L, 1 -> 6L, 2 -> 2L),
      s"allocation must track backlog, got $end")
  }

  test("the partitions read option prunes streaming batch planning") {
    val root = Files.createTempDirectory("graft-stream-prune").toString
    val log = TopicLog.create(spark, root, "pr", 4)
    log.produce(records(0 until 40), Partitioners.byLongKey(4, col("i")))

    // plan directly through the stream: only partition 2's files
    val sb = new GraftTopicScanBuilder(log.topicDir,
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of("partitions", "2")))
    val stream = sb.build().toMicroBatchStream(s"$root/_cp0")
    val parts = stream.planInputPartitions(stream.initialOffset(), stream.latestOffset())
      .map(_.asInstanceOf[GraftTopicInputPartition].partition)
    assert(parts.nonEmpty && parts.forall(_ == 2),
      s"planned partitions ${parts.toSeq} — option did not prune")

    // end-to-end: the pruned stream delivers exactly partition 2
    val seen = mutable.ArrayBuffer.empty[(Int, String)]
    val q = spark.readStream.format("graft-topic")
      .option("partitions", "2")
      .load(log.topicDir)
      .writeStream
      .option("checkpointLocation", s"$root/_cp")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        seen.synchronized {
          seen ++= batch.select(col("partition"), col("value").cast("string"))
            .collect().map(r => (r.getInt(0), r.getString(1)))
        }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(seen.nonEmpty && seen.forall(_._1 == 2), s"leaked partitions: ${seen.take(5)}")
      assert(seen.size === 10)
    } finally q.stop()
  }

  test("manifest offset ranges prune batch planning to the trigger's window") {
    val root = Files.createTempDirectory("graft-range-prune").toString
    val log = TopicLog.create(spark, root, "rg", 1)
    // 5 produces → 5 files in partition 0 covering offsets [0,10),[10,20)...
    (0 until 5).foreach(i =>
      log.produce(records(i * 10 until i * 10 + 10), Partitioners.byLongKey(1, col("i"))))

    // a tailing micro-batch for offsets [40, 50) must plan ONLY the
    // file(s) overlapping that window — not all 5 historical files
    val sb = new GraftTopicScanBuilder(log.topicDir)
    val stream = sb.build().toMicroBatchStream(s"$root/_cp")
    val parts = stream.planInputPartitions(
      GraftTopicStreamOffset(Map(0 -> 40L)), GraftTopicStreamOffset(Map(0 -> 50L)))
    assert(parts.length === 1,
      s"planned ${parts.length} files for a 1-file window (no range pruning?)")

    // batch offset predicates prune at PLANNING too: offset >= 45
    // overlaps only the last file
    val bsb = new GraftTopicScanBuilder(log.topicDir)
    bsb.pushFilters(Array(
      org.apache.spark.sql.sources.GreaterThanOrEqual("offset", 45L)))
    val bparts = bsb.build().toBatch.planInputPartitions()
    assert(bparts.length === 1,
      s"batch planned ${bparts.length} files for a 1-file offset range")
    // and the data still reads correctly through the pruned plan
    val n = spark.read.format("graft-topic").load(log.topicDir)
      .filter(col("offset") >= 45).count()
    assert(n === 5)
  }

  test("stream offset json round-trips") {
    val o = GraftTopicStreamOffset(Map(0 -> 25L, 3 -> 7L))
    assert(GraftTopicStreamOffset.fromJson(o.json()) === o)
    assert(GraftTopicStreamOffset.fromJson("{}") === GraftTopicStreamOffset(Map.empty))
  }
}
