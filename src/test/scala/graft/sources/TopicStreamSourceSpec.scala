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

  test("stream offset json round-trips") {
    val o = GraftTopicStreamOffset(Map(0 -> 25L, 3 -> 7L))
    assert(GraftTopicStreamOffset.fromJson(o.json()) === o)
    assert(GraftTopicStreamOffset.fromJson("{}") === GraftTopicStreamOffset(Map.empty))
  }
}
