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
}
