package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.{Partitioners, TopicLog}

/** The DSv2 STREAMING sink: `writeStream.format("graft-topic")` runs a
  * real produce per epoch through the manifest protocol, with the
  * epoch id as the committed batch id — replayed epochs are skipped
  * (effectively exactly-once), and NULL partitions key-hash route,
  * exactly like the batch INSERT path. */
class GraftTopicSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sinkDf(mem: MemoryStream[(Int, String)]) =
    mem.toDF().select(
      col("_1").cast("string").cast("binary").as("key"),
      col("_2").cast("binary").as("value"),
      lit(null).cast("map<string, binary>").as("headers"),
      current_timestamp().as("ts"),
      lit(null).cast("int").as("partition"),
      lit(0L).as("offset"))

  test("writeStream produces per-epoch with contiguous offsets and key-hash routing") {
    val root = Files.createTempDirectory("graft-sink").toString
    val log = TopicLog.create(spark, root, "snk", 4)
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Int, String)]

    val q = sinkDf(mem).writeStream
      .format("graft-topic")
      .option("path", log.topicDir)
      .option("checkpointLocation", s"$root/_cp")
      .start()
    try {
      mem.addData((0 until 30).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      assert(log.read().count() === 30)

      mem.addData((30 until 50).map(i => (i, s"v$i")): _*)
      q.processAllAvailable()
      assert(log.read().count() === 50)
    } finally q.stop()

    // offsets contiguous per partition, no duplicates
    val per = log.read().groupBy("partition")
      .agg(count(lit(1)).as("n"), countDistinct("offset").as("d"),
        min("offset").as("lo"), max("offset").as("hi")).collect()
    assert(per.map(_.getAs[Long]("n")).sum === 50L)
    per.foreach { r =>
      assert(r.getAs[Long]("d") === r.getAs[Long]("n"), "duplicate offsets")
      assert(r.getAs[Long]("lo") === 0L)
      assert(r.getAs[Long]("hi") === r.getAs[Long]("n") - 1L)
    }

    // NULL partition → key-hash routing (the producer default), not
    // everything pinned to partition 0
    val routed = log.read()
      .select(col("key").cast("string").cast("int").as("i"), col("partition"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val expected = spark.range(0, 50)
      .select(col("id").cast("string").cast("binary").as("key"))
      .select(col("key").cast("string").cast("int").as("i"),
        Partitioners.byKeyHash(4).as("p"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    assert(routed === expected)

    // the epoch ids landed as manifest batch ids (exactly-once handle)
    assert(log.logEndOffsets().values.sum === 50L)
  }

  test("a second streaming query's restarted epochs are not mistaken for replays") {
    val root = Files.createTempDirectory("graft-sink2").toString
    val log = TopicLog.create(spark, root, "two", 2)
    implicit val sc = spark.sqlContext

    // query A writes epochs 0..N
    val memA = MemoryStream[(Int, String)]
    val qA = sinkDf(memA).writeStream.format("graft-topic")
      .option("path", log.topicDir)
      .option("checkpointLocation", s"$root/_cpA").start()
    try {
      memA.addData((0 until 10).map(i => (i, s"a$i")): _*)
      qA.processAllAvailable()
    } finally qA.stop()
    assert(log.read().count() === 10)

    // query B: fresh checkpoint, epochs restart at 0 — with a
    // topic-global batch slot every batch would be silently dropped
    val memB = MemoryStream[(Int, String)]
    val qB = sinkDf(memB).writeStream.format("graft-topic")
      .option("path", log.topicDir)
      .option("checkpointLocation", s"$root/_cpB").start()
    try {
      memB.addData((100 until 105).map(i => (i, s"b$i")): _*)
      qB.processAllAvailable()
    } finally qB.stop()
    assert(log.read().count() === 15, "second query's epochs were dropped as replays")
    val vals = log.read().select(col("value").cast("string")).collect()
      .map(_.getString(0)).toSet
    assert((100 until 105).forall(i => vals.contains(s"b$i")))
  }
}
