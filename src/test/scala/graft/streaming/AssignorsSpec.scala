package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class AssignorsSpec extends AnyFunSuite {

  test("range assignor: contiguous spans, remainder to the first members") {
    val a = Assignors.range(7, Seq("c2", "c1", "c3"))
    assert(a("c1") === Seq(0, 1, 2))
    assert(a("c2") === Seq(3, 4))
    assert(a("c3") === Seq(5, 6))
    assert(a.values.flatten.toSeq.sorted === (0 until 7))
  }

  test("round-robin assignor deals partitions across sorted members") {
    val a = Assignors.roundRobin(5, Seq("b", "a"))
    assert(a("a") === Seq(0, 2, 4))
    assert(a("b") === Seq(1, 3))
    // more members than partitions → some get nothing, none lost
    val b = Assignors.roundRobin(2, Seq("x", "y", "z"))
    assert(b.values.flatten.toSeq.sorted === Seq(0, 1))
    assert(b.keySet === Set("x", "y", "z"))
  }

  test("rebalance reports exactly the partitions that moved") {
    val (after, moved) = Assignors.rebalance(6, Seq("c1", "c2"), Seq("c1", "c2", "c3"))
    assert(after.values.flatten.toSeq.sorted === (0 until 6))
    assert(moved.nonEmpty)
    // partitions that stayed with the same owner are not reported
    val (_, none) = Assignors.rebalance(6, Seq("c1", "c2"), Seq("c1", "c2"))
    assert(none === Set.empty)
  }

  test("streaming dedup: duplicate records collapse within the watermark") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDF().toDF("event_id", "payload")
      .withColumn("ts", current_timestamp())
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"), (1L, "a-dup"))
      q.processAllAvailable()
      mem.addData((2L, "b-dup"), (3L, "c"))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(ids === Array(1L, 2L, 3L), "one row per event_id within watermark")
    } finally q.stop()
  }
}
