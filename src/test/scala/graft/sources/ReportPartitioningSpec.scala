package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.{Partitioners, TopicLog}

/** The scan reports its on-disk clustering (KeyGroupedPartitioning on
  * `partition`, one key per input partition), so per-partition
  * aggregations over a topic run with NO shuffle — the fetch-side
  * "consumer lag per partition" shape at 100 TB. */
class ReportPartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("groupBy(partition) over a topic plans no exchange") {
    val saved = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val root = Files.createTempDirectory("graft-rp").toString
      val log = TopicLog.create(spark, root, "t", 4)
      val part = Partitioners.byLongKey(4, col("i"))
      def recs(r: Range) = r.toDF("i").select(col("i"),
        col("i").cast("string").cast("binary").as("value"))
      log.produce(recs(0 until 100), part)
      log.produce(recs(100 until 160), part) // several files per key group

      val agg = spark.read.format("graft-topic").load(log.topicDir)
        .groupBy("partition").agg(count(lit(1)).as("n"), max("offset").as("hi"))
      val rows = agg.collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted
      assert(rows.toSeq === (0 until 4).map(p => (p, 40L, 39L)))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"per-partition agg must not shuffle:\n$plan")
      assert(plan.contains("HashAggregate"), plan)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
      case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
    }
  }
}
