package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.{Partitioners, TopicLog}

/** The `graft-topic` DataSource V2 relation: full-fidelity reads of
  * the record model, exact partition/offset pushdown (dir pruning +
  * parquet filters), and column pruning reaching the file reader. */
class GraftTopicSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def records(ids: Range) =
    ids.toDF("i").select(
      col("i"),
      concat(lit("k"), col("i").cast("string")).cast("binary").as("key"),
      concat(lit("v"), col("i").cast("string")).cast("binary").as("value"),
      map(lit("h1"), concat(lit("x"), (col("i") % 3).cast("string")).cast("binary"),
        lit("h2"), lit("const").cast("binary")).as("headers"),
      timestamp_seconds(lit(1700000000L) + col("i")).as("ts"))

  private lazy val topicDir: String = {
    val root = Files.createTempDirectory("graft-dsv2").toString
    val log = TopicLog.create(spark, root, "t", 4)
    val part = Partitioners.byLongKey(4, col("i"))
    log.produce(records(0 until 200), part)
    log.produce(records(200 until 300), part) // second file per partition dir
    log.topicDir
  }

  private def dsv2 = spark.read.format("graft-topic").load(topicDir)

  test("full read matches the parquet-path read, including headers and ts") {
    val viaSource = dsv2
      .select("partition", "offset", "key", "value", "headers", "ts")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        new String(r.getAs[Array[Byte]]("key")),
        new String(r.getAs[Array[Byte]]("value")),
        r.getAs[Map[String, Array[Byte]]]("headers").view.mapValues(new String(_)).toMap,
        r.getTimestamp(5)))
      .sortBy(x => (x._1, x._2))
    val viaParquet = TopicLog.open(spark, topicDir.stripSuffix("/t"), "t").read()
      .select("partition", "offset", "key", "value", "headers", "ts")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1),
        new String(r.getAs[Array[Byte]]("key")),
        new String(r.getAs[Array[Byte]]("value")),
        r.getAs[Map[String, Array[Byte]]]("headers").view.mapValues(new String(_)).toMap,
        r.getTimestamp(5)))
      .sortBy(x => (x._1, x._2))
    assert(viaSource.length === 300)
    assert(viaSource === viaParquet)
  }

  test("partition pushdown prunes to one directory; partition = unit of parallelism") {
    val filtered = dsv2.filter(col("partition") === 2)
    // the scan reports KeyGroupedPartitioning on `partition`, so Spark
    // groups that partition's files into ONE task — the Kafka model
    // (a partition is the unit of consume parallelism); the other
    // three partitions' files are never planned at all
    assert(filtered.rdd.getNumPartitions === 1)
    assert(filtered.count() === 75)
    assert(dsv2.rdd.getNumPartitions === 4, "one task per topic-partition")
  }

  test("offset range pushdown is exact and appears in the plan") {
    val q = dsv2.filter(col("partition") === 1 && col("offset") >= 10 && col("offset") < 20)
      .select("partition", "offset", "key")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopicScan"), plan)
    assert(plan.contains("EqualTo(partition,1)"), plan)
    assert(plan.contains("GreaterThanOrEqual(offset,10)"), plan)
    assert(plan.contains("LessThan(offset,20)"), plan)
    val rows = q.collect().map(r => (r.getInt(0), r.getLong(1))).sorted
    assert(rows.toSeq === (10L until 20L).map(o => (1, o)))
  }

  test("column pruning reaches the scan") {
    val q = dsv2.filter(col("partition") === 0).select("offset")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<offset:bigint>"), plan)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq === (0L until 75L))
  }

  test("offsets beyond the log end return empty, not an error") {
    assert(dsv2.filter(col("offset") >= 1000000).count() === 0)
  }

  test("sql surface: topics are addressable as tables") {
    dsv2.createOrReplaceTempView("topic_t")
    val n = spark.sql(
      "SELECT COUNT(*) FROM topic_t WHERE partition = 3 AND offset < 5").collect()(0).getLong(0)
    assert(n === 5)
  }
}
