package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.streaming.{Partitioners, TopicLog}

/** Topics as SQL tables via the graft catalog: SHOW/SELECT/CREATE/
  * DROP, with the DSv2 pushdown intact through the SQL path. */
class GraftCatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft-catalog").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.root", r)
    val log = TopicLog.create(spark, r, "clicks", 4)
    log.produce(
      (0 until 100).toDF("i").select(
        col("i"),
        col("i").cast("string").cast("binary").as("key"),
        concat(lit("v"), col("i").cast("string")).cast("binary").as("value")),
      Partitioners.byLongKey(4, col("i")))
    r
  }

  test("SELECT over a topic table, with pushdown through the SQL path") {
    assert(root.nonEmpty)
    val n = spark.sql("SELECT count(*) FROM graft.clicks").collect()(0).getLong(0)
    assert(n === 100)
    val sliced = spark.sql(
      "SELECT offset FROM graft.clicks WHERE partition = 2 AND offset >= 10 ORDER BY offset")
    assert(sliced.collect().map(_.getLong(0)).toSeq === (10L until 25L))
    val plan = sliced.queryExecution.executedPlan.toString
    assert(plan.contains("GraftTopicScan") && plan.contains("EqualTo(partition,2)"), plan)
  }

  test("SHOW TABLES lists topics; CREATE/DROP manage them") {
    assert(root.nonEmpty)
    val before = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1))
    assert(before.contains("clicks"))
    spark.sql("CREATE TABLE graft.audit TBLPROPERTIES ('partitions'='16')")
    assert(TopicLog.exists(root, "audit"))
    assert(TopicLog.open(spark, root, "audit").numPartitions === 16)
    assert(spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).contains("audit"))
    spark.sql("DROP TABLE graft.audit")
    assert(!TopicLog.exists(root, "audit"))
  }

  test("reads through SQL see the manifest snapshot, not orphans") {
    assert(root.nonEmpty)
    val log = TopicLog.open(spark, root, "clicks")
    log.failpointBeforeCommit = true
    intercept[IllegalStateException] {
      log.produce(Seq((1000, "x")).toDF("i", "s")
        .select(col("i"), col("s").cast("binary").as("value")),
        Partitioners.byLongKey(4, col("i")))
    }
    log.failpointBeforeCommit = false
    assert(spark.sql("SELECT count(*) FROM graft.clicks").collect()(0).getLong(0) === 100)
    log.vacuum()
  }
}
