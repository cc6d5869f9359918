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

  test("ALTER TABLE SET TBLPROPERTIES writes topic configs; UNSET removes; bad values rejected") {
    assert(root.nonEmpty)
    spark.sql("ALTER TABLE graft.clicks SET TBLPROPERTIES(" +
      "'retention.ms'='3600000', 'cleanup.policy'='compact')")
    // the SQL write landed in the SAME store the wire/enforcement
    // hooks read
    assert(TopicLog.configOverrides(root, "clicks") ===
      Map("retention.ms" -> "3600000", "cleanup.policy" -> "compact"))
    // SHOW TBLPROPERTIES reads them back, plus the partition count
    val props = spark.sql("SHOW TBLPROPERTIES graft.clicks").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props.get("retention.ms") === Some("3600000"))
    assert(props.get("partitions") === Some("4"))
    // UNSET removes the override (back to the broker default)
    spark.sql("ALTER TABLE graft.clicks UNSET TBLPROPERTIES('cleanup.policy')")
    assert(TopicLog.configOverrides(root, "clicks") ===
      Map("retention.ms" -> "3600000"))
    // the wire validator guards this door too
    val bad = intercept[Exception] {
      spark.sql("ALTER TABLE graft.clicks SET TBLPROPERTIES('nope'='1')")
    }
    assert(bad.getMessage.contains("unknown topic config"))
    val badVal = intercept[Exception] {
      spark.sql("ALTER TABLE graft.clicks SET TBLPROPERTIES(" +
        "'retention.ms'='soon')")
    }
    assert(badVal.getMessage.contains("invalid value"))
    // schema/column changes stay impossible
    intercept[Exception] {
      spark.sql("ALTER TABLE graft.clicks ADD COLUMN extra INT")
    }
    spark.sql("ALTER TABLE graft.clicks UNSET TBLPROPERTIES('retention.ms')")
    assert(TopicLog.configOverrides(root, "clicks") === Map.empty)
  }

  test("INSERT INTO runs a real produce: routing honored, offsets assigned") {
    assert(root.nonEmpty)
    spark.sql("CREATE TABLE graft.ins TBLPROPERTIES ('partitions'='4')")
    // offset values in the INSERT are placeholders — the log assigns
    // real coordinates, like a broker ignoring producer offsets
    spark.sql(
      """INSERT INTO graft.ins
        |SELECT cast(cast(id AS string) AS binary) AS key,
        |       cast(concat('p', id) AS binary) AS value,
        |       map('h', cast('x' AS binary)) AS headers,
        |       current_timestamp() AS ts,
        |       cast(id % 4 AS int) AS partition,
        |       cast(999 AS bigint) AS offset
        |FROM range(0, 40)""".stripMargin)
    val rows = spark.sql(
      "SELECT partition, offset FROM graft.ins ORDER BY partition, offset").collect()
      .map(r => (r.getInt(0), r.getLong(1)))
    assert(rows.length === 40)
    // routing: id % 4 → 10 records per partition; offsets contiguous from 0
    (0 until 4).foreach { p =>
      assert(rows.filter(_._1 == p).map(_._2).toSeq === (0L until 10L), s"partition $p")
    }
    // a second INSERT continues each partition's log end
    spark.sql(
      """INSERT INTO graft.ins
        |SELECT cast('k' AS binary), cast('v' AS binary), map('h', cast('y' AS binary)),
        |       current_timestamp(), cast(1 AS int), cast(0 AS bigint)
        |FROM range(0, 3)""".stripMargin)
    val p1 = spark.sql("SELECT offset FROM graft.ins WHERE partition = 1 ORDER BY offset")
      .collect().map(_.getLong(0))
    assert(p1.toSeq === (0L until 13L))
    // headers survived the staged write
    val h = spark.sql(
      "SELECT cast(headers['h'] AS string) FROM graft.ins WHERE partition = 0 LIMIT 1")
      .collect()(0).getString(0)
    assert(h === "x")
    spark.sql("DROP TABLE graft.ins")
  }

  test("INSERT with NULL partition routes by key hash, not pinned to partition 0") {
    assert(root.nonEmpty)
    spark.sql("CREATE TABLE graft.insnull TBLPROPERTIES ('partitions'='4')")
    spark.sql(
      """INSERT INTO graft.insnull
        |SELECT cast(cast(id AS string) AS binary) AS key,
        |       cast(concat('p', id) AS binary) AS value,
        |       cast(null AS map<string, binary>) AS headers,
        |       current_timestamp() AS ts,
        |       cast(null AS int) AS partition,
        |       cast(0 AS bigint) AS offset
        |FROM range(0, 200)""".stripMargin)
    val byPart = spark.sql("SELECT partition, count(*) AS n FROM graft.insnull GROUP BY 1")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byPart.values.sum === 200L)
    // key-hash routing spreads 200 distinct keys across partitions —
    // the bug pinned ALL unrouted records to partition 0
    assert(byPart.size > 1, s"all records pinned to one partition: $byPart")
    assert(byPart.getOrElse(0, 0L) < 200L)
    // routing matches the library producer's default exactly
    val expected = spark.range(0, 200)
      .select(col("id").cast("string").cast("binary").as("key"))
      .select(graft.streaming.Partitioners.byKeyHash(4).as("p"))
      .groupBy("p").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byPart === expected)
    spark.sql("DROP TABLE graft.insnull")
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
