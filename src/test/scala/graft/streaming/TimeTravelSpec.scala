package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Time-travel reads over the CAS manifest history: every committed
  * version is a self-contained snapshot, so `readAt(v)` must
  * reproduce exactly the records version v listed — and vacuum's
  * history retirement must make retired versions answer EMPTY, never
  * silently substitute a neighbor.
  */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(ids: Range) =
    ids.map(i => (0, s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"),
      null: Map[String, Array[Byte]], 1700000000000L + i))

  test("readAt pins each commit's exact record set; head keeps moving") {
    val root = Files.createTempDirectory("graft-tt").toString
    val log = TopicLog.create(spark, root, "t1", 1)
    log.produceDirect(rows(0 until 4))
    val v1 = log.manifestVersions().max
    log.produceDirect(rows(4 until 10))
    val v2 = log.manifestVersions().max
    assert(v2 > v1)

    def keys(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(r => new String(r.getAs[Array[Byte]]("key"), "UTF-8"))
        .sorted.toSeq
    assert(keys(log.readAt(v1)) === (0 until 4).map(i => s"k$i"))
    assert(keys(log.readAt(v2)) === (0 until 10).map(i => s"k$i").sorted)
    assert(keys(log.read()) === keys(log.readAt(v2)),
      "head read ≡ the newest version's time travel")
    // a version that never existed answers empty, not an error
    assert(log.readAt(v2 + 100).count() === 0L)
  }

  test("DSv2 asOfVersion option pins the scan; pushdown still applies") {
    val root = Files.createTempDirectory("graft-tt3").toString
    val log = TopicLog.create(spark, root, "t3", 2)
    log.produceDirect(rows(0 until 4) ++
      rows(0 until 2).map(r => r.copy(_1 = 1)))
    val v1 = log.manifestVersions().max
    log.produceDirect(rows(4 until 8))
    val df = spark.read.format("graft-topic")
      .option("asOfVersion", v1.toString).load(s"$root/t3")
    assert(df.count() === 6L, "the pinned scan sees only batch 1")
    // partition pushdown composes with the pin
    assert(df.filter(org.apache.spark.sql.functions.col("partition") === 1)
      .count() === 2L)
    // head read (no option) sees everything
    assert(spark.read.format("graft-topic").load(s"$root/t3").count() === 10L)
    // unknown version plans an EMPTY scan
    assert(spark.read.format("graft-topic")
      .option("asOfVersion", (v1 + 999).toString).load(s"$root/t3")
      .count() === 0L)
  }

  test("SQL VERSION AS OF / TIMESTAMP AS OF through the catalog") {
    val root = Files.createTempDirectory("graft-tt4").toString
    val log = TopicLog.create(spark, root, "t4", 1)
    log.produceDirect(rows(0 until 3))
    val v1 = log.manifestVersions().max
    Thread.sleep(1100) // separate manifest mtimes for the ts leg
    val betw = java.time.Instant.now()
    Thread.sleep(1100)
    log.produceDirect(rows(3 until 8))
    spark.conf.set("spark.sql.catalog.ttcat", "graft.sources.GraftCatalog")
    spark.conf.set("spark.sql.catalog.ttcat.root", root)
    assert(spark.sql(s"SELECT count(*) FROM ttcat.t4 VERSION AS OF $v1")
      .head.getLong(0) === 3L)
    assert(spark.sql("SELECT count(*) FROM ttcat.t4").head.getLong(0) === 8L)
    val iso = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(betw)
    assert(spark.sql(
      s"SELECT count(*) FROM ttcat.t4 TIMESTAMP AS OF '$iso'")
      .head.getLong(0) === 3L,
      "a timestamp between the two commits must resolve to batch 1")
    // writes to a pinned table refuse
    val e = intercept[Exception] {
      spark.sql(s"INSERT INTO ttcat.t4 VERSION AS OF $v1 SELECT * FROM ttcat.t4")
    }
    assert(e.getMessage != null)
  }

  test("vacuum retires history: a retired version answers empty") {
    val root = Files.createTempDirectory("graft-tt2").toString
    val log = TopicLog.create(spark, root, "t2", 1)
    log.produceDirect(rows(0 until 3))
    val v1 = log.manifestVersions().max
    log.produceDirect(rows(3 until 6))
    log.produceDirect(rows(6 until 9))
    log.vacuum(keepManifests = 1, minAgeMs = 0L)
    assert(!log.manifestVersions().contains(v1),
      "vacuum(keep=1) must retire the batch-1 version")
    assert(log.readAt(v1).count() === 0L,
      "a vacuumed version answers empty — never a substituted snapshot")
    assert(log.read().count() === 9L, "the head is untouched by retirement")
  }
}
