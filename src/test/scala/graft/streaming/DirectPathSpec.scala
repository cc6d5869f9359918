package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The driver-direct storage paths (no Spark job): `produceDirect`
  * (parquet-hadoop writer + the same CAS commit as produce()) and
  * `consumeDirect`/`consumeForWire` (manifest-range-pruned parquet
  * reads). The invariant under test is INTERCHANGEABILITY: records
  * written by either path read identically through BOTH the Spark
  * reader and the direct reader — offsets, keys, values, headers,
  * timestamps — including topics whose files MIX the two vintages
  * (Spark INT96 timestamps beside direct INT64 micros). */
class DirectPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpRoot(): String =
    Files.createTempDirectory("graft-direct").toString

  private def directRows(ids: Range, p: Int = 0)
      : Seq[(Int, Array[Byte], Array[Byte], Map[String, Array[Byte]], Long)] =
    ids.map { i =>
      (p, s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8"),
        if (i % 3 == 0) Map("h1" -> s"x$i".getBytes("UTF-8"), "h0" -> null)
        else null,
        1700000000000L + i)
    }

  test("produceDirect round-trips through the Spark reader") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "d1", 2)
    val ends = log.produceDirect(
      directRows(0 until 10, p = 0) ++ directRows(0 until 5, p = 1))
    assert(ends === Map(0 -> 10L, 1 -> 5L))

    val rows = log.read().orderBy("partition", "offset").collect()
    assert(rows.length === 15)
    val r3 = rows(3) // partition 0, offset 3
    assert(r3.getAs[Int]("partition") === 0)
    assert(r3.getAs[Long]("offset") === 3L)
    assert(new String(r3.getAs[Array[Byte]]("key"), "UTF-8") === "k3")
    assert(new String(r3.getAs[Array[Byte]]("value"), "UTF-8") === "v3")
    val h3 = r3.getAs[Map[String, Array[Byte]]]("headers")
    assert(h3.keySet === Set("h0", "h1"))
    assert(h3("h0") === null)
    assert(new String(h3("h1"), "UTF-8") === "x3")
    assert(r3.getAs[java.sql.Timestamp]("ts").getTime === 1700000000003L)
    // non-multiple-of-3 rows carry a NULL headers map
    assert(rows(4).isNullAt(rows(4).fieldIndex("headers")))
  }

  test("mixed Spark and direct files read identically through both readers") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "d2", 1)
    // vintage 1: the Spark path (INT96 timestamps)
    log.produce(
      (0 until 6).toDF("i").select(
        concat(lit("sk"), col("i")).cast("binary").as("key"),
        concat(lit("sv"), col("i")).cast("binary").as("value"),
        lit(new java.sql.Timestamp(1700000100000L)).as("ts")),
      Partitioners.byLongKey(1, lit(0L)))
    // vintage 2: the direct path (INT64 micros)
    log.produceDirect(directRows(6 until 12))
    assert(log.logEndOffsets() === Map(0 -> 12L))

    // Spark reader sees one coherent log across vintages
    val sparkRows = log.consume(0, 0)
      .select("offset", "key", "value", "ts").collect()
    assert(sparkRows.map(_.getAs[Long]("offset")).toSeq === (0L until 12L))
    assert(new String(sparkRows(7).getAs[Array[Byte]]("value"), "UTF-8") === "v7")
    assert(sparkRows(3).getAs[java.sql.Timestamp]("ts").getTime === 1700000100000L)
    assert(sparkRows(7).getAs[java.sql.Timestamp]("ts").getTime === 1700000000007L)

    // direct reader agrees byte-for-byte
    val direct = log.consumeDirect(0, 0, 100).get
    assert(direct.map(_.offset) === (0L until 12L))
    assert(direct(3).timestampMs === 1700000100000L)
    assert(direct(7).timestampMs === 1700000000007L)
    assert(new String(direct(0).key, "UTF-8") === "sk0")
    assert(new String(direct(11).value, "UTF-8") === "v11")
    assert(direct(9).headers.map { case (k, _) => k } === Seq("h0", "h1"))
  }

  test("consumeDirect range semantics match consume() across files") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "d3", 1)
    // five produce calls -> five files, ranges [0,9], [10,19], ...
    (0 until 5).foreach(b => log.produceDirect(directRows(b * 10 until (b + 1) * 10)))
    assert(log.logEndOffsets() === Map(0 -> 50L))

    def sparkOffsets(from: Long, max: Int): Seq[Long] =
      log.consume(0, from, max).select("offset").collect()
        .map(_.getLong(0)).toSeq

    // window spanning a file boundary
    assert(log.consumeDirect(0, 7, 6).get.map(_.offset) === (7L until 13L))
    assert(sparkOffsets(7, 6) === (7L until 13L))
    // maxRecords caps mid-file; later files never contribute
    assert(log.consumeDirect(0, 0, 3).get.map(_.offset) === Seq(0L, 1L, 2L))
    // explicit toOffset bound
    assert(log.consumeDirect(0, 15, 100, toOffset = 22L).get
      .map(_.offset) === (15L to 22L))
    // past the end: empty, not an error
    assert(log.consumeDirect(0, 99, 10).get.isEmpty)
    // empty/invalid windows
    assert(log.consumeDirect(0, 5, 0).get.isEmpty)
    assert(log.consumeDirect(0, 9, 10, toOffset = 3L).get.isEmpty)
    // consumeForWire serves the same rows
    assert(log.consumeForWire(0, 7, 6).map(_.offset) === (7L until 13L))
  }

  test("produceDirect respects the CAS protocol: interleaved with produce()") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "d4", 2)
    log.produceDirect(directRows(0 until 4, p = 0))
    log.produce(
      (0 until 6).toDF("i").select(col("i"),
        concat(lit("k"), col("i")).cast("binary").as("key"),
        concat(lit("v"), col("i")).cast("binary").as("value")),
      Partitioners.byLongKey(2, col("i"))) // 3 per partition
    log.produceDirect(directRows(0 until 2, p = 1))
    val ends = log.logEndOffsets()
    assert(ends === Map(0 -> 7L, 1 -> 5L))
    // no gaps, no dups, per partition
    val chk = log.read().groupBy("partition")
      .agg(count(lit(1)).as("n"), countDistinct("offset").as("d"),
        max("offset").as("hi")).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(chk(0) === ((7L, 7L, 6L)))
    assert(chk(1) === ((5L, 5L, 4L)))
    // a request listing one partition twice appends in request order
    val before = log.logEndOffsets()(0)
    log.produceDirect(Seq(
      (0, "a".getBytes, "first".getBytes, null, 1L),
      (0, "b".getBytes, "second".getBytes, null, 2L)))
    val tail = log.consumeForWire(0, before, 10)
    assert(tail.map(r => new String(r.value, "UTF-8")) ===
      Seq("first", "second"))
  }

  test("readStream tails direct-written files beside Spark-written ones") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "d6", 1)
    log.produceDirect(directRows(0 until 8))
    val q = log.readStream()
      .groupBy("partition").agg(count(lit(1)).as("n"), max("ts").as("m"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("d6_counts")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.table("d6_counts").collect()(0).getLong(1) === 8L)
      // a Spark-vintage produce lands in the NEXT micro-batch
      log.produce(
        (0 until 5).toDF("i").select(
          concat(lit("k"), col("i")).cast("binary").as("key"),
          concat(lit("v"), col("i")).cast("binary").as("value")),
        Partitioners.byLongKey(1, lit(0L)))
      q.processAllAvailable()
      val r = spark.table("d6_counts").collect()(0)
      assert(r.getLong(1) === 13L)
      // the direct files' INT64 timestamps decoded through the
      // streaming (DSv2) reader too
      assert(r.getAs[java.sql.Timestamp]("m").getTime >= 1700000000007L)
    } finally q.stop()
  }

  test("crash before produceDirect's manifest commit: orphans invisible, retry exact") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "d7", 1)
    log.produceDirect(directRows(0 until 6))
    val endsBefore = log.logEndOffsets()

    log.failpointBeforeCommit = true
    intercept[IllegalStateException] { log.produceDirect(directRows(6 until 10)) }
    log.failpointBeforeCommit = false

    // cold reopen: the crashed append is invisible everywhere — same
    // CAS guarantee as the Spark path (ManifestSpec's leg)
    val reopened = TopicLog.open(spark, root, "d7")
    assert(reopened.logEndOffsets() === endsBefore)
    assert(reopened.read().count() === 6)
    assert(reopened.consumeDirect(0, 0, 100).get.map(_.offset) === (0L until 6L))
    // the moved-but-uncommitted files vacuum as orphans
    assert(reopened.vacuum(minAgeMs = 0) > 0)
    // the retry lands exactly once, offsets contiguous
    reopened.produceDirect(directRows(6 until 10))
    assert(reopened.consumeDirect(0, 0, 100).get.map(_.offset) === (0L until 10L))
    assert(reopened.consumeForWire(0, 6, 10).map(r =>
      new String(r.value, "UTF-8")) === Seq("v6", "v7", "v8", "v9"))
  }

  test("produceDirect rejects out-of-range partitions without committing") {
    val root = tmpRoot()
    val log = TopicLog.create(spark, root, "d5", 1)
    intercept[IllegalArgumentException] {
      log.produceDirect(Seq((1, "k".getBytes, "v".getBytes, null, 1L)))
    }
    assert(log.logEndOffsets().getOrElse(0, 0L) === 0L)
    assert(log.read().count() === 0L)
  }
}
