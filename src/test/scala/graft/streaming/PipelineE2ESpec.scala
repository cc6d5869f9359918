package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end broker flows: topic→topic streaming ETL and
  * export/import round-trips — the consumer-transform-producer loop
  * the reference broker exists to serve. */
class PipelineE2ESpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmpRoot(): String = Files.createTempDirectory("graft-e2e").toString

  private def records(ids: Range) =
    ids.toDF("i").select(
      col("i"),
      (col("i") % 7).cast("string").cast("binary").as("key"),
      concat(lit("payload-"), col("i").cast("string")).cast("binary").as("value"))

  test("topic -> transform -> topic streaming pipeline delivers continuously") {
    val root = tmpRoot()
    val b = new Broker(spark, root)
    val src = b.createTopic("raw", 2)
    val dst = b.createTopic("enriched", 2)

    src.produce(records(0 until 30), Partitioners.byLongKey(2, col("i")))
    // the ETL: tail raw, uppercase the payload, produce into enriched
    val q = dst.produceStream(
      src.readStream()
        .select(col("key"),
          upper(col("value").cast("string")).cast("binary").as("value")),
      s"$root/_cp_etl")
    try {
      q.processAllAvailable()
      assert(dst.read().count() === 30)
      src.produce(records(30 until 50), Partitioners.byLongKey(2, col("i")))
      q.processAllAvailable()
      assert(dst.read().count() === 50)
      val sample = dst.read().select(col("value").cast("string")).limit(5)
        .collect().map(_.getString(0))
      assert(sample.forall(_.startsWith("PAYLOAD-")))
      // enriched topic has its own offset space, contiguous per partition
      val ends = dst.logEndOffsets()
      assert(ends.values.sum === 50)
    } finally q.stop()
  }

  test("export/import round-trips a topic through json, csv, parquet — headers lossless") {
    val root = tmpRoot()
    val b = new Broker(spark, root)
    val t0 = b.createTopic("orig", 2)
    t0.produce(records(0 until 25)
      .withColumn("headers", map(
        lit("route"), concat(lit("r"), (col("i") % 3).cast("string")).cast("binary"),
        lit("trace"), col("i").cast("string").cast("binary"))))
    def headerMap(log: TopicLog): Map[String, Map[String, String]] =
      log.read().select(col("value").cast("string"), col("headers")).collect()
        .map(r => r.getString(0) ->
          r.getAs[Map[String, Array[Byte]]]("headers").view.mapValues(new String(_)).toMap)
        .toMap
    val expected = headerMap(t0)
    assert(expected("payload-7") === Map("route" -> "r1", "trace" -> "7"))
    for (fmt <- Seq("parquet", "json", "csv")) {
      b.exportTopic("orig", s"$root/export_$fmt", fmt)
      val imported = b.importTopic(s"roundtrip_$fmt", s"$root/export_$fmt", fmt, 2)
      assert(imported.read().count() === 25, fmt)
      val vals = imported.read().select(col("value").cast("string"))
        .collect().map(_.getString(0)).sorted
      assert(vals.toSeq === (0 until 25).map(i => s"payload-$i").sorted, fmt)
      assert(headerMap(imported) === expected, s"headers lost in $fmt round-trip")
    }
  }

  test("group offsets export/import migrates consumer progress with the data") {
    val root = tmpRoot()
    val b = new Broker(spark, root)
    val t0 = b.createTopic("mig", 2)
    t0.produce(records(0 until 20))
    t0.commit("readers", Map(0 -> 5L, 1 -> 9L))
    t0.commit("audit", Map(1 -> 2L))

    b.exportTopic("mig", s"$root/mig_data", "parquet")
    b.exportGroups("mig", s"$root/mig_groups")

    val b2root = tmpRoot()
    val b2 = new Broker(spark, b2root)
    b2.importTopic("mig", s"$root/mig_data", "parquet", 2)
    // destination already has some progress — import must MERGE, not clobber
    b2.topic("mig").commit("audit", Map(0 -> 4L))
    b2.importGroups("mig", s"$root/mig_groups")

    assert(b2.topic("mig").committed("readers") === Map(0 -> 5L, 1 -> 9L))
    assert(b2.topic("mig").committed("audit") === Map(0 -> 4L, 1 -> 2L))
    assert(b2.topic("mig").listGroups().sorted === Seq("audit", "readers"))

    // a topic with NO groups exports an empty dataset; import must
    // no-op, not crash on the column-less frame
    b.createTopic("mig0", 1)
    b.exportGroups("mig0", s"$root/mig0_groups")
    b2.createTopic("mig0", 1)
    b2.importGroups("mig0", s"$root/mig0_groups")
    assert(b2.topic("mig0").listGroups().isEmpty)
  }

  test("header routing: consumers filter and fan out on header values") {
    val root = tmpRoot()
    val b = new Broker(spark, root)
    val src = b.createTopic("routed", 2)
    src.produce(records(0 until 30)
      .withColumn("headers", map(
        lit("route"), concat(lit("r"), (col("i") % 3).cast("string")).cast("binary"))))
    // batch: header-predicate fetch through the DSv2 relation
    val viaSource = spark.read.format("graft-topic").load(src.topicDir)
      .filter(col("headers").getItem("route").cast("string") === "r1")
    assert(viaSource.count() === 10)
    // streaming: route records into per-route topics by header value
    val dst = b.createTopic("routed_r1", 2)
    val q = dst.produceStream(
      src.readStream()
        .filter(col("headers").getItem("route").cast("string") === "r1")
        .select("key", "value", "headers"),
      s"$root/_cp_route")
    try {
      q.processAllAvailable()
      assert(dst.read().count() === 10)
      val traces = dst.read()
        .select(col("headers").getItem("route").cast("string")).collect()
      assert(traces.forall(_.getString(0) == "r1"))
    } finally q.stop()
  }
}
