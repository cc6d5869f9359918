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

  test("export/import round-trips a topic through json, csv, parquet") {
    val root = tmpRoot()
    val b = new Broker(spark, root)
    val t0 = b.createTopic("orig", 2)
    t0.produce(records(0 until 25))
    for (fmt <- Seq("parquet", "json", "csv")) {
      b.exportTopic("orig", s"$root/export_$fmt", fmt)
      val imported = b.importTopic(s"roundtrip_$fmt", s"$root/export_$fmt", fmt, 2)
      assert(imported.read().count() === 25, fmt)
      val vals = imported.read().select(col("value").cast("string"))
        .collect().map(_.getString(0)).sorted
      assert(vals.toSeq === (0 until 25).map(i => s"payload-$i").sorted, fmt)
    }
  }
}
