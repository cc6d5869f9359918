package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.TopicLog

/** The measurement VERDICT r4 gated per-partition manifest sharding
  * on (SURVEY §9.15): how does produce latency move as the topic's
  * LIVE FILE COUNT grows, through the real manifest protocol (delta
  * commits, checkpoint snapshot every
  * [[graft.streaming.TopicLog.CheckpointInterval]] versions)?
  *
  * Method: many small produces into an 8-partition topic — each adds
  * 8 files and one manifest version — timing every produce; report
  * the median per live-file bucket, then compactFiles() and measure
  * the recovery. If the per-commit cost is flat across the measured
  * range, the full-snapshot manifest (not a per-partition sharded
  * one) is the right design at this scale, and the growth slope
  * says where that stops being true.
  *
  * Usage: tools/run.sh graft.tools.ManifestScaleBench [nProduces=400] */
object ManifestScaleBench {
  def main(args: Array[String]): Unit = {
    val nProduces = args.headOption.map(_.toInt).getOrElse(400)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val root = Files.createTempDirectory("graft-manifest-scale").toString
    val log = TopicLog.create(spark, root, "files", 8)
    // one tiny batch, reused: the timing target is the manifest
    // protocol + file commit, not row volume
    val batch = (0 until 64)
      .map(i => (s"k$i".getBytes("UTF-8"), s"v$i".getBytes("UTF-8")))
      .toDF("key", "value")
      .withColumn("headers", lit(null).cast("map<string,binary>"))
      .withColumn("ts", current_timestamp())
      .persist()
    batch.count()

    val times = new Array[Double](nProduces)
    var i = 0
    while (i < nProduces) {
      val t0 = System.nanoTime()
      log.produce(batch, partitioner = pmod(xxhash64(col("key")), lit(8)))
      times(i) = (System.nanoTime() - t0) / 1e6
      i += 1
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; s(s.length / 2)
    }
    val bucket = math.max(1, nProduces / 8)
    println(f"${"produces"}%10s ${"live_files"}%12s ${"median_ms"}%10s")
    (0 until nProduces by bucket).foreach { start =>
      val end = math.min(nProduces, start + bucket)
      println(f"${s"$start..${end - 1}"}%10s ${(end - 1) * 8 + 8}%12d " +
        f"${median(times.slice(start, end).toSeq)}%10.1f")
    }

    val liveBefore = log.read().inputFiles.length
    val t1 = System.nanoTime()
    log.compactFiles()
    val compactSec = (System.nanoTime() - t1) / 1e9
    val liveAfter = log.read().inputFiles.length
    val t2 = System.nanoTime()
    log.produce(batch, partitioner = pmod(xxhash64(col("key")), lit(8)))
    val afterMs = (System.nanoTime() - t2) / 1e6
    println(f"compactFiles: $liveBefore files -> $liveAfter in $compactSec%.1f s; " +
      f"next produce $afterMs%.1f ms")
    println(s"rows intact: ${log.read().count()} == ${(nProduces + 1) * 64}")
    spark.stop()
  }
}
