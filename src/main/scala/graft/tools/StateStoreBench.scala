package graft.tools

import org.apache.spark.sql.SparkSession

/** Measures the stream_exec drains under the HDFS-backed (default)
  * vs RocksDB state store providers — round-11 verdict directive 3:
  * state-store commits dominate the drains' cost at 10×, so measure
  * whether RocksDB pays for itself at this scale instead of assuming.
  *
  * Usage: tools/run.sh graft.tools.StateStoreBench <sfDir> [provider]
  * where provider ∈ {hdfs, rocksdb}. Prints one JSON line with the
  * min-of-two wall per query (same discipline as graft.Bench).
  */
object StateStoreBench {
  private val Drains = Seq("stream_exec_tumbling", "stream_exec_sliding",
    "stream_exec_dedup", "stream_exec_dedup_watermarked",
    "stream_exec_join", "stream_exec_join_watermarked",
    "stream_exec_session_watermarked")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf1")
    val provider = if (args.length > 1) args(1) else "hdfs"
    require(provider == "hdfs" || provider == "rocksdb",
      s"provider must be hdfs|rocksdb, got '$provider' (a typo would " +
        "silently benchmark the default store under the wrong label)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (provider == "rocksdb")
      b.config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // first touch materializes the topic — do it untimed
    timeOnce("stream_exec_tumbling")
    val results = Drains.map { n =>
      n -> math.min(timeOnce(n), timeOnce(n))
    }
    def fmt(v: Double) =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(s"""{"provider":"$provider","sf":"${sfDir.split('/').last}","queries":$qs,"total":${fmt(results.map(_._2).sum)}}""")
    spark.stop()
  }
}
