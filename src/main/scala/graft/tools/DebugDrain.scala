package graft.tools

import org.apache.spark.sql.SparkSession

/** Progress printer registered via the STATIC conf
  * `spark.sql.streaming.streamingQueryListeners` so every session's
  * drains report, including drainTopic's isolated ones. */
class DrainProgressListener
    extends org.apache.spark.sql.streaming.StreamingQueryListener {
  override def onQueryStarted(
      e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryProgress(
      e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
    println(s"  batch ${e.progress.batchId}: total=${e.progress.durationMs}  " +
      s"rows=${e.progress.numInputRows}  " +
      e.progress.stateOperators.map(s =>
        s"commit=${s.commitTimeMs}ms stateRows=${s.numRowsTotal}").mkString("|"))
  override def onQueryTerminated(
      e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}

/** Throwaway decomposition of a watermarked join drain: topic ensure,
  * drain proper, and result read-back timed separately, plus the
  * micro-batch progress durations Spark itself reports. */
object DebugDrain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }

    // progress listener: per-batch durations
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit =
          println(s"  batch ${e.progress.batchId}: " +
            s"total=${e.progress.durationMs}  rows=${e.progress.numInputRows}  " +
            s"state=${e.progress.stateOperators.map(s =>
              s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}").mkString("|")}")
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    for (r <- 1 to 2) {
      println(s"--- round $r ---")
      time("join_watermarked_full")(
        graft.operators.Streams.streamExecJoinWatermarked(spark, dir)
          .write.format("noop").mode("overwrite").save())
      time("tumbling_full")(
        graft.operators.Streams.streamExecTumbling(spark, dir)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
