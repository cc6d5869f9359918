package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 drain decomposition: per-batch duration breakdown
  * (durationMs keys: addBatch / getBatch / latestOffset /
  * queryPlanning / triggerExecution / walCommit / commitOffsets)
  * for the heaviest drains, at SPARK_GRAFT_CPUS cores — run at 32
  * and 8 to locate the per-core overhead the round-15 verdict
  * flagged (8-core drains ran 1.7-3.8× faster than 32-core). */
object DebugDrain16 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // STATIC conf: session-scoped listeners don't see drainTopic's
      // child sessions; this one is installed on every session
      .config("spark.sql.streaming.streamingQueryListeners",
        "graft.tools.DrainProgressListener")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }

    // per-batch durations, registered on the ROOT session so the
    // drain's child sessions inherit it (listeners are context-level)
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val d = e.progress.durationMs
          println(s"  batch ${e.progress.batchId}: rows=${e.progress.numInputRows} " +
            s"durations=${d}  state=${e.progress.stateOperators.map(s =>
              s"commit=${s.commitTimeMs}ms rows=${s.numRowsTotal}").mkString("|")}")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    val drains: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      "chained_agg" -> (() => graft.operators.Streams.streamExecChainedAgg(spark, dir)),
      "full_outer_join_wm" -> (() => graft.operators.Streams.streamExecFullOuterJoinWatermarked(spark, dir)),
      "join_wm" -> (() => graft.operators.Streams.streamExecJoinWatermarked(spark, dir)),
      "semi_join_wm" -> (() => graft.operators.Streams.streamExecSemiJoinWatermarked(spark, dir)),
      "session_wm" -> (() => graft.operators.Streams.streamExecSessionWatermarked(spark, dir)),
      "join" -> (() => graft.operators.Streams.streamExecJoin(spark, dir)))
    for (r <- 1 to 2; (name, f) <- drains) {
      time(s"round$r $name")(
        f().write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
