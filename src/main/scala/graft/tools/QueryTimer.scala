package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Low-noise per-query timer for optimization work: times the named
  * queries through the SAME session shape and noop-sink methodology
  * as [[graft.Bench]], but runs each query `SPARK_GRAFT_TIMER_RUNS`
  * times (default 3) and prints every leg plus the min — so a single
  * contended leg is visible instead of silently polluting a
  * min-of-two. Usage:
  *   SPARK_GRAFT_SF_DIR=... tools/run.sh graft.tools.QueryTimer q54_approx_quantile ...
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_TIMER_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def timeOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => println(s"ERROR $name: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    args.foreach { name =>
      spark.sparkContext.setJobDescription(s"timer: $name")
      val legs = (1 to runs).map(_ => timeOnce(name))
      println(f"TIMER $name%-40s min=${legs.min}%6.2f  legs=" +
        legs.map(l => f"$l%.2f").mkString("[", ",", "]"))
    }
    graft.operators.GraftCaches.releaseAll()
    spark.stop()
  }
}
