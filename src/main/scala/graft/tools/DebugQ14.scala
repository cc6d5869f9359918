package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Throwaway decomposition of q14: HLL leg vs exact leg vs join. */
object DebugQ14 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = t(spark, dir, "lineitem")
    for (r <- 1 to 3) {
      println(s"--- round $r ---")
      time("hll_001")(noop(li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("ao"))))
      time("hll_005")(noop(li.groupBy("l_returnflag").agg(
        approx_count_distinct(col("l_partkey"), 0.05).as("ap"),
        approx_count_distinct(col("l_orderkey"), 0.05).as("ao"))))
      time("exact2")(noop(li.groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("ep"),
        countDistinct(col("l_orderkey")).as("eo"))))
      time("q14_full")(noop(graft.operators.Relational.q14ApproxDistinct(spark, dir)))
    }
    spark.stop()
  }
}
