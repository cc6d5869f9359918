package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway decomposition of the fixed per-query cost: what does a
  * trivial scan+agg+sort actually spend time on at sf0.1? */
object DebugQ1 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    for (r <- 1 to 3) {
      println(s"--- round $r ---")
      time("read_only")(noop(spark.read.parquet(s"$dir/lineitem.parquet")))
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
      time("scan_cached_reader")(noop(li))
      time("agg_only")(noop(li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"), sum("l_quantity").as("sq"))))
      time("agg_sort")(noop(li.groupBy("l_returnflag").agg(
        count(lit(1)).as("n"), sum("l_quantity").as("sq"))
        .orderBy("l_returnflag")))
      time("q1_full")(noop(graft.operators.Relational.q1Agg(spark, dir)))
      time("q1_again_same_plan")(noop(graft.operators.Relational.q1Agg(spark, dir)))
      import graft.Tables.{dsum, dsumProd}
      import org.apache.spark.sql.types.DecimalType
      // round 16 A/B: the round-15 cast forms vs the fast expressions
      time("old_dsum_x1")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("a"))))
      time("old_dsumprod")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 6)) *
          (lit(1.0) - col("l_discount")).cast(DecimalType(18, 6)))
          .cast(DecimalType(28, 6)).cast("double").as("a"))))
      time("dsum_x1")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("a"))))
      time("dsum_x3")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(dsum(col("l_quantity")).as("a"), dsum(col("l_extendedprice")).as("b"),
          (dsum(col("l_quantity")) / count(lit(1))).as("c"))))
      time("dsumprod_only")(noop(li.groupBy("l_returnflag", "l_linestatus")
        .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("a"))))
      // candidate: same exact decimal product sum, but the per-row
      // multiply in the LONG domain: (price_ds * disc_ds) as unscaled
      // int128? approximate test: decimal(18,6)*decimal(18,6) via
      // unscaled longs multiplied as DECIMAL(38,12) by casting through
      time("dsumprod_repart")(noop(li.repartition(32)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("a"))))
    }
    spark.stop()
  }
}
