package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Demonstrates the co-located join path from SURVEY §6: two tables
  * bucketed on the join key join WITHOUT a shuffle exchange — the
  * 100 TB answer to repeated fact-fact joins. */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("join of co-bucketed tables plans without a shuffle exchange") {
    // tables are written to explicit paths, so the (static) warehouse
    // conf never comes into play
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

      (0 until 10000).map(i => (i.toLong, s"left$i")).toDF("k", "lv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/tbl_l").saveAsTable("graft_bucketed_l")
      (0 until 10000 by 2).map(i => (i.toLong, s"right$i")).toDF("k", "rv")
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k")
        .option("path", s"$wh/tbl_r").saveAsTable("graft_bucketed_r")

      val joined = spark.table("graft_bucketed_l")
        .join(spark.table("graft_bucketed_r"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() === 5000)

      // contrast: the same join over unbucketed parquet DOES shuffle
      spark.table("graft_bucketed_l").drop("lv")
        .write.mode("overwrite").parquet(s"$wh/plain_l")
      spark.table("graft_bucketed_r").drop("rv")
        .write.mode("overwrite").parquet(s"$wh/plain_r")
      val unbucketed = spark.read.parquet(s"$wh/plain_l")
        .join(spark.read.parquet(s"$wh/plain_r"), "k")
      assert(unbucketed.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_l")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_r")
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
  }
}
