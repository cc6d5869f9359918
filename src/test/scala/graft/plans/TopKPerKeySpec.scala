package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TopKPerKeySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("custom exec matches the window-function formulation exactly") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val custom = TopKPerKey(o, 3, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect()

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val reference = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy("o_custkey", "o_orderkey")
      .collect()

    assert(custom.length === reference.length)
    assert(custom.toSeq === reference.toSeq)
  }

  test("plans as TopKPerKeyExec with a single exchange on the group key") {
    val o = spark.read.parquet(s"$dir/orders.parquet")
    val df = TopKPerKey(o, 2, Seq("o_custkey"), Seq(("o_totalprice", true)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1, plan)
  }

  test("emits each group's rows best-first and respects k > group size") {
    import spark.implicits._
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val top = TopKPerKey(df, 2, Seq("g"), Seq(("v", true)))
    val byGroup = top.collect().map(r => (r.getString(0), r.getInt(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    assert(byGroup("a") === Seq(3, 2), "best-first within group")
    assert(byGroup("b") === Seq(9), "group smaller than k kept whole")
  }
}
