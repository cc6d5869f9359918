package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The rewritten q25 (top-N pre-filter + arithmetic NTILE) must be
  * bit-identical to the direct full-table-window formulation, and its
  * physical plan must not window the full table. */
class Q25PrefilterSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def direct(dir: String) = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    spark.read.parquet(s"$dir/lineitem.parquet")
      .withColumn("quartile", ntile(4).over(w).cast("long"))
      .withColumn("drank", dense_rank().over(w).cast("long"))
      .filter(col("drank") <= 50)
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice",
        "quartile", "drank")
      .orderBy("l_returnflag", "drank", "l_orderkey", "l_linenumber")
  }

  for (sf <- Seq("sf0.001", "sf0.01")) {
    test(s"prefiltered q25 equals the direct window form at $sf") {
      val dir = s"/root/testdata/$sf"
      val got = Relational.q25NtileDenseRank(spark, dir).collect()
      val want = direct(dir).collect()
      assert(got.length === want.length)
      got.zip(want).foreach { case (g, w) => assert(g === w) }
    }
  }

  test("the window input is the pre-filtered prefix, not the full scan") {
    val df = Relational.q25NtileDenseRank(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    // the Window node's subtree must contain the cutoff join filter —
    // i.e. a Window directly over the raw relation would be wrong.
    // Cheap structural check: every Window in the optimized plan sits
    // ABOVE a Join (the broadcast cutoff join feeding it).
    val lines = plan.linesIterator.toVector
    val winIdx = lines.indexWhere(_.contains("Window ["))
    assert(winIdx >= 0, s"no Window node found:\n$plan")
    val below = lines.drop(winIdx + 1).mkString("\n")
    assert(below.contains("Join"),
      s"Window must consume the cutoff-join survivors:\n$plan")
    assert(below.contains("cutoff"),
      s"the subtree under Window must carry the cutoff filter:\n$plan")
  }
}
