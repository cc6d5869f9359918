package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** AQE skew-join handling: a join keyed with one pathological hot key
  * must get runtime-split by adaptive execution instead of funneling
  * the hot partition through one task — the mechanism graft relies on
  * for data skew at 100 TB (SURVEY.md §6), demonstrated and asserted
  * on the physical plan. */
class SkewJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("AQE splits the skewed partition at runtime (skew=true in the final plan)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      // force a sort-merge join and lower the skew thresholds so the
      // local fixture exhibits what a 100 TB hot key would
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64k")
      conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "8k")

      // 2/3 of the left side lands on key 0 → one hot shuffle
      // partition; the payload is a high-entropy hash so the skew
      // survives shuffle compression (AQE sizes compressed bytes)
      val left = spark.range(0, 300000)
        .select(when(col("id") < 200000, 0L).otherwise(col("id")).as("k"),
          sha2(col("id").cast("string"), 256).as("v"))
      val rightKeyed = spark.range(0, 2000).select(col("id").as("k"), (col("id") * 7).as("w"))

      val joined = left.join(rightKeyed, "k")
      // materialize THIS dataset so its own adaptive plan finalizes
      // (count() would spawn a separate QueryExecution)
      val n = joined.collect().length
      // key 0 matches right row 0: 200000 rows; keys 2000..299999 match nothing;
      // left ids 200000+ don't overlap the right key range
      assert(n === 200000)

      val finalPlan = joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan.toString
        case other => other.toString
      }
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the skewed join (plan:\n$finalPlan)")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
