package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.GraftExpressions.rollingHash
import graft.functions.TextFunctions._

/** End-to-end training-data pipeline compositions: the steps between
  * a raw crawl and a tokenizer — cleaning, splitting, packing. Each
  * composes §2c/§2e operators into one declarative plan (one pass,
  * no driver-side loops). */
object Pipeline {

  /** Cleaned-corpus materialization: exact-dedup keep-list ∩ quality
    * gate ∩ length gate — the filter chain before tokenization. */
  def cleanCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val keepers = docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    docs.join(keepers, "doc_id")
      .withColumn("n_tokens", wsTokens(col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= 0.3 && col("n_tokens").between(10, 2000))
      .select("doc_id", "lang", "n_tokens", "quality")
      .orderBy("doc_id")
  }

  /** Deterministic hash-based train/valid/test split (stable under
    * re-runs and resharding — the fingerprint depends only on
    * content, never on partitioning). */
  def trainTestSplit(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("fp_bucket", pmod(rollingHash(lower(trim(col("text")))), lit(10L)))
      .withColumn("split",
        when(col("fp_bucket") < 8, "train")
          .when(col("fp_bucket") < 9, "valid")
          .otherwise("test"))
      .select("doc_id", "fp_bucket", "split")
      .orderBy("doc_id")

  /** Greedy sequential sequence packing: documents in doc_id order
    * fill fixed 4096-token packs (floor(prefix-sum/budget) — the
    * single-window-pass formulation; at 100 TB this packs within
    * pre-sorted shards, shuffle-free). Output: per-pack fill stats. */
  def seqPacking(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    t(spark, dir, "documents")
      .withColumn("toks", bpeTokensEst(col("text")))
      .withColumn("pack_id", ((sum("toks").over(w) - col("toks")) / 4096).cast("long"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_tokens"))
      .orderBy("pack_id")
  }
}
