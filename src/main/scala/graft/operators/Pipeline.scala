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
    * fill fixed 4096-token packs (floor((prefix-sum - toks)/budget)).
    *
    * Distributed prefix sum, NOT a global window (a no-partitionBy
    * window funnels the whole corpus through one task):
    *  1. shard = floor(doc_id / shardSize) — deterministic, map-side,
    *     order-preserving (no range-sampler involved);
    *  2. per-shard token totals: one tiny row per shard, collected to
    *     the driver (#shards values, never data rows);
    *  3. cumulative bases scanned on the driver, broadcast back;
    *  4. running sum inside each shard via a PARTITIONED window +
    *     the shard's base = the exact global prefix sum.
    * Every stage is parallel in #shards; identical output to the
    * global-window formulation. */
  def seqPacking(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val shardSize = 1024L // docs per shard; at 100 TB scale this up (~1e6)
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), bpeTokensEst(col("text")).as("toks"))
      .withColumn("shard", floor(col("doc_id") / shardSize))
    val bases = docs.groupBy("shard").agg(sum("toks").as("shard_toks"))
      .collect().sortBy(_.getLong(0))
      .scanLeft((Long.MinValue, 0L)) { case ((_, acc), r) =>
        (r.getLong(0), acc + r.getLong(1))
      }
      .sliding(2).collect { case Array((_, prev), (shard, _)) => (shard, prev) }
      .toSeq
    val baseDf = bases.toDF("shard", "base")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    docs.join(broadcast(baseDf), "shard")
      .withColumn("pack_id",
        ((sum("toks").over(w) + col("base") - col("toks")) / 4096).cast("long"))
      .groupBy("pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("total_tokens"))
      .orderBy("pack_id")
  }
}
