package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.t
import graft.functions.GraftExpressions.{doubleToDecimal18 => d2dec}
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

  /** Deterministic stratified sampling: per-language keep rates
    * (downsample dominant languages, keep the tail) decided by the
    * same content fingerprint as [[trainTestSplit]] — stable under
    * re-runs, resharding, and late-arriving data, because membership
    * depends only on the text. Pure map-side filter: no shuffle, no
    * sampler state, embarrassingly parallel at any scale. */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("samp_bucket", pmod(rollingHash(lower(trim(col("text")))), lit(100L)))
      .withColumn("keep_rate",
        when(col("lang") === "en", 20L)
          .when(col("lang") === "es", 35L)
          .when(col("lang") === "de", 50L)
          .when(col("lang") === "fr", 65L)
          .otherwise(80L))
      .filter(col("samp_bucket") < col("keep_rate"))
      .select("doc_id", "lang", "samp_bucket", "keep_rate")
      .orderBy("doc_id")

  /** Temperature-smoothed data-mixture composition — the step that
    * decides how much of each SOURCE a training run samples. Raw
    * proportional sampling lets a dominant source drown rare ones;
    * the standard remedy (multilingual-pretraining practice) reweights
    * source s to n_s^τ with τ = 0.5: rare sources sample UP toward
    * parity, large ones down. Per source: target_n = floor(1000 ·
    * √n_s / Σ√n_t) capped at n_s, then the selection is the
    * content-fingerprint gate (fp mod n_s < target_n) — deterministic
    * under resharding and re-runs like every sampling op here, no RNG.
    * Determinism across engines: √n over integer counts is one
    * correctly-rounded IEEE op, the √-sum routes through
    * DECIMAL(28,12) (double sum order is partition-dependent — §5
    * rule), and the division/floor are identical double expressions
    * on both sides. Output: per-source accounting (n_docs, target_n,
    * sampled_n). Scale shape: two bounded aggs over #sources rows, a
    * broadcast of the target table, and one map-side filtered count —
    * nothing corpus-sized shuffles. */
  def dataMixture(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val counts = docs.groupBy("lang").agg(count(lit(1)).as("n"))
    val wsum = counts.agg(
      sum(sqrt(col("n")).cast("decimal(28,12)")).cast("double").as("ws"))
    val targets = counts.crossJoin(broadcast(wsum))
      .withColumn("target_n", least(col("n"),
        floor(lit(1000.0) * sqrt(col("n")) / col("ws")).cast("long")))
      .select("lang", "n", "target_n")
    val sampled = docs
      .withColumn("fp", rollingHash(lower(trim(col("text")))))
      .join(broadcast(targets), Seq("lang"))
      .filter(pmod(col("fp"), col("n")) < col("target_n"))
      .groupBy("lang").agg(count(lit(1)).as("sampled_n"))
    targets.join(sampled, Seq("lang"), "left")
      .select(col("lang"), col("n").as("n_docs"), col("target_n"),
        coalesce(col("sampled_n"), lit(0L)).as("sampled_n"))
      .orderBy("lang")
  }

  /** Epoch PLANNING against a token budget — the mixture step AFTER
    * [[dataMixture]] picks proportions: given a training budget B and
    * per-source mixture weights (∝ √available, the dataMixture
    * convention), how many tokens each source must contribute and how
    * many PASSES (epochs) over it that means — epochs > 1 flags the
    * sources the run will repeat (the data-constrained regime the
    * Chinchilla-style planners budget for).
    *
    * Scale shape: ONE map-combined corpus aggregate to |sources| rows
    * (token counting is scan-side arithmetic); the weight
    * normalization is a 1-row broadcast back over that bounded table.
    * Nothing downstream of the first aggregate is corpus-sized.
    *
    * Determinism: token counts are integers; √ is IEEE
    * correctly-rounded; the weight sum accumulates in DECIMAL
    * (order-free); target/epoch arithmetic is fixed-order double from
    * bit-identical inputs, floored/rounded at the display edge. */
  def mixtureEpochs(spark: SparkSession, dir: String,
      budgetTokens: Long = 1000000L): DataFrame = {
    val avail = t(spark, dir, "documents")
      .select(col("source"), wsTokens(col("text")).as("n_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("avail_tokens"))
    val wsum = avail.agg(
      sum(sqrt(col("avail_tokens")).cast("decimal(28,12)"))
        .cast("double").as("ws"))
    avail.crossJoin(broadcast(wsum))
      .withColumn("target_tokens",
        floor(lit(budgetTokens.toDouble) * sqrt(col("avail_tokens")) / col("ws"))
          .cast("long"))
      .select(col("source"), col("n_docs"), col("avail_tokens"),
        col("target_tokens"),
        round(col("target_tokens").cast("double") /
          col("avail_tokens").cast("double"), 6).as("epochs"),
        (col("target_tokens") > col("avail_tokens")).as("oversampled"))
      .orderBy("source")
  }

  /** The WHOLE pre-training corpus pipeline as ONE declarative plan:
    * exact dedup → quality/length gate → benchmark decontamination
    * (broadcast eval set) → per-language stratified sampling →
    * 256/192 chunking → per-language corpus accounting. Every stage
    * is the same formulation as its standalone operator (same
    * hashes, same gates, same rates), so the composition carries a
    * full oracle. One Catalyst plan end-to-end: Spark pipelines the
    * map-side stages (gates, fingerprints, gram generation, chunk
    * explode) into the scans around the two genuine shuffles (dedup
    * keeper agg, final per-language agg) — the point of declaring
    * the pipeline instead of materializing between steps. */
  def pipelineE2ECorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val keepers = docs
      .groupBy(md5(col("text").cast("binary")).as("h"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val gated = docs.join(keepers, "doc_id")
      .withColumn("n_tokens", wsTokens(col("text")))
      .withColumn("quality", qualityScore(col("text")))
      .filter(col("quality") >= 0.3 && col("n_tokens").between(10, 2000))
    val evalGrams = docs.filter(col("doc_id") % 97 === 0)
      .select(explode(graft.functions.GraftExpressions.wordNgrams(col("text"), 5)).as("g"))
      .distinct()
    val contaminated = gated
      .select(col("doc_id"),
        explode(graft.functions.GraftExpressions.wordNgrams(col("text"), 5)).as("g"))
      .join(broadcast(evalGrams), "g")
      .select("doc_id").distinct()
    val sampled = gated
      .filter(col("doc_id") % 97 =!= 0)
      .join(contaminated, Seq("doc_id"), "left_anti")
      .withColumn("samp_bucket", pmod(rollingHash(lower(trim(col("text")))), lit(100L)))
      .filter(col("samp_bucket") <
        when(col("lang") === "en", 20L).when(col("lang") === "es", 35L)
          .when(col("lang") === "de", 50L).when(col("lang") === "fr", 65L)
          .otherwise(80L))
    val chunk = 256
    val stride = 192
    sampled
      .select(col("doc_id"), col("lang"), split(col("text"), " ").as("w"))
      .withColumn("nw", size(col("w")))
      .withColumn("n_chunks",
        (lit(1) + greatest(lit(0.0),
          ceil((col("nw") - lit(chunk)) / lit(stride.toDouble)))).cast("int"))
      .withColumn("chunk_idx", explode(sequence(lit(0), col("n_chunks") - 1)))
      .withColumn("n_chunk_tokens",
        size(slice(col("w"), col("chunk_idx") * stride + 1, lit(chunk))).cast("long"))
      .groupBy("lang")
      .agg(countDistinct("doc_id").as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum("n_chunk_tokens").as("total_chunk_tokens"))
      .orderBy("lang")
  }

  /** Per-language token-budget curation: keep the highest-quality
    * documents until each language's token budget fills — the
    * data-mixing step that decides how much of each source a
    * training run ingests.
    *
    * Two passes, neither sorting the corpus (the q29 pattern —
    * quality-ORDER selection without a per-language total order):
    *  1. quality quantized to integer centile buckets; per
    *     (lang, bucket) token totals — a bounded agg (≤ 101 rows per
    *     language BY CONSTRUCTION, so the cumulative window scans a
    *     few hundred rows, not the corpus). The cutoff bucket is the
    *     lowest whose running total STARTS under budget (greedy fill;
    *     overshoot bounded by one bucket's tokens).
    *  2. a BROADCAST cutoff lookup filters documents map-side.
    * Both the quantization (floor(q·100) of the same rounded double)
    * and the fill rule are engine-portable integer decisions. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    val budget = when(col("lang") === "en", 8000L).otherwise(2500L)
    val scored = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"),
        floor(qualityScore(col("text")) * 100).cast("int").as("qb"),
        bpeTokensEst(col("text")).as("toks"))
    val w = Window.partitionBy("lang").orderBy(col("qb").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val cut = scored.groupBy("lang", "qb").agg(sum("toks").as("btoks"))
      .withColumn("start_toks", sum("btoks").over(w) - col("btoks"))
      .filter(col("start_toks") < budget)
      .groupBy("lang").agg(min("qb").as("cutoff_qb"))
    scored.join(broadcast(cut), "lang")
      .filter(col("qb") >= col("cutoff_qb"))
      .groupBy("lang", "cutoff_qb")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("kept_tokens"))
      .withColumn("token_budget", budget)
      .select("lang", "token_budget", "cutoff_qb", "n_docs", "kept_tokens")
      .orderBy("lang")
  }

  /** Dataset card: the per-language corpus accounting a training run
    * publishes next to its data — volume, exact-dup rate, quality,
    * and a median length. One bounded aggregation (5 rows out):
    * count/sum/countDistinct partial-aggregate map-side, the quality
    * mean routes through exact decimal so engines agree bitwise, and
    * the median is percentile_disc (an element OF the data — no
    * interpolation arithmetic to drift). */
  def datasetCard(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang"), col("text"),
        wsTokens(col("text")).as("toks"),
        bpeTokensEst(col("text")).as("bpe"),
        qualityScore(col("text")).as("q"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("toks").as("total_tokens"),
        (count(lit(1)) - countDistinct(md5(col("text").cast("binary"))))
          .as("n_exact_dups"),
        round(sum(d2dec(col("q"), 6))
          .cast("double") / count(lit(1)), 6).as("mean_quality"),
        // Spark's percentile_disc yields DOUBLE even over longs; the
        // value is an element OF the data, so the cast back is exact
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY bpe)")
          .cast("long").as("p50_bpe_tokens"))
      .orderBy("lang")

  /** Deterministic global shuffle — the training-order
    * randomization pass every epoch pipeline runs between curation
    * and tokenization. The permutation is an LCG over a prime
    * modulus (sort_key = (48271·doc_id + 12345) mod 1e9+7 — Lehmer's
    * MINSTD multiplier), a bijection on [0, m) so ordering by it IS
    * a pseudorandom permutation; pure 64-bit integer arithmetic, so
    * both engines compute bit-identical keys (no float hash, no
    * engine-specific xxhash), and ids past m tie-break on doc_id.
    * Docs land in a shard (sort_key mod 16) and take a position
    * within it via a per-shard row_number.
    *
    * Scale shape: the sort key is computed map-side; the per-shard
    * window is the ONE genuine shuffle a global shuffle requires —
    * repartition on shard, sort within — and shards sort
    * independently, so there is no global total order anywhere (at
    * 100 TB nShards tracks the output file count and each shard is
    * one writer's worth of data; the terminal ORDER BY is the §5
    * presentation convention, not the plan). Re-running with the
    * same corpus reproduces the same order exactly — shuffling is
    * deterministic, resumable, and auditable, which is why training
    * pipelines use keyed permutation instead of rand(). */
  def globalShuffle(spark: SparkSession, dir: String, nShards: Int = 16): DataFrame = {
    val key = (col("doc_id") * 48271L + 12345L) % 1000000007L
    t(spark, dir, "documents")
      .select(col("doc_id"))
      .withColumn("sort_key", key)
      .withColumn("shard", (col("sort_key") % nShards).cast("int"))
      .withColumn("pos", row_number().over(
        Window.partitionBy("shard").orderBy("sort_key", "doc_id")).cast("long"))
      .orderBy("shard", "pos")
  }

  /** Fixed-window document chunking for context-length-bounded
    * training: 256-token chunks on a 192-token stride (64-token
    * overlap). Token slicing is a map-side explode of per-doc chunk
    * indices — each document expands independently, no shuffle; the
    * chunk count formula (1 + ceil((n-256)/192)) guarantees full
    * coverage with the last chunk allowed to run short. */
  def docsChunking(spark: SparkSession, dir: String): DataFrame = {
    val chunk = 256
    val stride = 192
    t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .withColumn("nw", size(col("w")))
      .withColumn("n_chunks",
        (lit(1) + greatest(lit(0.0),
          ceil((col("nw") - lit(chunk)) / lit(stride.toDouble)))).cast("int"))
      .withColumn("chunk_idx", explode(sequence(lit(0), col("n_chunks") - 1)))
      .withColumn("cw", slice(col("w"), col("chunk_idx") * stride + 1, lit(chunk)))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        size(col("cw")).cast("long").as("n_chunk_tokens"),
        md5(array_join(col("cw"), " ").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_idx")
  }

  /** Survivorship dedup: exact-dup clusters (case-insensitive content
    * digest) keep their BEST member — longest text, doc_id tie-break —
    * and report the cluster size, the curation step between "find
    * dups" (dedup_exact's shape) and "build the training corpus"
    * (which needs ONE canonical doc per cluster, chosen by quality,
    * not arbitrarily). One shuffle keyed by the 16-byte digest (text
    * never shuffles twice: the window and the size count share the
    * partitioning), reduce side = the distinct-content count. */
  def dedupSurvivors(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents").select(col("doc_id"), col("n_chars"),
      md5(lower(col("text")).cast("binary")).as("content_hash"))
    val part = Window.partitionBy("content_hash")
    val w = part.orderBy(col("n_chars").desc, col("doc_id").asc)
    d.withColumn("rk", row_number().over(w))
      .withColumn("cluster_size", count(lit(1)).over(part))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("content_hash"), col("cluster_size"))
      .orderBy("doc_id")
  }

  /** Corpus quality report: the per-(lang, source) summary a dataset
    * curator reads before mixing — doc/duplicate/short counts and
    * token/char volume. One partial/final aggregate pair over the
    * corpus; the duplicate count shuffles 16-byte content digests
    * (the dedup_exact key), never text, and every output is an exact
    * integer so the report is bit-stable across engines.
    */
  def qualityReport(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("lang", "source")
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(md5(col("text").cast("binary"))).as("n_distinct"),
        sum(wsTokens(col("text"))).as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        sum(when(col("n_chars") < 100, 1L).otherwise(0L)).as("n_short"))
      .orderBy("lang", "source")

  /** Span SCRUB — the curation ACTION [[graft.operators.Dedup
    * .dedupSpanExact]] only flags: rewrite each document with its hot
    * spans excised (Lee et al.'s substring-dedup applied, not just
    * measured). A token position is covered when any hot word-8-gram
    * span (≥ 2 distinct docs share it) starts at most 7 positions
    * before it; the rewritten text is the uncovered tokens rejoined.
    *
    * Scale shape (the span-exact lessons carried over): spans cross
    * shuffles as 8-byte xxhash64 keys, never strings; the hot set
    * joins back by SHUFFLE (at 100 TB it is corpus-sized — no
    * broadcast); hot START POSITIONS are the only per-doc state
    * (collect_list bounded by the doc's own span count, order
    * irrelevant — they feed an exists() predicate), and the excision
    * itself is a map-side array HOF after one doc-keyed join. Shuffle
    * volume tracks span volume, text shuffles once (the doc-keyed
    * rebuild join). */
  def spanScrub(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("w"))
    val spans = t(spark, dir, "documents")
      .select(col("doc_id"),
        posexplode(graft.functions.GraftExpressions.wordNgrams(col("text"), 8))
          .as(Seq("i", "span")))
      .select(col("doc_id"), col("i"), xxhash64(col("span")).as("sk"))
    val hot = spans.select("doc_id", "sk").distinct()
      .groupBy("sk").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2)
    val starts = spans.join(hot, "sk")
      .groupBy("doc_id").agg(collect_list(col("i")).as("hs"))
    docs.join(starts, Seq("doc_id"), "left")
      .select(col("doc_id"), col("w"),
        coalesce(col("hs"), array().cast("array<int>")).as("hs"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        filter(col("w"), (_, j) =>
          !exists(col("hs"), s => j >= s && j <= s + 7)).as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        (col("n_tokens") - size(col("kept"))).cast("long").as("n_scrubbed"),
        array_join(col("kept"), " ").as("scrubbed_text"))
      .orderBy("doc_id")
  }

  /** Curriculum SCHEDULE — the quality-ordered training plan
    * (easy/clean data first, noisier tails later) that curriculum-
    * learning pipelines feed the trainer: docs bucket into quality
    * stages by the [[graft.functions.TextFunctions.qualityScore]]
    * heuristic (fixed VALUE thresholds, not positional ntile — a new
    * shard joins the right stage without re-ranking the corpus), and
    * the schedule reports per (stage, source) volumes, each source's
    * share of its stage, and the cumulative token position where each
    * cell starts feeding.
    *
    * Scale shape: scoring is a map-side projection; ONE map-combined
    * shuffle reduces the corpus to the |stages|×|sources| grid; both
    * windows (stage totals, cumulative schedule) run over that
    * bounded grid — the cumulative window's single partition holds
    * ≤ |stages|·|sources| rows by construction, never the corpus.
    * Determinism: the score is rational arithmetic rounded at 1e-6
    * (identical doubles both engines), so threshold comparisons can
    * never straddle; token sums are exact integers. */
  def curriculum(spark: SparkSession, dir: String): DataFrame = {
    val scored = t(spark, dir, "documents")
      .select(col("source"), wsTokens(col("text")).as("toks"),
        qualityScore(col("text")).as("q"))
      .withColumn("stage",
        when(col("q") >= 0.55, 1).when(col("q") >= 0.45, 2)
          .when(col("q") >= 0.35, 3).otherwise(4))
    val agg = scored.groupBy("stage", "source")
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
    val wStage = Window.partitionBy("stage")
    val wCum = Window.orderBy("stage", "source")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    agg
      .withColumn("stage_tokens", sum(col("n_tokens")).over(wStage))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(wCum))
      .select(col("stage"), col("source"), col("n_docs"), col("n_tokens"),
        col("stage_tokens"),
        round(col("n_tokens").cast("double") /
          col("stage_tokens").cast("double"), 6).as("stage_share"),
        col("cum_tokens"))
      .orderBy("stage", "source")
  }

  /** Temperature-scaled mixture WEIGHTS — the multilingual-sampling
    * standard (weights ∝ n^τ: τ=1 is proportional, τ→0 flattens
    * toward uniform; low-resource sources upsample as τ drops). The
    * exponents are spelled as NESTED SQRT (τ ∈ {1, 0.5, 0.25}) on
    * purpose: sqrt is IEEE-correctly-rounded in every engine where a
    * libm pow(x, 0.7) may differ by an ULP — the same reason
    * [[dataMixture]] fixed τ=0.5. Per-source token totals cross ONE
    * map-combined shuffle; the weight sums accumulate in DECIMAL
    * (order-free) over the |sources|-row aggregate; shares are one
    * fixed-order division each. */
  def mixtureTemperature(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .groupBy("source").agg(sum(wsTokens(col("text"))).as("n_tokens"))
    val n = col("n_tokens").cast("double")
    val w = toks.select(col("source"), col("n_tokens"),
      n.as("w100"), sqrt(n).as("w50"), sqrt(sqrt(n)).as("w25"))
    val tot = w.agg(
      sum(col("w100").cast(DecimalType(28, 12))).cast("double").as("s100"),
      sum(col("w50").cast(DecimalType(28, 12))).cast("double").as("s50"),
      sum(col("w25").cast(DecimalType(28, 12))).cast("double").as("s25"))
    w.crossJoin(broadcast(tot))
      .select(col("source"), col("n_tokens"),
        round(col("w100") / col("s100"), 6).as("share_t100"),
        round(col("w50") / col("s50"), 6).as("share_t50"),
        round(col("w25") / col("s25"), 6).as("share_t25"))
      .orderBy("source")
  }

  /** Corpus-level PII incidence report — the compliance view over
    * [[TextAnalysis.textPiiScrub]]'s per-doc counts: per source, the
    * total hits by kind (emails / phones / denylisted terms), how
    * many documents carry ANY hit, and the flag rate — the numbers a
    * release review reads before the per-doc scrub runs. Pure
    * map-side regexp counting into ONE map-combined aggregate
    * (reduce side = |sources|); the rate is one exact division. */
  def piiReport(spark: SparkSession, dir: String): DataFrame = {
    val ne = regexp_count(col("text"), lit(TextAnalysis.emailRe)).cast("long")
    val np = regexp_count(col("text"), lit(TextAnalysis.phoneRe)).cast("long")
    val nd = regexp_count(col("text"), lit(TextAnalysis.denyRe)).cast("long")
    t(spark, dir, "documents")
      .select(col("source"), ne.as("ne"), np.as("np"), nd.as("nd"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ne")).as("n_emails"),
        sum(col("np")).as("n_phones"),
        sum(col("nd")).as("n_deny_terms"),
        count(when(col("ne") + col("np") + col("nd") > 0, 1))
          .as("n_docs_flagged"))
      .withColumn("flag_rate",
        round(col("n_docs_flagged").cast("double") /
          col("n_docs").cast("double"), 6))
      .orderBy("source")
  }

  /** Cross-source CONTAMINATION MATRIX — for every ordered source
    * pair (a, b), what fraction of a's distinct word-8-grams also
    * appear in b: the mixture diagnostic behind "these two crawls
    * overlap 40%, deduplicate before weighting them independently"
    * (and the source-level view of what `decontaminate_ngram` does
    * doc-level).
    *
    * Scale shape: grams cross shuffles as 8-byte xxhash64 keys (the
    * span-op convention — strings never shuffle); ONE corpus shuffle
    * builds the distinct (source, hash) table; the pair join is
    * hash-keyed over THAT table (per-gram fan-out bounded by
    * |sources|², never corpus × corpus); totals and the final matrix
    * are |sources|-sized broadcasts. The collision-free claim is the
    * same 64-bit-hash adjudication every span op carries; the oracle
    * joins the gram STRINGS and must agree.
    */
  def contaminationMatrix(spark: SparkSession, dir: String): DataFrame = {
    // shared gram stage (see Dedup.distinctGramHashes for why it
    // checkpoints: three readers through self-join aliases)
    val grams = Dedup.distinctGramHashes(t(spark, dir, "documents"), "source")
    val totals = grams.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val shared = grams.as("a")
      .join(grams.as("b"), col("a.gk") === col("b.gk") &&
        col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("n_shared"))
    broadcast(totals.select(col("source").as("source_a"), col("n_grams").as("n_grams_a")))
      .join(broadcast(totals.select(col("source").as("source_b"))),
        col("source_a") =!= col("source_b"))
      .join(shared, Seq("source_a", "source_b"), "left")
      .select(col("source_a"), col("source_b"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"), col("n_grams_a"),
        round(coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_grams_a").cast("double"), 6).as("containment"))
      .orderBy("source_a", "source_b")
  }

  /** Quality-threshold sweep (round 11) — the calibration curve for
    * the quality gate (dedup_threshold_sweep\u2019s discipline applied to
    * the quality score): docs/tokens retained at each candidate
    * threshold, off ONE per-doc scoring pass exploded into the
    * thresholds it survives. The score is [[textQuality]]\u2019s exact
    * cross-engine double; shares are exact ppm integers. */
  def qualitySweep(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.{qualityScore, wsTokens}
    val scored = t(spark, dir, "documents")
      .select(qualityScore(col("text")).as("score"),
        wsTokens(col("text")).as("toks"))
    val totals = scored.groupBy().agg(count(lit(1)).as("total_docs"),
      sum("toks").as("total_toks"))
    val ts = (0 to 9).map(i => s"${i / 10.0}D")
    scored
      .select(explode(expr(
        s"filter(array(${ts.mkString(", ")}), t -> score >= t)")).as("threshold"),
        col("toks"))
      .groupBy("threshold")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"))
      .crossJoin(broadcast(totals))
      .select(col("threshold"), col("n_docs"), col("n_tokens"),
        expr("n_docs * 1000000 DIV total_docs").as("doc_share_ppm"),
        expr("n_tokens * 1000000 DIV total_toks").as("token_share_ppm"))
      .orderBy("threshold")
  }

  /** Per-doc token-count histogram in BIT-LENGTH buckets (round 11) —
    * the sequence-length profile that sizes packing and truncation
    * budgets. Bucket = integer bit length (the length(bin(n)) trick,
    * no float log2); reduce side \u2264 64 rows. */
  def tokenHistogram(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.wsTokens
    t(spark, dir, "documents")
      .select(wsTokens(col("text")).as("toks"))
      .select(length(bin(greatest(col("toks"), lit(1L)))).cast("long")
        .as("bucket"), col("toks"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum("toks").as("n_tokens"),
        min("toks").as("min_tokens"), max("toks").as("max_tokens"))
      .orderBy("bucket")
  }

  /** Dedup CASCADE with per-tier accounting (round 12) — how
    * production dedup actually runs: cheapest tier first, each tier
    * only over the previous tier's SURVIVORS, so the expensive keys
    * never see rows a cheaper tier already killed. Tiers here are the
    * three hash families the suite gates individually — exact
    * (verbatim md5), exact-normalized (whitespace/case collapse),
    * prefix (first-6-token truncation fingerprint) — each with the
    * keep-best survivorship (longest text, ties → min id). The
    * output is the curator's funnel: docs in / removed / out per
    * tier, exact integers.
    *
    * 100-TB shape: three hash aggregations over shrinking inputs;
    * every tier shuffles (key, len, id) triples only — texts stay in
    * place; a near-dup tier slots after prefix using the banded
    * minhash machinery unchanged (its candidates are also
    * survivor-only). */
  def dedupCascade(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        length(col("text")).cast("long").as("len"))
    def tier(in: DataFrame, key: org.apache.spark.sql.Column): DataFrame = {
      val keepers = in
        .groupBy(key.as("k"))
        .agg(max(struct(col("len"), (-col("doc_id")).as("nid"))).as("m"))
        .select((-col("m.nid")).as("doc_id"))
      // survivors keep their text for the next tier; checkpoint so
      // the funnel counts below don't re-derive the whole chain per
      // tier (the hashMinComponents lineage lesson)
      in.join(keepers, "doc_id").localCheckpoint(true)
    }
    val t1 = tier(docs, md5(col("text").cast("binary")))
    val t2 = tier(t1, md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))
      .cast("binary")))
    val t3 = tier(t2, substring_index(col("text"), " ", 6))
    def row(name: String, ord: Int, in: DataFrame, out: DataFrame) = {
      val nIn = in.count(); val nOut = out.count()
      (ord.toLong, name, nIn, nIn - nOut, nOut)
    }
    import spark.implicits._
    Seq(
      row("1_exact", 1, docs, t1),
      row("2_normalized", 2, t1, t2),
      row("3_prefix", 3, t2, t3))
      .toDF("tier_no", "tier", "docs_in", "docs_removed", "docs_out")
      .orderBy("tier_no")
  }

}
