package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFunctions.wordNgrams
import graft.functions.VectorFunctions._

/** §2c deduplication suite over the documents/embeddings tables.
  *
  * Scale design (SURVEY.md §6): every variant is
  * blocking/bucketing-first so the pairwise stage never goes n² —
  * LSH band buckets (minhash), chunk buckets (simhash), rare-gram
  * inverted index with a document-frequency cap (jaccard),
  * hyperplane sign buckets (embedding). The only shuffles are the
  * bucket-key joins; bucket keys are derived from content hashes,
  * never from low-cardinality data columns → skew-safe at 100 TB.
  */
object Dedup {

  /** Exact dedup: group identical content by md5, keep min doc_id. */
  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")

  /** Exact dedup after whitespace/case normalization. */
  def dedupExactNormalized(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))
        .cast("binary")).as("content_hash"))
      .agg(min("doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy("keeper")

  /** Word-3-gram ROWS per doc via the native codegen
    * [[graft.functions.WordNgramsExpr]] + explode — a pure MAP-SIDE
    * projection, zero shuffles. (History: round 1 used posexplode +
    * window lead, which shuffled every token row by doc_id just to
    * stitch neighbors back together; the higher-order-function array
    * form before that evaluated its lambdas interpreted, ~10× slower
    * at sf0.1. The native expression gets both: codegen AND no
    * shuffle.) */
  private[operators] def gramRows(spark: SparkSession, dir: String,
      lowercase: Boolean): DataFrame = {
    val txt = if (lowercase) lower(col("text")) else col("text")
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), expr("n_chars DIV 10").as("bucket"),
        explode(graft.functions.GraftExpressions.wordNgrams(txt, 3)).as("sh"))
  }

  /** Max document frequency for a gram to generate candidate pairs.
    * A gram shared by m docs yields m² join rows — stop-grams
    * ("the … of") make the uncapped self-join quadratic in corpus
    * size. Recall contract: a pair is found iff it shares ≥1 gram
    * with df ≤ this cap; pairs whose every shared gram is a
    * stop-gram are missed (verified acceptable on the test corpora —
    * near-dup pairs at jaccard ≥ 0.2 always share rare content
    * grams). */
  private[operators] val ngramDfCap = 32

  /** N-gram Jaccard near-dup pairs within (lang, length) blocks.
    * Two stages, both codegen'd hash joins/aggs, no gram arrays:
    *  1. candidates + rare intersection — ONE shuffle groups each
    *     (block, gram) into its posting list; RARE grams
    *     (df ≤ [[ngramDfCap]]) explode their ≤ cap²/2 pairs
    *     map-side, and a single aggregation yields both the
    *     candidate pair AND its shared-rare-gram count;
    *  2. hot completion — |A∩B| = rare∩ + hot∩, where hot∩ joins
    *     only the HOT gram rows (df > cap: a tiny, bounded set of
    *     distinct grams) restricted to candidate pairs. The full
    *     gram relation is never re-joined per pair — at 100 TB the
    *     verify traffic is candidates × hot-grams-per-doc, a small
    *     constant, not candidates × grams-per-doc.
    * |A∪B| = |A|+|B|−|A∩B|. Join keys stay high-cardinality →
    * skew-safe at 100 TB. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    // raw gram rows are map-side only; the two aggregations below
    // dedup internally (countDistinct / collect_set), so the global
    // distinct exchange of round 1/2 disappears entirely
    val g = gramRows(spark, dir, lowercase = false)
      .select("doc_id", "lang", "bucket", "sh").persist()
    val sizes = g.groupBy("doc_id").agg(countDistinct("sh").as("nsh"))
    // HOT grams (df > cap) are identified by a COUNT-ONLY aggregate
    // first — never a posting list, so a stop-gram shared by 10^8
    // docs costs one counter, not one 10^8-element array in a single
    // aggregation buffer. The set of hot gram STRINGS is bounded by
    // vocabulary, not corpus size → broadcast.
    val hot = g.groupBy("lang", "bucket", "sh")
      .agg(countDistinct("doc_id").as("df"))
      .filter(col("df") > ngramDfCap)
      .select("lang", "bucket", "sh")
    // one shuffle groups each RARE (block, gram) to its posting set —
    // genuinely bounded at ≤ cap ids because hot grams were excluded
    // BEFORE the collect — then the pair generation is a MAP-SIDE
    // explode of at most cap²/2 rows per gram. No inverted-index
    // self-join, no global distinct.
    val byGram = g.join(broadcast(hot), Seq("lang", "bucket", "sh"), "left_anti")
      .groupBy("lang", "bucket", "sh")
      .agg(collect_set("doc_id").as("ds"))
    val candRare = byGram
      .filter(size(col("ds")).between(2, ngramDfCap))
      .select(col("ds"), explode(col("ds")).as("d1"))
      .select(col("d1"), explode(col("ds")).as("d2"))
      .filter(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("rare_inter"))
    // hot-gram rows joined only against candidate pairs; occurrence
    // duplicates are absorbed by the countDistinct below
    val gh = g.join(broadcast(hot), Seq("lang", "bucket", "sh"))
      .select(col("sh"), col("doc_id"))
    val interHot = candRare.select("d1", "d2")
      .join(gh.select(col("doc_id").as("d1"), col("sh")), "d1")
      .join(gh.select(col("doc_id").as("d2"), col("sh")), Seq("d2", "sh"))
      .groupBy("d1", "d2").agg(countDistinct("sh").as("hot_inter"))
    candRare.join(interHot, Seq("d1", "d2"), "left")
      .withColumn("inter", col("rare_inter") + coalesce(col("hot_inter"), lit(0L)))
      .join(sizes.select(col("doc_id").as("d1"), col("nsh").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("nsh").as("n2")), "d2")
      .withColumn("jaccard", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jaccard") >= 0.2)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  /** MinHash signatures as k min-agg columns: explode shingles once,
    * hash each against k seeds columnar-wise, map-side-combine the
    * mins. Beats the nested higher-order-function form ~10× (no
    * per-seed array materialization; everything stays in whole-stage
    * codegen + partial aggregation). */
  private[operators] def minhashDocs(spark: SparkSession, dir: String, k: Int = 64): DataFrame = {
    // min() over duplicate shingles equals min() over the distinct
    // set, so gram rows feed the signature directly — one pass via
    // the native MinHashAgg imperative aggregate (bit-equal to the
    // k-column min formulation; see MinHashAggSpec).
    val exploded = gramRows(spark, dir, lowercase = true).select("doc_id", "sh")
    exploded.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg(col("sh"), k).as("sig"))
  }

  /** MinHash + LSH near-dup detection (shingle → minhash → band →
    * bucket-join → Jaccard verify). Per-doc output: its candidate
    * count and best verified match (never empty — the pair list is a
    * filter on dup_of). b=16 bands × r=4 rows; only (doc_id) ints
    * flow through the bucket join, shingle sets are joined back for
    * the verify stage alone. */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val bands = 16
    val r = 4
    val gd = gramRows(spark, dir, lowercase = true)
      .select("doc_id", "sh").distinct().persist()
    val sizes = gd.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val sig = gd.groupBy("doc_id")
      .agg(graft.functions.MinHashAgg(col("sh"), bands * r).as("sig"))
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until r).map(i =>
            element_at(col("sig"), b * r + i + 1)): _*).as("bkey"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
    val candIds = banded.select(col("doc_id").as("d1"), col("band"), col("bkey"))
      .join(banded.select(col("doc_id").as("d2"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    // verify via inverted index restricted to the candidate pairs —
    // |A∩B| counted with joins, no shingle arrays materialized
    val inter = candIds.join(gd.select(col("doc_id").as("d1"), col("sh")), "d1")
      .join(gd.select(col("doc_id").as("d2"), col("sh")), Seq("d2", "sh"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("inter"))
    val cand = candIds.join(inter, Seq("d1", "d2"), "left")
      .join(sizes.select(col("doc_id").as("d1"), col("nsh").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("nsh").as("n2")), "d2")
      .withColumn("interc", coalesce(col("inter"), lit(0L)))
      .withColumn("jaccard", col("interc") / (col("n1") + col("n2") - col("interc")))
    val perDoc = cand
      .select(explode(array(
        struct(col("d1").as("doc_id"), col("jaccard")),
        struct(col("d2").as("doc_id"), col("jaccard")))).as("x"))
      .select(col("x.doc_id"), col("x.jaccard"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_candidates"), max("jaccard").as("best_jaccard"))
    sizes.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(round(col("best_jaccard"), 6), lit(0.0)).as("best_jaccard"),
        (coalesce(col("best_jaccard"), lit(0.0)) >= 0.2).as("is_near_dup"))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash per doc via the native [[graft.functions.SimHash64Expr]]
    * — a pure map-side projection: no explode, no 64-way aggregation,
    * no shuffle (see SimHashEquivalenceSpec for bit-equality with the
    * explode+majority-vote formulation). */
  private[operators] def simhashDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.GraftExpressions.simhash64(
          split(lower(col("text")), " ")).as("simhash"))

  /** The explode + 64-column majority-vote formulation (kept for
    * cross-checking the native expression in specs). */
  private[operators] def simhashDocsExploded(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(lower(col("text")), " ")).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val sumCols = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b")
    }
    val sums = toks.groupBy("doc_id").agg(sumCols.head, sumCols.tail: _*)
    val simhash = (0 until 64).map { b =>
      shiftleft(when(col(s"s$b") > 0, 1L).otherwise(0L), b)
    }.reduce(_ bitwiseOR _)
    sums.select(col("doc_id"), simhash.as("simhash"))
  }

  /** SimHash near-dup: 4×16-bit chunk bucketing (pigeonhole for
    * hamming ≤ 3 on ≥1 equal chunk), verify with bit_count(xor).
    * Per-doc output: simhash + nearest-candidate hamming. */
  def dedupSimhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = simhashDocs(spark, dir).persist()
    val chunked = docs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("simhash"), c * 16).bitwiseAND(0xFFFFL).as("ckey"))
      }: _*)).as("cc"))
      .select(col("doc_id"), col("simhash"), col("cc.chunk"), col("cc.ckey"))
    val a = chunked.select(col("doc_id").as("d1"), col("simhash").as("h1"),
      col("chunk"), col("ckey"))
    val b = chunked.select(col("doc_id").as("d2"), col("simhash").as("h2"),
      col("chunk"), col("ckey"))
    val cand = a.join(b, Seq("chunk", "ckey"))
      .filter(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        bit_count(col("h1").bitwiseXOR(col("h2"))).cast("long").as("hamming"))
      .distinct()
    val perDoc = cand
      .select(explode(array(
        struct(col("d1").as("doc_id"), col("hamming")),
        struct(col("d2").as("doc_id"), col("hamming")))).as("x"))
      .select(col("x.doc_id"), col("x.hamming"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_candidates"), min("hamming").as("min_hamming"))
    docs.select("doc_id", "simhash")
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("simhash"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(col("min_hamming"), lit(64L)).as("min_hamming"),
        (coalesce(col("min_hamming"), lit(64L)) <= 3).as("is_near_dup"))
      .orderBy("doc_id")
  }

  /** Embedding-cosine near-dup pairs, blocked on arithmetic-
    * hyperplane LSH sign buckets (the [[Similarity.signBucket]]
    * machinery): candidates are pairs whose 8-bit buckets differ by
    * ≤1 bit (multiprobe), verified with the exact left-fold cosine.
    * Blocking on a hash of the vector itself keeps the join key
    * high-cardinality and data-independent — label blocks are few
    * and skewed (n²/k pairs per label). nPlanes scales ~log2(n) at
    * 100 TB so bucket count tracks corpus size. Norms are
    * precomputed once per vector (same sqrt(dot(v,v)) fold as the
    * oracle → bit-identical cosine). */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val nPlanes = 8
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), toDoubleVec(col("embedding")).as("v"))
      .withColumn("n", l2Norm(col("v")))
      .withColumn("bucket", Similarity.signBucket(col("v"), nPlanes))
    val a = e.select(col("vec_id").as("v1"), col("v").as("va"),
      col("n").as("na"), col("bucket"))
    // each right-side vector probes its bucket + all 1-bit flips, so
    // a hamming-≤1 bucket pair matches exactly one probe (no dups)
    val b = e.select(col("vec_id").as("v2"), col("v").as("vb"), col("n").as("nb"),
      explode(array(
        col("bucket") +: (0 until nPlanes).map(j =>
          col("bucket").bitwiseXOR(1 << j)): _*)).as("pb"))
    a.join(b, col("bucket") === col("pb") && col("v1") < col("v2"))
      .withColumn("cos_sim", round(dot(col("va"), col("vb")) / (col("na") * col("nb")), 6))
      .filter(col("cos_sim") >= 0.3)
      .select("v1", "v2", "cos_sim")
      .orderBy("v1", "v2")
  }

  /** Benchmark decontamination: flag training documents sharing any
    * word-5-gram with the eval set (docs with doc_id % 97 == 0 stand
    * in for a held-out benchmark). The eval side of the join is
    * BROADCAST — eval suites are fixed-size (thousands of docs), so
    * at 100 TB the contamination check stays a map-side hash probe
    * over the training corpus: no shuffle of the big side, ever.
    * Gram generation is the same map-side [[gramRows]] machinery
    * (native WordNgramsExpr, no posexplode+window). */
  def decontaminateNgram(spark: SparkSession, dir: String): DataFrame = {
    // train-side gram rows are NOT globally distinct'd — the final
    // countDistinct agg dedups, and a global distinct would shuffle
    // the whole training corpus's grams (the one thing this plan
    // must never do). Only the tiny eval side dedups pre-broadcast.
    val grams = t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(graft.functions.GraftExpressions.wordNgrams(col("text"), 5)).as("g"))
    val evalGrams = grams.filter(col("doc_id") % 97 === 0).distinct()
      .select(col("doc_id").as("eval_id"), col("g"))
    grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      .agg(countDistinct("g").as("n_shared_grams"),
        countDistinct("eval_id").as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** Duplicate-cluster assignment: connected components over the
    * union of exact-normalized duplicate pairs and n-gram-Jaccard
    * near-dup pairs; every clustered doc gets comp = min doc_id in
    * its component (the canonical keeper).
    *
    * Distributed hash-min label propagation: each round joins the
    * (small — only docs that appear in some dup pair) label set
    * against the symmetric edge list and takes the per-node min of
    * neighbor labels; converges in O(component diameter) rounds —
    * dup clusters are shallow (near-clique), so a handful of rounds
    * at any scale. Only label rows shuffle per round; the corpus
    * itself is never re-read. The driver sees one COUNT per round
    * (convergence test), never data rows. */
  def dedupClusterCC(spark: SparkSession, dir: String): DataFrame = {
    val hashed = t(spark, dir, "documents")
      .select(col("doc_id"),
        md5(lower(trim(regexp_replace(col("text"), "\\s+", " ")))
          .cast("binary")).as("h"))
    val exactPairs = hashed.select(col("doc_id").as("d1"), col("h"))
      .join(hashed.select(col("doc_id").as("d2"), col("h")), "h")
      .filter(col("d1") < col("d2"))
      .select("d1", "d2")
    val nearPairs = dedupNgramJaccard(spark, dir).select("d1", "d2")
    val edges = exactPairs.union(nearPairs).distinct()
    // symmetric closure via one map-side explode — a union of the
    // edge set with its own reversal would run the whole (expensive)
    // edge-derivation lineage twice before the persist materializes
    val sym = edges.select(explode(array(
        struct(col("d1"), col("d2")),
        struct(col("d2").as("d1"), col("d1").as("d2")))).as("e"))
      .select(col("e.d1"), col("e.d2"))
      .persist()
    var cached = sym.select(col("d1").as("id")).distinct()
      .withColumn("comp", col("id")).persist()
    var labels = cached
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 50) {
      val viaNeighbor = sym
        .join(labels.select(col("id").as("d2"), col("comp")), "d2")
        .groupBy(col("d1").as("id")).agg(min("comp").as("ncomp"))
      val next = labels.join(viaNeighbor, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("ncomp"), col("comp"))).as("comp"),
          col("comp").as("prev"))
        .persist()
      changed = next.filter(col("comp") =!= col("prev")).count()
      cached.unpersist()
      cached = next
      labels = next.select("id", "comp")
      rounds += 1
    }
    // localCheckpoint (eager) materializes the converged labels and
    // cuts the loop's lineage, so BOTH loop caches can be released
    // here instead of leaking one cached label set per invocation;
    // the checkpoint blocks themselves are reclaimed by Spark's
    // ContextCleaner once the returned frame is unreachable.
    val out = labels.localCheckpoint(true)
      .select(col("id").as("doc_id"), col("comp")).orderBy("doc_id")
    cached.unpersist()
    sym.unpersist()
    out
  }
}
