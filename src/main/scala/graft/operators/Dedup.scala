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
  * LSH band buckets (minhash), chunk buckets (simhash), (lang,
  * length-bucket) blocks (jaccard), label blocks (embedding). The
  * only shuffles are the bucket-key joins; bucket keys are
  * high-cardinality → skew-safe at 100 TB.
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

  /** Word-3-gram sets per doc, with a (lang, length-bucket) blocking key. */
  private def gramDocs(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), expr("n_chars DIV 10").as("bucket"),
        array_distinct(wordNgrams(col("text"), 3)).as("grams"))

  /** N-gram Jaccard near-dup pairs within (lang, length) blocks —
    * the verification stage shared by the LSH variants. */
  def dedupNgramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = gramDocs(spark, dir)
    val a = d.select(col("doc_id").as("d1"), col("lang"), col("bucket"), col("grams").as("g1"))
    val b = d.select(col("doc_id").as("d2"), col("lang"), col("bucket"), col("grams").as("g2"))
    a.join(b, Seq("lang", "bucket"))
      .filter(col("d1") < col("d2"))
      .withColumn("jaccard",
        size(array_intersect(col("g1"), col("g2"))) /
          size(array_distinct(array_union(col("g1"), col("g2")))))
      .filter(col("jaccard") >= 0.2)
      .select("d1", "d2", "jaccard")
      .orderBy("d1", "d2")
  }

  /** MinHash signatures: k hashes, each the min over shingles of
    * xxhash64(shingle, seed). */
  private[operators] def minhashDocs(spark: SparkSession, dir: String, k: Int = 64): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(wordNgrams(lower(col("text")), 3)).as("shingles"))
      .filter(size(col("shingles")) > 0)
      .withColumn("sig",
        transform(sequence(lit(0), lit(k - 1)), s =>
          array_min(transform(col("shingles"), sh => xxhash64(sh, s)))))

  /** MinHash + LSH near-dup detection (shingle → minhash → band →
    * bucket-join → Jaccard verify). Per-doc output: its candidate
    * count and best verified match (never empty — the pair list is a
    * filter on dup_of). b=16 bands × r=4 rows. */
  def dedupMinhashLsh(spark: SparkSession, dir: String): DataFrame = {
    val bands = 16
    val r = 4
    val docs = minhashDocs(spark, dir).persist()
    val banded = docs.select(col("doc_id"), col("shingles"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64((1 to r).map(i => element_at(col("sig"), b * r + i)): _*).as("bkey"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("shingles"), col("bb.band"), col("bb.bkey"))
    val a = banded.select(col("doc_id").as("d1"), col("shingles").as("s1"),
      col("band"), col("bkey"))
    val b = banded.select(col("doc_id").as("d2"), col("shingles").as("s2"),
      col("band"), col("bkey"))
    val cand = a.join(b, Seq("band", "bkey"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2", "s1", "s2").distinct()
      .withColumn("jaccard",
        size(array_intersect(col("s1"), col("s2"))) /
          size(array_distinct(array_union(col("s1"), col("s2")))))
    val perDoc = cand
      .select(explode(array(
        struct(col("d1").as("doc_id"), col("jaccard")),
        struct(col("d2").as("doc_id"), col("jaccard")))).as("x"))
      .select(col("x.doc_id"), col("x.jaccard"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_candidates"), max("jaccard").as("best_jaccard"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
        coalesce(round(col("best_jaccard"), 6), lit(0.0)).as("best_jaccard"),
        (coalesce(col("best_jaccard"), lit(0.0)) >= 0.2).as("is_near_dup"))
      .orderBy("doc_id")
  }

  /** 64-bit SimHash per doc: majority vote over token-hash bits,
    * assembled with bitwise ops (no overflow). */
  private[operators] def simhashDocs(spark: SparkSession, dir: String): DataFrame = {
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

  /** Embedding-cosine near-dup pairs within label blocks (exact
    * IEEE-portable cosine; threshold 0.3 on the 6-dp rounding). */
  def dedupEmbeddingCosine(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), toDoubleVec(col("embedding")).as("v"))
    val a = e.select(col("vec_id").as("v1"), col("label"), col("v").as("va"))
    val b = e.select(col("vec_id").as("v2"), col("label"), col("v").as("vb"))
    a.join(b, Seq("label"))
      .filter(col("v1") < col("v2"))
      .withColumn("cos_sim", cosineR(col("va"), col("vb")))
      .filter(col("cos_sim") >= 0.3)
      .select("v1", "v2", "label", "cos_sim")
      .orderBy("v1", "v2")
  }
}
