package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.t
import graft.functions.GraftExpressions.{doubleToDecimal18 => d2dec}
import graft.functions.TextFunctions._

/** §2e text-analysis queries over the documents table. */
object TextAnalysis {

  /** Token counting: whitespace, regex-word, and BPE-estimate. */
  def textTokens(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        wsTokens(col("text")).as("ws_tokens"),
        reTokens(col("text")).as("re_tokens"),
        bpeTokensEst(col("text")).as("bpe_tokens_est"))
      .orderBy("doc_id")

  /** Quality scoring: length, mean word length, stopword ratio, score. */
  def textQuality(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars_actual"),
        wsTokens(col("text")).as("n_tokens"),
        round(meanWordLen(col("text")), 6).as("mean_word_len"),
        round(stopwordRatio(col("text")), 6).as("stopword_ratio"),
        qualityScore(col("text")).as("quality_score"))
      .orderBy("doc_id")

  /** Language ID: marker-word voting per language. */
  def textLangid(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        col("lang").as("labeled_lang"),
        predictedLang(col("text")).as("pred_lang"),
        langHits(col("text"), "en").as("en_hits"),
        langHits(col("text"), "es").as("es_hits"),
        langHits(col("text"), "de").as("de_hits"),
        langHits(col("text"), "fr").as("fr_hits"))
      .orderBy("doc_id")

  /** Language-ID confusion matrix: the [[textLangid]] heuristic's
    * predictions against the labeled `lang` column, as (labeled,
    * predicted) counts — the evaluation view a corpus curator reads
    * before trusting a language filter. Bounded output
    * (|langs|+1)²; one map-side prediction + one tiny aggregate. */
  def textLangConfusion(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("lang").as("labeled_lang"),
        predictedLang(col("text")).as("pred_lang"))
      .groupBy("labeled_lang", "pred_lang")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("is_correct",
        (col("labeled_lang") === col("pred_lang")).cast("int"))
      .orderBy("labeled_lang", "pred_lang")

  /** Document fingerprint: polynomial rolling hash mod 1e9+7, via the
    * O(n) codegen'd [[graft.functions.RollingHashExpr]] (byte-
    * identical to the builtin-composed ascii-fold on this ASCII
    * corpus — and to the DuckDB oracle). */
  def textFingerprint(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"),
        graft.functions.GraftExpressions.rollingHash(lower(trim(col("text")))).as("fp"))
      .orderBy("doc_id")

  /** Rare-token profile per document: distinct tokens whose CORPUS
    * document frequency is ≤ 2 (misspellings, ids, boilerplate noise —
    * a common quality / contamination signal). Integer counts + one
    * final division keep the oracle exact. Scale shape: explode →
    * distinct → two hash aggs + a high-cardinality token join. */
  def textRareTokens(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .distinct()
    val dfreq = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val perDoc = toks.groupBy("doc_id").agg(count(lit(1)).as("n_distinct_tokens"))
    val rare = toks.join(dfreq.filter(col("df") <= 2), "tok")
      .groupBy("doc_id").agg(count(lit(1)).as("n_rare"))
    perDoc.join(rare, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_distinct_tokens"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        round(coalesce(col("n_rare"), lit(0L)).cast("double") / col("n_distinct_tokens"), 6)
          .as("rare_ratio"))
      .orderBy("doc_id")
  }

  /** Corpus n-gram stats: top-20 word trigrams (gram rows via the
    * codegen'd posexplode+lead path — see Dedup.gramRows). */
  def textNgramStats(spark: SparkSession, dir: String): DataFrame =
    Dedup.gramRows(spark, dir, lowercase = false)
      .select(col("sh").as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(20)

  /** Intra-document repetition signals (the Gopher/MassiveText
    * repetition filters re-expressed over this corpus): fraction of
    * tokens taken by the single most frequent word plus duplicate
    * bigram/trigram fractions, and the keep verdict at the
    * calibrated thresholds (top word ≤ 0.15 of tokens, duplicate
    * bigrams ≤ 0.10). Entirely map-side: the top-word count is the
    * longest run in the doc's SORTED token array (one O(n log n)
    * aggregate HOF per doc — no token explode, no shuffle even for
    * arbitrarily long docs), and the n-gram arrays come from the
    * codegen'd [[graft.functions.WordNgramsExpr]]. At 100 TB this is
    * a scan-rate projection; the oracle re-derives the top word by
    * unnest + GROUP BY, an independent formulation. */
  def textRepetition(spark: SparkSession, dir: String): DataFrame = {
    def dupFrac(g: org.apache.spark.sql.Column) =
      when(size(g) > 0,
        round(lit(1.0) - size(array_distinct(g)).cast("double") / size(g), 6))
        .otherwise(lit(0.0))
    // longest run in the sorted token array == max token multiplicity;
    // the NULL seed can never equal a real token, so the first element
    // always opens a run of 1
    val topCount = expr(
      """aggregate(array_sort(toks),
        |  struct(CAST(NULL AS STRING) AS prev, 0 AS run, 0 AS best),
        |  (s, x) -> struct(x AS prev,
        |    IF(x = s.prev, s.run + 1, 1) AS run,
        |    GREATEST(s.best, IF(x = s.prev, s.run + 1, 1)) AS best),
        |  s -> s.best)""".stripMargin)
    val topFrac = round(topCount.cast("double") / size(col("toks")), 6)
    val duBi = dupFrac(col("g2"))
    val duTri = dupFrac(col("g3"))
    // Round 16 (guide §4): the single-projection form wrote the
    // aggregate HOF twice (once as top_word_frac, once inside keep)
    // and each wordNgrams THREE times inside its dupFrac — and the
    // interpreted HOF path gets no runtime subexpression elimination,
    // so every doc paid ~2× the work. Staged projections evaluate
    // each expensive expression ONCE; CollapseProject keeps the
    // stages apart because the aliases are non-cheap and
    // multiply-referenced. keep is derived from the OUTPUT columns —
    // the same rounded values the old form compared — so results are
    // bit-identical (measured 1.50 → 1.09 s min-of-4 at sf0.1).
    t(spark, dir, "documents")
      .select(col("doc_id"),
        split(col("text"), " ").as("toks"),
        graft.functions.GraftExpressions.wordNgrams(col("text"), 2).as("g2"),
        graft.functions.GraftExpressions.wordNgrams(col("text"), 3).as("g3"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        topFrac.as("top_word_frac"),
        duBi.as("dup_bigram_frac"),
        duTri.as("dup_trigram_frac"))
      .withColumn("keep",
        (col("top_word_frac") <= 0.15 && col("dup_bigram_frac") <= 0.10)
          .cast("int"))
      .orderBy("doc_id")
  }

  /** Per-document token-distribution Shannon entropy + type-token
    * ratio — the lexical-diversity quality signal (low entropy =
    * repetitive/templated text). Entirely map-side: each doc's token
    * multiplicities are the run lengths of its SORTED token array
    * (the [[textRepetition]] aggregate-HOF trick — no explode, no
    * shuffle, scan-rate at 100 TB), and each run contributes
    * `run · lnq(run/n)` to an integer accumulator.
    *
    * Cross-engine determinism (the [[textPerplexity]] recipe): ln is
    * quantized at 1e-4 into a BIGINT per run, the per-doc sum is
    * integer-exact, and the single closing division
    * `-acc / (n·10⁴)` maps bit-identical integers through one IEEE
    * division — nothing downstream is rounded. The oracle re-derives
    * multiplicities by unnest + GROUP BY, an independent formulation.
    */
  def textEntropy(spark: SparkSession, dir: String): DataFrame = {
    // run * round(ln(run/n)*1e4) as BIGINT; ln of a count ratio is a
    // transcendental that never sits on a .5 rounding boundary
    def q(run: String) =
      s"$run * CAST(round(ln(CAST($run AS DOUBLE) / n_tokens) * 10000) AS BIGINT)"
    val entQ = expr(
      s"""aggregate(array_sort(toks),
         |  named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'acc', 0L),
         |  (s, x) -> IF(x = s.prev,
         |    named_struct('prev', x, 'run', s.run + 1L, 'acc', s.acc),
         |    named_struct('prev', x, 'run', 1L,
         |      'acc', s.acc + IF(s.prev IS NULL, 0L, ${q("s.run")}))),
         |  s -> s.acc + ${q("s.run")})""".stripMargin)
    t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("n_distinct", size(array_distinct(col("toks"))).cast("long"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        ((-entQ).cast("double") /
          (col("n_tokens") * lit(10000L)).cast("double")).as("token_entropy"))
      .withColumn("keep", (col("token_entropy") >= 2.5).cast("int"))
      .orderBy("doc_id")
  }

  /** BPE merge-rule learning (Sennrich et al. 2016 — the tokenizer-
    * training primitive of every modern LM pipeline): learn the top-N
    * byte-pair merges from the corpus.
    *
    * Scale shape: the corpus crosses a shuffle exactly ONCE (the
    * word-frequency aggregate); the merge loop then runs entirely on
    * the frequency-weighted VOCABULARY table — bounded by the
    * language, not the corpus, so 100 TB of text and 100 GB of text
    * iterate over the same-sized relation. Each iteration is one
    * bounded pair-count aggregate, a ONE-ROW collect (the argmax
    * pair — the CC convergence-scalar class of driver access), and a
    * map-side fold applying the merge inside each word's symbol
    * array (an aggregate HOF — no explode, no shuffle). Every
    * iteration ends in an eager localCheckpoint: the symbol arrays
    * are the loop state, and 20 stacked HOF rewrites would otherwise
    * recompute the whole chain per round (the [[graft.operators.Dedup]]
    * hashMinComponents lineage lesson).
    *
    * Determinism: ties in pair counts break on the pair itself
    * (lexicographic), so the merge table is a pure function of the
    * corpus. No SQL oracle — an iterative fixpoint is outside
    * DuckDB's single-query model (declared ◦); LlmOpsSpec instead
    * re-derives the merges with an independent in-memory
    * implementation and asserts table equality.
    */
  def textBpeTrain(spark: SparkSession, dir: String,
      numMerges: Int = 20, minPairCount: Long = 2L): DataFrame = {
    import spark.implicits._
    val words = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    var vocab = words
      .select(col("freq"),
        concat(split(col("w"), ""), array(lit("</w>"))).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[(Int, String, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val top = vocab
        .select(col("freq"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |         slice(syms, 2, size(syms) - 1),
            |         (a, b) -> struct(a AS a, b AS b))""".stripMargin)).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (top.isEmpty || top.head.getAs[Long]("cnt") < minPairCount)
        done = true
      else {
        val a = top.head.getAs[String]("a")
        val b = top.head.getAs[String]("b")
        merges += ((rank, a, b, a + b, top.head.getAs[Long]("cnt")))
        def q(s: String) = s.replace("\\", "\\\\").replace("'", "\\'")
        // greedy left-to-right single-pass merge of (a, b) inside each
        // word's symbol array; a fresh merge never re-pairs with the
        // following symbol in the same pass (standard BPE semantics)
        val next = vocab.withColumn("syms", expr(
          s"""aggregate(syms,
             |  named_struct('acc', CAST(array() AS ARRAY<STRING>),
             |               'prev', CAST(NULL AS STRING)),
             |  (s, x) -> IF(s.prev IS NULL,
             |    named_struct('acc', s.acc, 'prev', x),
             |    IF(s.prev = '${q(a)}' AND x = '${q(b)}',
             |      named_struct('acc', concat(s.acc, array('${q(a + b)}')),
             |                   'prev', CAST(NULL AS STRING)),
             |      named_struct('acc', concat(s.acc, array(s.prev)),
             |                   'prev', x))),
             |  s -> IF(s.prev IS NULL, s.acc,
             |          concat(s.acc, array(s.prev))))""".stripMargin))
          .localCheckpoint(true)
        vocab = next
        rank += 1
      }
    }
    merges.result().toDF("rank", "left", "right", "merged", "pair_count")
      .orderBy("rank")
  }

  /** Fixture seam of [[textBpeApply]]: the learned merge table is
    * persisted HERE (parquet) so the DuckDB oracle can read the
    * exact same rules — the CellCodebook.save precedent applied to
    * the tokenizer. The ROOT is fixed (oracle SQL is static text),
    * but each corpus writes its OWN `docs_<n>_<chars>_f<fp>_v<ver>`
    * subdir and stamps every row with (`corpus_docs`, `corpus_chars`,
    * `corpus_fp`); the oracle globs the root and filters all three
    * against the documents table it sees, so fixtures for different
    * corpora COEXIST — a 10× Verify no longer clobbers the sf0.01
    * fixture between a dump and its compare. Round-13 advice
    * hardening: (docs, chars) alone left same-count corpora
    * UNDETECTED if they collided (the sf0.001/sf0.01 pair already
    * agree on docs) — `corpus_fp`, a content fingerprint both
    * engines compute identically (see [[BpeCorpusFpSpark]]),
    * disambiguates on the text itself; and the overwrite window is
    * CLOSED by write-once + atomic-rename publication (see
    * [[textBpeApply]]) instead of delete-then-write. */
  private[graft] val BpeFixturePath = "/tmp/graft-bpe-merges.parquet"

  /** Staging root for [[textBpeApply]]'s fixture writes — OUTSIDE
    * the oracle's glob, so a half-written table can never be read. */
  private[graft] val BpeFixtureTmp = "/tmp/graft-bpe-merges.tmp"

  /** Fixture FORMAT/TRAINER version, part of the subdir name. Bump
    * on ANY change to [[textBpeTrain]]'s algorithm, the symbol
    * encoding, or the fixture schema: the write-once cache keys on
    * (corpus, version), so without the bump a code change would keep
    * gating against stale merges (review catch, round 14). v2 =
    * round-14 content-fingerprint format. */
  private[graft] val BpeFixtureVer = 2

  /** Corpus content fingerprint (Spark SQL form): a cheap exact-
    * integer digest over (doc_id, length, first/middle/last char)
    * that distinguishes corpora agreeing on both row count and char
    * total. NOT a cryptographic hash — a collision detector for the
    * fixture seam, where the failure mode is two gate corpora
    * sharing a subdir. Magnitude: ≤ max_id·max_len·131 per doc
    * (≈4e9 at the 10× corpus) summed over ≤5e4 docs ≈ 2e14 ≪ 2⁶³.
    * [[BpeCorpusFpDuck]] is the same formula in DuckDB dialect;
    * keep them in lockstep. */
  private[graft] val BpeCorpusFpSpark: String =
    "sum(doc_id * length(text) * 131 + ascii(substr(text, 1, 1)) * 31" +
      " + ascii(substr(text, length(text) DIV 2 + 1, 1)) * 7" +
      " + ascii(substr(text, length(text), 1)))"

  /** DuckDB dialect of [[BpeCorpusFpSpark]] (strlen ≡ length on the
    * ASCII corpus; `//` is DuckDB integer division). Interpolated
    * into the oracle SQL so the two sides cannot drift. */
  private[graft] val BpeCorpusFpDuck: String =
    "SUM(doc_id * strlen(text) * 131 + ascii(substr(text, 1, 1)) * 31" +
      " + ascii(substr(text, strlen(text) // 2 + 1, 1)) * 7" +
      " + ascii(substr(text, strlen(text), 1)))"

  /** Symbol wrappers of [[textBpeApply]]'s string encoding (SO/SI
    * control chars — provably absent from the documents corpus, whose
    * alphabet is lowercase ASCII + space; asserted in LlmOpsSpec). */
  private[graft] val BpeS1 = "\u000E"
  private[graft] val BpeS2 = "\u000F"

  /** BPE merge-table APPLICATION (round 13) — the other half of the
    * tokenizer lifecycle: [[textBpeTrain]]'s learned merges, persisted
    * as a fixture BOTH engines read, re-tokenize every document; the
    * query emits per-doc word/symbol/BPE-token counts and the
    * compression ratio. This is the verdict-directed contract gate for
    * the one remaining unchecked semantic: the train LOOP stays ◦
    * (iterative fixpoint, outside a single SQL query), but its
    * OUTPUT now feeds a fully oracle-checked application, so a wrong
    * merge table breaks this row's hash at both SFs.
    *
    * Encoding: each symbol rides as ⟨sym⟩ (SO/SI-wrapped), a word's
    * chars wrap individually, word boundaries become the ⟨</w>⟩
    * symbol, and applying merge (a,b)→ab is ONE literal
    * `replace(s, ⟨a⟩⟨b⟩, ⟨ab⟩)`: left-to-right non-overlapping
    * replacement with no rescan of the replacement text — exactly
    * the greedy single-pass fold BPE specifies (and textBpeTrain's
    * aggregate implements), while false matches are impossible (a
    * pattern can't start or end mid-symbol, and no learned rule
    * crosses a word boundary because ⟨</w>⟩ is always word-final in
    * training). The oracle replays the same replace chain via a
    * recursive CTE joined to the fixture by rank.
    *
    * Scale shape: the merge table is O(vocab-rules) — collected once
    * (bounded, the codebook class of driver access) and inlined as
    * ~20 literal codegen'd string replaces; the whole query is then
    * ONE map-side scan of documents (no join, no shuffle but the
    * terminal sort). Train cost is vocabulary-bounded, not
    * corpus-bounded (see [[textBpeTrain]]). */
  def textBpeApply(spark: SparkSession, dir: String): DataFrame = {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    def w(s: String) = BpeS1 + s + BpeS2
    val stat = t(spark, dir, "documents")
      .agg(count(lit(1)), sum(length(col("text")).cast("long")),
        expr(BpeCorpusFpSpark)).head()
    val (nDocs, nChars, corpusFp) =
      (stat.getLong(0), stat.getLong(1), stat.getLong(2))
    val fixtureDir =
      s"$BpeFixturePath/docs_${nDocs}_${nChars}_f${corpusFp}_v$BpeFixtureVer"
    // Evict fixture dirs of any OTHER format/trainer version: the
    // oracle's glob unions every subdir's schema, so a stale
    // pre-versioning dir (no corpus_fp column) binder-errors the
    // whole read (review catch — DuckDB requires consistent schemas
    // across a glob). Current-version dirs for other corpora stay.
    Option(new java.io.File(BpeFixturePath).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && !f.getName.endsWith(s"_v$BpeFixtureVer"))
      .foreach(Streams.rmTree)
    // Write-once + atomic publication (round-13 advice): the fixture
    // is a deterministic function of the (corpus, version) key, so an
    // existing complete table (_SUCCESS present) is byte-equivalent
    // to what a retrain would produce — skip the rewrite rather than
    // opening a delete-then-write window against a concurrent oracle
    // read. First writers stage OUTSIDE the oracle glob and rename(2)
    // into place; a loser of a same-corpus race discards its staging
    // dir.
    if (!JFiles.exists(JPaths.get(fixtureDir, "_SUCCESS"))) {
      val tmp = s"$BpeFixtureTmp/${java.util.UUID.randomUUID}"
      textBpeTrain(spark, dir)
        .select("rank", "left", "right", "merged")
        .withColumn("corpus_docs", lit(nDocs))
        .withColumn("corpus_chars", lit(nChars))
        .withColumn("corpus_fp", lit(corpusFp))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      JFiles.createDirectories(JPaths.get(BpeFixturePath))
      try JFiles.move(JPaths.get(tmp), JPaths.get(fixtureDir),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case e: java.nio.file.FileSystemException =>
          org.apache.hadoop.fs.FileSystem
            .getLocal(spark.sparkContext.hadoopConfiguration)
            .delete(new org.apache.hadoop.fs.Path(tmp), true)
          // a lost same-corpus race leaves the WINNER's complete
          // fixture in place; any other move failure (permissions,
          // EXDEV across tmp roots, partial write) leaves nothing —
          // rethrow it here instead of surfacing later as an
          // unrelated missing-path read (ADVICE round 14)
          if (!JFiles.exists(JPaths.get(fixtureDir, "_SUCCESS"))) throw e
      }
    }
    // re-read what was WRITTEN: the applied rules are provably the
    // fixture's rules, not the in-memory table that produced it
    val merges = spark.read.parquet(fixtureDir)
      .orderBy("rank").collect()
      .map(r => (r.getAs[String]("left"), r.getAs[String]("right"),
        r.getAs[String]("merged")))
    val s0 = concat(
      regexp_replace(
        regexp_replace(col("text"), "(.)", w("$1")),
        w(" "), w("</w>")),
      lit(w("</w>")))
    val applied = merges.foldLeft(col("s0")) { case (c, (a, b, m)) =>
      replace(c, lit(w(a) + w(b)), lit(w(m)))
    }
    def nSyms(c: org.apache.spark.sql.Column) =
      (length(c) - length(replace(c, lit(BpeS1)))).cast("long")
    t(spark, dir, "documents")
      .select(col("doc_id"), col("text"),
        size(split(col("text"), " ")).cast("long").as("n_words"), s0.as("s0"))
      .withColumn("n_base_syms", nSyms(col("s0")))
      .withColumn("sf", applied)
      .select(col("doc_id"), col("n_words"), col("n_base_syms"),
        nSyms(col("sf")).as("n_bpe_tokens"),
        round(col("n_base_syms").cast("double") /
          nSyms(col("sf")).cast("double"), 6).as("compression"))
      .orderBy("doc_id")
  }

  /** Per-document top-k TF-IDF keywords — the classic
    * keyword-extraction / doc-representation primitive. Scoring is
    * ALL-INTEGER: `score_q = tf · round(ln(N/df)·10⁴)` (the
    * [[textPerplexity]] ln-quantization recipe taken to its
    * conclusion — with tf and the quantized idf both integers, no
    * float ever crosses an engine boundary, and ranking ties break
    * on the term itself).
    *
    * Scale shape: one (doc, term) count shuffle (map-side combining
    * absorbs token skew), document frequencies aggregated FROM that
    * table (already distinct per doc, and term-cardinality-sized),
    * a top-K vocab broadcast back (the perplexity cap — per-term df
    * lookup is a broadcast hash join at any corpus size), and the
    * per-doc top-k via a doc-partitioned row_number window. Linear
    * end to end; nothing pairwise.
    */
  def textKeywordsTfidf(spark: SparkSession, dir: String,
      vocabK: Int = 50000, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(spark, dir, "documents")
    val toks = docs.select(col("doc_id"),
      explode(split(col("text"), " ")).as("tok"))
    val tf = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(col("df").desc, col("tok").asc).limit(vocabK)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_q").desc, col("tok").asc)
    tf.join(broadcast(vocab), "tok")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_q", col("tf") *
        expr("CAST(round(ln(CAST(n_docs AS DOUBLE) / df) * 10000) AS BIGINT)"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("tok").as("term"),
        col("tf"), col("df"), col("score_q"))
      .orderBy("doc_id", "rank")
  }

  /** Unigram language-model scoring (the CCNet-style perplexity
    * quality filter, with the corpus itself as the LM): per-doc
    * cross-entropy and perplexity under the corpus unigram
    * distribution, with a top-K vocabulary cap (out-of-vocabulary
    * tokens score a 0.5/N floor) and keep verdict at the calibrated
    * threshold.
    *
    * Scale shape: one corpus token shuffle builds the frequency
    * table (map-side combining absorbs the zipf skew); the vocab is
    * top-K BY CONSTRUCTION, so the per-token probability lookup is a
    * broadcast hash join at any corpus size — the token stream never
    * shuffles again — and the per-doc agg combines map-side.
    *
    * Cross-engine determinism around the transcendentals: ln outputs
    * quantize to 1e-4 BEFORE a decimal-routed sum — the distinct ln
    * inputs are the distinct count values, so the 1-ulp engine
    * disagreement would have to land within ~1e-15 of a 5e-5
    * boundary to diverge (a 1e-6 quantum DID lose that bet once on
    * the 10× corpus — 1e-4 puts the odds at ~1e-11 per distinct
    * count). The cross-entropy itself is NOT rounded: it is a
    * division of bit-identical inputs (a decimal sum over an integer
    * count), so the raw doubles agree exactly — whereas ROUNDING it
    * is the hazard, because a 1e-4-quantized sum over a small group
    * lands on exact decimal halfway points where Spark's BigDecimal
    * HALF_UP and DuckDB's double rounding disagree (observed at 10×:
    * slp/24 = 5.70215 exactly). exp's output rounds to 2 — a
    * transcendental essentially never sits within an ulp of a .005
    * boundary. */
  def textPerplexity(spark: SparkSession, dir: String, vocabK: Int = 50000): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
    val freq = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    // total token count straight off the token stream (partial
    // counts per partition, one 1-row exchange) — NOT freq.agg(sum),
    // which would rebuild the frequency shuffle a second time
    val totals = toks.agg(count(lit(1)).cast("double").as("n_total"))
    val vocab = freq.orderBy(col("cnt").desc, col("tok").asc).limit(vocabK)
    val lp = round(
      when(col("cnt").isNotNull, log(col("cnt").cast("double") / col("n_total")))
        .otherwise(log(lit(0.5) / col("n_total"))), 4)
    val ce = -(col("sum_lp").cast("double")) / col("n_tokens")
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .crossJoin(broadcast(totals))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("cnt").isNull, 1)).as("n_oov"),
        sum(lp.cast("decimal(28,4)")).as("sum_lp"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        ce.as("cross_entropy"),
        round(exp(ce), 2).as("perplexity"),
        (round(exp(ce), 2) <= 31.0).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Bigram language-model scoring — the n-gram step up from
    * [[textPerplexity]]'s unigram model, the quality signal CCNet /
    * Gopher-style curation pipelines actually use (a KenLM stand-in
    * with the same data flow): p(w2|w1) = cnt(w1 w2) / cnt(w1)
    * (unigram-denominator bigram model), bigram vocabulary capped at
    * `vocabK` with an OOV floor of 0.5/cnt(w1), per-doc cross-entropy
    * and perplexity over each doc's adjacent-pair stream.
    *
    * 100-TB shape: the bigram stream crosses ONE shuffle into the
    * frequency aggregate (map-side combined — the reduce side is the
    * DISTINCT bigram vocabulary, not the stream; the [[textPerplexity]]
    * zipf-absorption argument, §14.1), the capped vocabulary lands via
    * TakeOrdered (never a global sort), and both model tables
    * broadcast back (Heaps'-law sublinear in the corpus). The pair
    * stream itself is map-side: an index explode over the
    * already-split token array (codegen; round 16), no self-join.
    *
    * Cross-engine determinism: integer counts through ONE exact
    * double division, ln quantized at 1e-4, the per-doc sum routed
    * through DECIMAL(28,4) (order-free), exp at the display edge. */
  def textPerplexityBigram(spark: SparkSession, dir: String,
      vocabK: Int = 50000): DataFrame = {
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    // Round 16 (guide §4, the r15 trigram recipe): the former
    // slice+slice+zip_with form ran on the INTERPRETED higher-order-
    // function path and allocated three per-doc string arrays before
    // exploding — and this stream is consumed TWICE (vocabulary pass +
    // scoring pass), so every doc paid it twice. sequence+explode+
    // element_at are all codegen and only the index rides the
    // generate. Identical rows: for i in 1..n-1 the zipped element IS
    // concat_ws(' ', toks[i], toks[i+1]), and w1 = toks[i] equals
    // substring_index(bg, ' ', 1) because toks come from a split on
    // the same delimiter (measured 1.49 → 1.14 s min-of-4 at sf0.1).
    val bg = docs.select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 1)")).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1)).as("bg"),
        element_at(col("toks"), col("i")).as("w1"))
    val uni = t(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("cnt1"))
    val freq2 = bg.groupBy("bg").agg(count(lit(1)).as("cnt2"))
    val vocab2 = freq2.orderBy(col("cnt2").desc, col("bg").asc).limit(vocabK)
    val lp = round(log(
      when(col("cnt2").isNotNull, col("cnt2").cast("double"))
        .otherwise(lit(0.5)) / col("cnt1").cast("double")), 4)
    val ce = -(col("sum_lp").cast("double")) / col("n_bigrams")
    bg.join(broadcast(vocab2), Seq("bg"), "left")
      .join(broadcast(uni), Seq("w1"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        count(when(col("cnt2").isNull, 1)).as("n_oov"),
        sum(lp.cast("decimal(28,4)")).as("sum_lp"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        ce.as("cross_entropy"),
        round(exp(ce), 2).as("perplexity"),
        (round(exp(ce), 2) <= 31.0).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** BM25 top-k relevance search (Robertson/Spärck Jones; the lexical
    * ranking function behind Lucene/Elasticsearch defaults): score
    * every document against a fixed term query, keep the k best.
    *
    * 100-TB shape: ONE bounded aggregate computes the corpus stats
    * (N, total tokens, per-term document frequencies — a single row,
    * broadcast back), then scoring is pure map-side arithmetic over
    * each doc's token array (tf via `filter`+`size` on the already-
    * split array — codegen'd, no explode, no token shuffle), and the
    * top-k lands via TakeOrderedAndProject, never a global sort.
    *
    * Cross-engine determinism: the only transcendental is each
    * term's idf — ln quantized at 1e-4 (the [[textPerplexity]]
    * recipe); everything downstream is IEEE-exact double arithmetic
    * from integers in a FIXED written order (the per-term sum is
    * unrolled, not aggregated), so Spark and the oracle agree
    * bit-for-bit before the final display rounding. */
  def textBm25TopK(spark: SparkSession, dir: String,
      query: Seq[String] = Seq("spark", "join", "window", "fast"),
      k: Int = 20): DataFrame = {
    val k1 = 1.2
    val b = 0.75
    val docs = t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val aggs =
      Seq(count(lit(1)).cast("double").as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double"))
          .as("avgdl")) ++
      query.zipWithIndex.map { case (term, i) =>
        count(when(array_contains(col("toks"), term), 1))
          .cast("double").as(s"df_$i")
      }
    val stats = docs.agg(aggs.head, aggs.tail: _*)
    val scored = docs.crossJoin(broadcast(stats))
    val withTf = query.zipWithIndex.foldLeft(scored) { case (df, (term, i)) =>
      df.withColumn(s"tf_$i",
        size(filter(col("toks"), x => x === lit(term))).cast("double"))
    }
    // (1 − b) + b·dl/avgdl — written in the exact association the
    // oracle SQL spells, so constant folding lands on the same bits
    val norm = lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl")
    val termScores = query.indices.map { i =>
      val idf = round(
        log((col("n_docs") - col(s"df_$i") + lit(0.5)) /
          (col(s"df_$i") + lit(0.5)) + lit(1.0)), 4)
      idf * (col(s"tf_$i") * lit(k1 + 1.0)) /
        (col(s"tf_$i") + lit(k1) * norm)
    }
    // fixed left-to-right association — the oracle spells the same order
    val score = termScores.reduceLeft(_ + _)
    withTf
      .select(col("doc_id") +: col("dl") +:
        query.indices.map(i => col(s"tf_$i").cast("long").as(s"tf_$i")) :+
        round(score, 4).as("score"): _*)
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  private[operators] val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[operators] val phoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  private[operators] val denyRe = "\\b(customer|supplier|order)\\b"

  /** PII / denylist scrubbing: redact emails, phone numbers, and
    * configurable denylist terms, reporting per-doc hit counts and
    * the scrubbed content hash. Pure map-side regexp projection —
    * codegen'd builtins, no UDF, no shuffle; at 100 TB this is a
    * scan-rate transform. (The synthetic corpus carries no emails or
    * phones — those counts verify the patterns run; the denylist
    * terms hit real tokens.) */
  def textPiiScrub(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(
        col("doc_id"),
        regexp_count(col("text"), lit(emailRe)).cast("long").as("n_emails"),
        regexp_count(col("text"), lit(phoneRe)).cast("long").as("n_phones"),
        regexp_count(col("text"), lit(denyRe)).cast("long").as("n_deny_terms"),
        md5(regexp_replace(
          regexp_replace(
            regexp_replace(col("text"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"),
          denyRe, "<TERM>").cast("binary")).as("scrubbed_md5"))
      .orderBy("doc_id")

  /** Learned quality-classifier INFERENCE — the fastText-style linear
    * filter (DCLM / CCNet's quality-classification step) that sits
    * beside the heuristic [[textQuality]]: hashed unigram + bigram
    * features → an integer-quantized weight table → linear score →
    * keep verdict. The "model" here is a deterministic seed-derived
    * weight vector (weights[b] = ((b+1)·2654435761 mod 1e9+7) mod 201
    * − 100, the Knuth multiplicative-hash constant) so the oracle can
    * reproduce it; a trained artifact swaps in as the same
    * D-row DataFrame without touching the plan. The sigmoid is
    * dropped deliberately: it is monotone, so `keep` (logit > 0) is
    * identical, and the integer logit stays exactly
    * oracle-comparable where exp() would differ by ULPs across
    * engines.
    *
    * Scale shape: features are bucketed map-side (codegen'd rolling
    * hash mod D — tokens never shuffle as strings); the weight table
    * is O(D) rows and BROADCAST — a learned model rides to every
    * executor once, never through a shuffle; per-doc partial sums
    * map-side-combine before the one doc-keyed exchange. At 100 TB
    * this is a scan-rate transform + one docs-sized shuffle. */
  def textQualityClassifier(spark: SparkSession, dir: String): DataFrame = {
    val D = 4096
    val weights = spark.range(D).select(
      col("id").as("bucket"),
      (((col("id") + 1) * lit(2654435761L)) % 1000000007L % 201L - 100L)
        .as("w"))
    val toks = split(lower(trim(col("text"))), " ")
    val uni = transform(toks,
      t => graft.functions.GraftExpressions.rollingHash(t) % D)
    val bi = transform(
      graft.functions.GraftExpressions.wordNgrams(lower(trim(col("text"))), 2),
      g => graft.functions.GraftExpressions.rollingHash(g) % D)
    val feats = t(spark, dir, "documents")
      .select(col("doc_id"), concat(uni, bi).as("buckets"))
      .select(col("doc_id"),
        size(col("buckets")).cast("long").as("n_features"),
        explode(col("buckets")).as("bucket"))
    feats.join(broadcast(weights), "bucket")
      .groupBy("doc_id", "n_features")
      .agg(sum("w").as("raw_score"))
      .select(col("doc_id"), col("n_features"), col("raw_score"),
        round(col("raw_score").cast("double") / (col("n_features") * 100), 6)
          .as("quality"),
        (col("raw_score") > 0).cast("int").as("keep"))
      .orderBy("doc_id")
  }

  /** Zipf's-law fit per language — the corpus-health diagnostic
    * curators read before trusting token statistics (natural text
    * follows freq ∝ rank^s with s ≈ −1; templated or synthetic text
    * bends the line). Least-squares slope + intercept of
    * ln(freq) over ln(rank) across each language's top `maxRank`
    * token frequencies.
    *
    * Scale shape: ONE corpus token shuffle into the (lang, tok)
    * frequency aggregate (map-side combined; the reduce side is the
    * per-language vocabulary, Heaps'-law sublinear), ranks via a
    * window partitioned by lang over the vocabulary-sized aggregate
    * (never the token stream), the rank cutoff bounds the regression
    * input at |langs|·maxRank rows, and the regression itself is one
    * tiny aggregate. No global sort anywhere.
    *
    * Cross-engine determinism: both regression inputs are ln's of
    * INTEGERS (rank, count) quantized at 1e-4 (the [[textPerplexity]]
    * recipe); Σx, Σy, Σxy, Σx² accumulate in DECIMAL (order-free
    * exactness — a double sum would be partition-order dependent);
    * the closed-form slope/intercept are then fixed-order IEEE
    * arithmetic over bit-identical doubles, rounded only at the
    * display edge. The regression is spelled closed-form instead of
    * regr_slope() because both engines' regr_* stream doubles in
    * nondeterministic order. */
  /** Code-vs-prose detection — the corpus-routing heuristic (code
    * wants different tokenization, dedup, and mixture treatment than
    * prose; every web-scale pipeline splits them): per-doc symbol /
    * digit / code-punctuation densities over the raw text, with an
    * integer-arithmetic verdict (`n_symbols·10 ≥ n_chars` OR
    * `n_code_marks·50 ≥ n_chars` — no float threshold at an engine
    * boundary). The synthetic corpus is prose, so verdicts run false
    * — the densities verify the patterns fire (the textPiiScrub
    * convention); real code trips both tests by an order of
    * magnitude. Pure map-side projection, no UDF, no shuffle: a
    * scan-rate transform at 100 TB. Counts come from the codegen'd
    * [[graft.functions.CharClassCountsExpr]] — ONE byte pass per
    * document where the regexp_replace formulation it replaces
    * walked three java regex NFAs over every text (6.3 s → ~1 s at
    * the 10× corpus; CharClassCountsSpec pins exact equality with
    * the regex formulation, including non-ASCII). Ratios one exact
    * division each. */
  def textCodeDetect(spark: SparkSession, dir: String): DataFrame = {
    val c = graft.functions.GraftExpressions.charClassCounts(col("text"))
    t(spark, dir, "documents")
      .select(col("doc_id"), c.as("c"))
      .select(col("doc_id"),
        col("c.n_chars").as("n_chars"),
        col("c.n_symbols").as("n_symbols"),
        col("c.n_digits").as("n_digits"),
        col("c.n_code").as("n_code_marks"),
        round(col("c.n_symbols").cast("double") /
          col("c.n_chars").cast("double"), 6).as("symbol_ratio"),
        (col("c.n_symbols") * 10 >= col("c.n_chars") ||
          col("c.n_code") * 50 >= col("c.n_chars")).cast("int").as("is_code"))
      .orderBy("doc_id")
  }

  /** Tokenizer FERTILITY by language — tokens-per-word for each
    * tokenization scheme (the multilingual-tokenizer health metric:
    * high fertility on a language means its text costs more context
    * budget). Per lang the exact token sums for whitespace / regex /
    * BPE-estimate schemes and the fertility ratios against the
    * whitespace word count. ONE map-combined shuffle to the |langs|
    * aggregate; ratios are single fixed-order divisions of exact
    * integers. */
  def textTokenizerFertility(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(wsTokens(col("text"))).as("ws_tokens"),
        sum(reTokens(col("text"))).as("re_tokens"),
        sum(bpeTokensEst(col("text"))).as("bpe_tokens"))
      .select(col("lang"), col("n_docs"), col("ws_tokens"),
        col("re_tokens"), col("bpe_tokens"),
        round(col("re_tokens").cast("double") /
          col("ws_tokens").cast("double"), 6).as("re_fertility"),
        round(col("bpe_tokens").cast("double") /
          col("ws_tokens").cast("double"), 6).as("bpe_fertility"))
      .orderBy("lang")

  /** Per-language precision / recall / F1 of the [[textLangid]]
    * heuristic against the labeled column — the evaluation metrics a
    * curator computes over [[textLangConfusion]]'s matrix before
    * trusting a language filter at corpus scale. ONE corpus shuffle
    * builds the (labeled, pred) confusion aggregate (map-combined,
    * ≤ (|langs|+1)² rows, checkpointed once — three readers would
    * otherwise re-scan the corpus); tp/fp/fn and the metric chain are
    * exact-integer counts through fixed-order IEEE divisions, with
    * zero-denominator cases pinned to 0.0 on both engines. */
  def textLangF1(spark: SparkSession, dir: String): DataFrame = {
    val conf = t(spark, dir, "documents")
      .select(col("lang").as("labeled"), predictedLang(col("text")).as("pred"))
      .groupBy("labeled", "pred").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val tp = conf.filter(col("labeled") === col("pred"))
      .select(col("labeled").as("lang"), col("n").as("tp"))
    val byLabel = conf.groupBy(col("labeled").as("lang"))
      .agg(sum(col("n")).as("n_labeled"))
    val byPred = conf.groupBy(col("pred").as("plang"))
      .agg(sum(col("n")).as("n_pred"))
    val j = byLabel
      .join(tp, Seq("lang"), "left")
      .join(byPred, col("lang") === col("plang"), "left")
      .select(col("lang"), coalesce(col("tp"), lit(0L)).as("tp"),
        col("n_labeled"), coalesce(col("n_pred"), lit(0L)).as("n_pred"))
    val p = when(col("n_pred") > 0,
      col("tp").cast("double") / col("n_pred").cast("double")).otherwise(0.0)
    val r = col("tp").cast("double") / col("n_labeled").cast("double")
    j.select(col("lang"), col("tp"), col("n_labeled"), col("n_pred"),
        round(p, 6).as("precision"), round(r, 6).as("recall"),
        round(when(p + r > 0.0, lit(2.0) * p * r / (p + r)).otherwise(0.0), 6)
          .as("f1"))
      .orderBy("lang")
  }

  /** Marginal-NOVELTY curve — per document (in doc_id = acquisition
    * order), the fraction of its distinct word-8-grams never seen in
    * any EARLIER document: the dataset-saturation curve an
    * acquisition team reads to decide whether the next crawl shard
    * still adds content (novelty → 0 means you're buying duplicates).
    *
    * Scale shape: grams shuffle as 8-byte xxhash64 keys; the distinct
    * (doc, hash) table is checkpointed ONCE (three readers — the
    * contamination-matrix lesson) and both aggregates are
    * map-combined (first-seen by hash, counts by doc). "First seen"
    * is min(doc_id) per gram — order-free, no window over corpus
    * order needed. Docs with < 8 words have no grams and no row
    * (same in the oracle). */
  def textNoveltyCurve(spark: SparkSession, dir: String): DataFrame = {
    val grams = Dedup.distinctGramHashes(t(spark, dir, "documents"), "doc_id")
    val firstSeen = grams.groupBy("gk").agg(min("doc_id").as("first_doc"))
    val perDoc = grams.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
    val novel = grams.join(firstSeen, "gk")
      .filter(col("doc_id") === col("first_doc"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_novel"))
    perDoc.join(novel, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_novel"), lit(0L)).as("n_novel"),
        round(coalesce(col("n_novel"), lit(0L)).cast("double") /
          col("n_grams").cast("double"), 6).as("novelty"))
      .orderBy("doc_id")
  }

  /** Per-source KL divergence from the corpus token distribution —
    * the DOMAIN-DRIFT diagnostic (which sources speak a different
    * language than the blend?): KL(p_source ‖ p_corpus) =
    * Σ_t p_s(t)·ln(p_s(t)/q(t)), the quantity mixture tuning and
    * contamination triage read per source. Every source token exists
    * in the corpus by construction, so q > 0 always and the sum is
    * finite.
    *
    * Scale shape: ONE corpus token shuffle into the (source, tok)
    * frequency aggregate (map-combined; reduce side = per-source
    * vocabulary); the corpus-wide frequency re-aggregates THAT table
    * (vocab-sized input, never the token stream again); the
    * probability-ratio join is vocab×vocab on tok (AQE broadcasts
    * the smaller side when it fits); per-source totals derive from
    * the same aggregate. Nothing downstream of the first aggregate
    * is corpus-sized.
    *
    * Determinism: the ratio p_s/q = (cnt_s·N)/(cnt·N_s) is ONE ln of
    * fixed-order IEEE arithmetic over exact integers, quantized at
    * 1e-4 (the [[textPerplexity]] recipe); the Σ weights each ln by
    * the INTEGER cnt_s and accumulates in DECIMAL (order-free);
    * KL = Σ/N_s is one division at the edge. */
  def textKlDivergence(spark: SparkSession, dir: String): DataFrame = {
    val srcFreq = t(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("cnt_s"))
    val corpusFreq = srcFreq.groupBy("tok").agg(sum(col("cnt_s")).as("cnt"))
    val perSource = srcFreq.groupBy("source")
      .agg(sum(col("cnt_s")).as("n_s"), count(lit(1)).as("vocab_s"))
    val total = corpusFreq.agg(sum(col("cnt")).as("n_total"))
    val lnr = round(log(
      (col("cnt_s").cast("double") * col("n_total").cast("double")) /
        (col("cnt").cast("double") * col("n_s").cast("double"))), 4)
    srcFreq.join(corpusFreq, "tok")
      .join(broadcast(perSource), "source")
      .crossJoin(broadcast(total))
      .groupBy("source")
      .agg(max(col("n_s")).as("n_tokens"), max(col("vocab_s")).as("vocab_size"),
        sum(d2dec(lnr, 4) * col("cnt_s").cast(DecimalType(18, 0)))
          .as("wsum"))
      .select(col("source"), col("n_tokens"), col("vocab_size"),
        round(col("wsum").cast("double") / col("n_tokens").cast("double"), 6)
          .as("kl_divergence"))
      .orderBy("source")
  }

  /** Vocabulary COVERAGE curve per language — the tokenizer-sizing
    * diagnostic (how much of the running text does a top-k vocabulary
    * cover?): for k ∈ {100, 1000, 10000}, the fraction of token
    * OCCURRENCES whose token ranks in the language's top k by
    * frequency. The elbow of this curve is where a vocab/BPE budget
    * stops paying.
    *
    * Scale shape: the [[textZipfSlope]] physics — ONE corpus token
    * shuffle into the (lang, tok) frequency aggregate (map-combined;
    * reduce side = per-language vocabulary), ranks via a
    * lang-partitioned window over that vocabulary-sized table, then
    * one |langs|-row conditional aggregate. The token stream itself
    * never shuffles twice, and nothing is corpus-sized past the
    * first aggregate.
    *
    * Determinism: coverages are exact integer÷integer divisions
    * (occurrence sums over integer counts), rounded only for
    * display; the (cnt desc, tok asc) rank order is total. */
  def textVocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val freq = t(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("tok").asc)
    def cov(k: Int) = round(
      sum(when(col("rank") <= k, col("cnt")).otherwise(lit(0L))).cast("double") /
        sum(col("cnt")).cast("double"), 6).as(s"cov_$k")
    freq.withColumn("rank", row_number().over(w))
      .groupBy("lang")
      .agg(count(lit(1)).as("vocab_size"),
        sum(col("cnt")).as("total_tokens"),
        cov(100), cov(1000), cov(10000))
      .orderBy("lang")
  }

  def textZipfSlope(spark: SparkSession, dir: String,
      maxRank: Int = 1000): DataFrame = {
    val freq = t(spark, dir, "documents")
      .select(col("lang"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("lang", "tok").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("lang")
      .orderBy(col("cnt").desc, col("tok").asc)
    val ranked = freq.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= maxRank)
      .select(col("lang"),
        d2dec(round(log(col("rank").cast("double")), 4), 4).as("x"),
        d2dec(round(log(col("cnt").cast("double")), 4), 4).as("y"))
    val n = col("n").cast("double")
    val sx = col("sx").cast("double")
    val sy = col("sy").cast("double")
    val sxy = col("sxy").cast("double")
    val sxx = col("sxx").cast("double")
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    ranked.groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"))
      .select(col("lang"), col("n").as("n_ranks"),
        round(slope, 6).as("zipf_slope"),
        round((sy - slope * sx) / n, 6).as("zipf_intercept"))
      .orderBy("lang")
  }

  /** Hapax-legomenon profile per source (round 11) — the
    * vocabulary-health diagnostic (a high hapax share flags noisy or
    * OCR-damaged sources; a collapsing one flags boilerplate). One
    * corpus token pass into a map-combined (source, token) count;
    * everything downstream is vocabulary-bounded. The ratio is an
    * exact scaled-integer division. */
  def textHapaxRatio(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"),
        explode(split(lower(col("text")), " ")).as("tok"))
      .groupBy("source", "tok").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(count(lit(1)).as("vocab"),
        count(when(col("c") === 1, 1)).as("hapax"),
        sum("c").as("n_tokens"))
      .select(col("source"), col("vocab"), col("hapax"), col("n_tokens"),
        expr("hapax * 1000000 DIV vocab").as("hapax_ppm"))
      .orderBy("source")

  /** Corpus word-length histogram (round 11) — the tokenizer-design
    * profile (length mass decides subword budget). Reduce side =
    * max word length; share is exact ppm integer division. */
  def textWordLenHist(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .select(length(col("tok")).cast("long").as("len"), col("tok"))
    val total = toks.groupBy().agg(count(lit(1)).as("total"))
    toks.groupBy("len")
      .agg(count(lit(1)).as("n"), count_distinct(col("tok")).as("n_distinct"))
      .crossJoin(broadcast(total))
      .select(col("len"), col("n"), col("n_distinct"),
        expr("n * 1000000 DIV total").as("share_ppm"))
      .orderBy("len")
  }

  /** Adjacent-bigram PMI top-20 (round 11) — collocation mining, the
    * phrase-vocabulary step of tokenizer/corpus analysis. PMI's
    * log is MONOTONE, so ranking needs only the exact RATIONAL
    * c_ab\u00b7N / (c_a\u00b7c_b), carried as one scaled integer division —
    * no float log crosses engines. Bigrams are born map-side
    * (zip_with over the token array, no self-join); the marginals are
    * two vocabulary-bounded aggregates off the one bigram table.
    * Count floor 5 keeps the demo stable; the 10\u2076 scaling bounds
    * c_ab\u00b7N\u00b710\u2076 \u2264 ~10\u00b9\u2078 at this corpus (re-scale per SF at
    * true 100-TB counts). */
  def textBigramPmi(spark: SparkSession, dir: String): DataFrame = {
    // Round 16 (guide §4, the perplexity-bigram recipe): the former
    // zip_with form re-split the text FOUR times per doc and ran the
    // pair build on the interpreted HOF path; sequence+explode+
    // element_at are codegen and split runs once. Identical rows: a
    // size<2 token array yields zero pairs in both forms (sequence
    // needs the explicit filter — sequence(1, 0) is DESCENDING, not
    // empty). Modest measured win (0.78 → 0.73 s min-of-4 at sf0.1:
    // the checkpoint already ran the HOF once per query, and the PMI
    // aggregates dominate) — kept for the scan-rate shape at 100 TB,
    // where four split() passes per doc are pure waste.
    val bg = t(spark, dir, "documents")
      .select(split(lower(col("text")), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("toks"), explode(expr("sequence(1, size(toks) - 1)")).as("i"))
      .select(element_at(col("toks"), col("i")).as("w1"),
        element_at(col("toks"), col("i") + 1).as("w2"))
      .localCheckpoint(true)
    val cab = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c_ab"))
    val ca = bg.groupBy("w1").agg(count(lit(1)).as("c_a"))
    val cb = bg.groupBy("w2").agg(count(lit(1)).as("c_b"))
    val n = bg.groupBy().agg(count(lit(1)).as("n_bigrams"))
    cab.filter(col("c_ab") >= 5)
      .join(ca, "w1").join(cb, "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c_ab"),
        expr("c_ab * n_bigrams * 1000000 DIV (c_a * c_b)").as("pmi_ratio_ppm"))
      .orderBy(col("pmi_ratio_ppm").desc, col("w1"), col("w2"))
      .limit(20)
  }

  /** Readability / lexical-complexity profile per source (round 12)
    * — the corpus-curation view quality filters threshold on: mean
    * word length, syllables-per-word (vowel-group proxy — the
    * standard syllable stand-in when no dictionary is shipped), and
    * long-word share (≥ 7 chars, the LIX ingredient). The corpus is
    * punctuation-free word soup, so sentence-based indices (Flesch/
    * ARI) are out of domain — the word-level complexity trio is what
    * remains meaningful, and all three are exact-integer totals with
    * ONE final division each (round(Σa/Σb, 6): two exact bigints,
    * one IEEE divide — bit-identical in any engine).
    * 100-TB shape: pure map-side projection (regex + length
    * arithmetic at scan rate), reduce side = |sources| rows. */
  def textReadability(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("source"),
        wsTokens(col("text")).as("words"),
        length(regexp_replace(col("text"), " ", "")).cast("long").as("chars"),
        size(regexp_extract_all(col("text"), lit("[aeiou]+"), lit(0)))
          .cast("long").as("syllables"),
        size(filter(split(col("text"), " "), w => length(w) >= 7))
          .cast("long").as("long_words"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("words").as("total_words"),
        round(sum("chars").cast("double") / sum("words"), 6)
          .as("avg_word_len"),
        round(sum("syllables").cast("double") / sum("words"), 6)
          .as("syllables_per_word"),
        round(sum("long_words").cast("double") / sum("words"), 6)
          .as("long_word_share"))
      .orderBy("source")

  /** Char-trigram language classifier (round 14) — the n-gram
    * PROFILE method (Cavnar–Trenkle) that [[textLangid]]'s stopword
    * heuristic approximates: per-language character-trigram count
    * profiles built from the labeled corpus, each document classified
    * to the profile with the highest cosine over its own trigram
    * counts. The in-sample evaluation shape ([[textLangF1]]
    * precedent: profiles include the doc being scored — this is the
    * "does the signal separate" audit, not a held-out benchmark).
    *
    * Determinism: counts are exact integers; dot products and norms
    * are integer sums (profile norms routed through DECIMAL — a
    * popular trigram's squared count overflows a long at ~100×); the
    * cosine is a pure scalar double chain (cast → sqrt → divide) over
    * exact inputs, bit-identical cross-engine; argmax ties break on
    * the language code.
    *
    * Scale shape: ONE trigram-explode scan builds the (doc, tri)
    * count table, eagerly checkpointed — the profile, both norms,
    * and the scoring all DERIVE from it (without the checkpoint the
    * plan re-ran the explode four times, once per consumer; the
    * ExplainCheck audit caught it). The profile is bounded by
    * |langs|·|trigram alphabet|³ — O(1) in the corpus — so the
    * scoring join BROADCASTS it and the per-doc aggregate combines
    * map-side. Nothing pairwise, nothing global but the terminal
    * sort. */
  /** The exploded (doc_id, lang, trigram) stream — shared by
    * [[textCharTrigramLangid]] and ScaleBench's volume probe so the
    * benched shape cannot drift from the shipped one (review catch
    * round 14). */
  private[graft] def charTrigrams(spark: SparkSession, dir: String): DataFrame =
    // round 15: explode the INDEX and substring after — the
    // transform(…, i -> substring(…)) lambda ran on the interpreted
    // higher-order-function path and allocated the full per-doc
    // trigram ARRAY before exploding; sequence+explode+substring are
    // all codegen, and only the int rides the generate (measured
    // 3.64 → 2.82 s on the trigram agg at sf0.1, identical rows)
    t(spark, dir, "documents")
      .filter(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"), col("text"),
        explode(expr("sequence(1, length(text) - 2)")).as("i"))
      .select(col("doc_id"), col("lang"),
        expr("substring(text, i, 3)").as("tri"))

  def textCharTrigramLangid(spark: SparkSession, dir: String): DataFrame = {
    val tris = charTrigrams(spark, dir)
    val docTri = tris.groupBy("doc_id", "lang", "tri")
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val prof = docTri.groupBy(col("lang").as("plang"), col("tri"))
      .agg(sum("cnt").as("pcnt"))
    val docNorm = docTri.groupBy("doc_id")
      .agg(sum(col("cnt") * col("cnt")).as("dn2"))
    val profNorm = prof.groupBy("plang")
      .agg(sum(col("pcnt").cast(DecimalType(19, 0)) *
        col("pcnt").cast(DecimalType(19, 0))).as("pn2"))
    val wA = Window.partitionBy("doc_id")
      .orderBy(col("cos_sim").desc, col("plang").asc)
    docTri.join(broadcast(prof), "tri")
      .groupBy("doc_id", "lang", "plang")
      .agg(sum(col("cnt") * col("pcnt")).as("dotp"))
      .join(docNorm, "doc_id")
      .join(broadcast(profNorm), "plang")
      .withColumn("cos_sim", round(col("dotp").cast("double") /
        (sqrt(col("dn2").cast("double")) * sqrt(col("pn2").cast("double"))), 6))
      .withColumn("rk", row_number().over(wA))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("lang"), col("plang").as("pred_lang"),
        col("cos_sim"), (col("lang") === col("plang")).as("correct"))
      .orderBy("doc_id")
  }

}
