package graft.operators

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantics tests for the round-3 LLM-pipeline operators —
  * decontamination, duplicate-cluster connected components,
  * stratified sampling, chunking, PII scrubbing — on planted
  * fixtures (the sf tables can't show e.g. transitive clusters or
  * a contaminated train doc deterministically). */
class LlmOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, text: String, lang: String = "en") =
    (id, text, lang, "src", text.length.toLong)

  /** eval docs are doc_id % 97 == 0 → ids 0 and 97 here. */
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-llmops").toString
    val base = "the quick brown fox jumps over the lazy dog and runs far away " * 3
    val docs = Seq(
      // decontamination: 1 shares a 5-gram run with eval doc 0; 2 is clean
      doc(0L, "alpha beta gamma delta epsilon zeta eta theta"),
      doc(1L, "unrelated prefix alpha beta gamma delta epsilon something else"),
      doc(2L, "totally disjoint vocabulary with no overlap whatsoever here"),
      doc(97L, "iota kappa lambda mu nu xi omicron pi"),
      // cluster CC: 10=11 exact; 12 near-dup (same length, one word
      // changed → same n_chars bucket); 20=21 a separate exact pair
      doc(10L, base + "alpha beta gamma delta epsilon"),
      doc(11L, base + "alpha beta gamma delta epsilon"),
      doc(12L, base + "alpha beta gamma delta epsilox"),
      doc(20L, "some other duplicated content repeated verbatim " * 4),
      doc(21L, "some other duplicated content repeated verbatim " * 4),
      // scrubbing: email + phone + denylist terms
      doc(30L, "contact me at alice@example.com or 555-123-4567 about the customer order"),
      doc(31L, "no sensitive content in this one at all"))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    docs.coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("decontaminate_ngram flags only train docs sharing a 5-gram with the eval set") {
    val r = Dedup.decontaminateNgram(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_shared_grams"), x.getAs[Long]("n_eval_docs")))).toMap
    assert(r.contains(1L), "doc 1 shares 'alpha beta gamma delta epsilon' with eval doc 0")
    assert(r(1L)._1 >= 1L && r(1L)._2 === 1L)
    assert(!r.contains(2L), "clean doc flagged")
    assert(!r.contains(0L) && !r.contains(97L), "eval docs are not train docs")
  }

  test("dedup_cluster_cc propagates labels transitively (exact + near edges)") {
    val r = Dedup.dedupClusterCC(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Long]("comp")).toMap
    // {10,11} exact, {11,12} near → one component with canonical 10
    assert(r(10L) === 10L && r(11L) === 10L && r(12L) === 10L,
      s"transitive cluster broken: $r")
    // the separate exact pair stays its own component
    assert(r(20L) === 20L && r(21L) === 20L)
    // unclustered docs never appear
    assert(!r.contains(2L) && !r.contains(30L))
  }

  test("dedup_embedding_cc merges cosine-connected vectors under the min label") {
    val d2 = Files.createTempDirectory("graft-embcc").toString
    val n = 10
    // near-parallel family (unit spike + tiny orthogonal drift) →
    // one semantic cluster with canonical representative 0; one
    // orthogonal outlier that must stay unclustered
    val vecs = (0 until n).map { i =>
      val v = Array.fill(64)(0.0f)
      v(0) = 10.0f; v(1) = i * 0.05f
      (i.toLong, v.toSeq, 0)
    } :+ ((50L, Array.fill(64)(0.0f).updated(60, 9.0f).toSeq, 1))
    vecs.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d2/embeddings.parquet")
    val r = Dedup.dedupEmbeddingCC(spark, d2).collect()
      .map(x => x.getAs[Long]("vec_id") -> x.getAs[Long]("comp")).toMap
    (0 until n).foreach(i => assert(r(i.toLong) === 0L,
      s"vec $i not labeled to the cluster min: $r"))
    assert(!r.contains(50L), "isolated vector must not appear in any cluster")

    // an all-orthogonal corpus yields NO edges and an empty result
    val d3 = Files.createTempDirectory("graft-embcc0").toString
    (0 until 4).map { i =>
      (i.toLong, Array.fill(64)(0.0f).updated(i * 16, 9.0f).toSeq, 0)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d3/embeddings.parquet")
    assert(Dedup.dedupEmbeddingCC(spark, d3).count() === 0L)
  }

  test("pipeline_token_budget fills each language greedily to bucket granularity") {
    val rows = Pipeline.tokenBudget(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      val lang = x.getAs[String]("lang")
      val cutoff = x.getAs[Int]("cutoff_qb")
      assert(x.getAs[Long]("n_docs") > 0, s"$lang kept nothing")
      assert(cutoff >= 0 && cutoff <= 100, s"$lang cutoff outside centile range")
      // greedy fill contract: dropping the cutoff bucket itself must
      // land UNDER budget (the overshoot is bounded by one bucket)
      val aboveOnly = graft.Tables.t(spark, dir, "documents")
        .filter(org.apache.spark.sql.functions.col("lang") === lang)
        .select(
          org.apache.spark.sql.functions.floor(
            graft.functions.TextFunctions.qualityScore(
              org.apache.spark.sql.functions.col("text")) * 100).cast("int").as("qb"),
          graft.functions.TextFunctions.bpeTokensEst(
            org.apache.spark.sql.functions.col("text")).as("toks"))
        .filter(org.apache.spark.sql.functions.col("qb") > cutoff)
        .agg(org.apache.spark.sql.functions.coalesce(
          org.apache.spark.sql.functions.sum("toks"),
          org.apache.spark.sql.functions.lit(0L)))
        .head.getLong(0)
      assert(aboveOnly < x.getAs[Long]("token_budget"),
        s"$lang: strictly-above-cutoff tokens $aboveOnly already exceed the budget")
    }
    // a second run is bit-identical (pure function of the corpus)
    val a = Pipeline.tokenBudget(spark, dir).collect().map(_.toString).toSeq
    val b = Pipeline.tokenBudget(spark, dir).collect().map(_.toString).toSeq
    assert(a === b)
  }

  test("pipeline_dataset_card accounts docs, dups, and medians per language") {
    val r = Pipeline.datasetCard(spark, dir).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    assert(r.contains("en"))
    val en = r("en")
    assert(en.getAs[Long]("n_docs") === 11L) // the fixture's en docs
    // two exact-dup pairs planted (10=11, 20=21) → 2 surplus docs
    assert(en.getAs[Long]("n_exact_dups") === 2L)
    assert(en.getAs[Long]("total_tokens") > 0L)
    val q = en.getAs[Double]("mean_quality")
    assert(q > 0.0 && q < 1.0)
    // the median is an element of the data (discrete percentile)
    val p50 = en.getAs[Long]("p50_bpe_tokens")
    assert(p50 > 0L)
  }

  test("stratified sample is deterministic and honors per-language rates") {
    val a = Pipeline.stratifiedSample(spark, dir).collect()
    val b = Pipeline.stratifiedSample(spark, dir).collect()
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq, "non-deterministic sample")
    a.foreach { row =>
      assert(row.getAs[Long]("samp_bucket") < row.getAs[Long]("keep_rate"),
        s"row outside its stratum rate: $row")
    }
  }

  test("docs_chunking covers every token with 256/192 windows, last chunk short") {
    val d2 = Files.createTempDirectory("graft-chunk").toString
    val six = (1 to 600).map(i => s"w$i").mkString(" ")
    val five = "a b c d e"
    Seq(doc(0L, six), doc(1L, five))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d2/documents.parquet")
    val r = Pipeline.docsChunking(spark, d2).collect()
      .map(x => (x.getAs[Long]("doc_id"), x.getAs[Long]("chunk_idx"),
        x.getAs[Long]("n_chunk_tokens")))
    // 600 tokens → chunks at 1/193/385 of sizes 256/256/216
    assert(r.filter(_._1 == 0L).map(t => (t._2, t._3)).toSeq ===
      Seq((0L, 256L), (1L, 256L), (2L, 216L)))
    // short doc → single short chunk
    assert(r.filter(_._1 == 1L).map(t => (t._2, t._3)).toSeq === Seq((0L, 5L)))
  }

  test("mm_phash_dedup clusters identical payloads under one keeper") {
    val r = Multimodal.mmPhashDedup(spark, dir).collect()
      .map(x => (x.getAs[Long]("phash"), x.getAs[Long]("keeper"), x.getAs[Long]("n_docs")))
    // docs 10/11 and 20/21 are byte-identical → identical pHash
    val c10 = r.find(_._2 == 10L).get
    assert(c10._3 >= 2L, "identical payloads split across pHashes")
    val c20 = r.find(_._2 == 20L).get
    assert(c20._3 === 2L)
    // distinct content doesn't all collapse into one bucket
    assert(r.length > 3, s"suspiciously few pHash clusters: ${r.length}")
    r.foreach(x => assert(x._1 >= 0L && x._1 < (1L << 32), s"pHash out of 32-bit range: $x"))
  }

  test("text_pii_scrub redacts email, phone, and denylist terms") {
    val r = TextAnalysis.textPiiScrub(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    val hit = r(30L)
    assert(hit.getAs[Long]("n_emails") === 1L)
    assert(hit.getAs[Long]("n_phones") === 1L)
    assert(hit.getAs[Long]("n_deny_terms") === 2L) // customer + order
    val expected = "contact me at <EMAIL> or <PHONE> about the <TERM> <TERM>"
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(hit.getAs[String]("scrubbed_md5") === md)
    // untouched doc hashes to its original text
    val md31 = java.security.MessageDigest.getInstance("MD5")
      .digest("no sensitive content in this one at all".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(r(31L).getAs[String]("scrubbed_md5") === md31)
  }

  test("text_repetition flags phrase-repeating docs and keeps diverse ones") {
    val r = TextAnalysis.textRepetition(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // 20 is one 7-word phrase repeated 4× → most bigrams are dups
    val rep = r(20L)
    assert(rep.getAs[Double]("dup_bigram_frac") > 0.5)
    assert(rep.getAs[Double]("dup_trigram_frac") > 0.5)
    assert(rep.getAs[Int]("keep") === 0)
    // 31 has 8 distinct words: top word 1/8, zero duplicate n-grams
    val clean = r(31L)
    assert(clean.getAs[Long]("n_tokens") === 8L)
    assert(clean.getAs[Double]("top_word_frac") === 0.125)
    assert(clean.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(clean.getAs[Int]("keep") === 1)
  }

  test("text_entropy: uniform docs hit ln(k), repeats lower it, recompute agrees") {
    val r = TextAnalysis.textEntropy(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // doc 0: 8 distinct tokens once each → H = ln 8, ttr = 1
    assert(math.abs(r(0L).getAs[Double]("token_entropy") - math.log(8)) < 1e-4)
    assert(r(0L).getAs[Double]("ttr") === 1.0)
    // doc 20: a 6-word phrase ×4 (plus the trailing-space empty
    // token) — heavy repetition shows as low ttr and entropy well
    // under the doc-0 uniform ceiling over a LARGER vocabulary
    assert(r(20L).getAs[Double]("ttr") < 0.3)
    assert(r(20L).getAs[Double]("token_entropy") < 2.0)
    // repetition strictly lowers entropy below the uniform ceiling
    assert(r(20L).getAs[Double]("token_entropy") <
      r(0L).getAs[Double]("token_entropy"))
    // independent recompute (hashmap counts vs the sorted-run walk):
    // identical quantization must give the identical double
    val texts = spark.read.parquet(s"$dir/documents.parquet").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[String]("text")).toMap
    texts.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val n = toks.length.toLong
      val acc = toks.groupBy(identity).values.map(_.length.toLong)
        .map(c => c * math.round(math.log(c.toDouble / n) * 10000)).sum
      assert(r(id).getAs[Double]("token_entropy") === -acc.toDouble / (n * 10000.0))
      assert(r(id).getAs[Long]("n_tokens") === n)
      // entropy never exceeds the uniform bound over the doc's types
      assert(r(id).getAs[Double]("token_entropy") <=
        math.log(r(id).getAs[Long]("n_distinct").toDouble) + 1e-4)
    }
  }

  test("text_bpe_train equals an independent in-memory BPE, merge for merge") {
    // independent re-derivation: hashmap pair counting over the same
    // word-frequency table, same greedy left-to-right merge semantics
    // and lexicographic tie-break — nothing shared with the Spark
    // formulation beyond the algorithm's definition
    def referenceBpe(texts: Seq[String], n: Int)
        : Seq[(Int, String, String, String, Long)] = {
      val freq = scala.collection.mutable.Map.empty[List[String], Long]
      texts.flatMap(_.split(" ")).filter(_.nonEmpty).foreach { w =>
        val syms = w.map(_.toString).toList :+ "</w>"
        freq(syms) = freq.getOrElse(syms, 0L) + 1
      }
      val out = Seq.newBuilder[(Int, String, String, String, Long)]
      for (rank <- 1 to n) {
        val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        freq.foreach { case (syms, f) =>
          syms.zip(syms.tail).foreach(p =>
            pairs(p) = pairs.getOrElse(p, 0L) + f)
        }
        val live = pairs.filter(_._2 >= 2)
        if (live.nonEmpty) {
          val ((a, b), cnt) = live.minBy { case ((x, y), c) => (-c, x, y) }
          out += ((rank, a, b, a + b, cnt))
          def mergeWord(syms: List[String]): List[String] = syms match {
            case x :: y :: rest if x == a && y == b =>
              (a + b) :: mergeWord(rest)
            case x :: rest => x :: mergeWord(rest)
            case Nil => Nil
          }
          val next = freq.toSeq.map { case (s, f) => mergeWord(s) -> f }
          freq.clear()
          next.foreach { case (s, f) => freq(s) = freq.getOrElse(s, 0L) + f }
        }
      }
      out.result()
    }
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .collect().map(_.getAs[String]("text")).toSeq
    val expected = referenceBpe(texts, 12)
    val got = TextAnalysis.textBpeTrain(spark, dir, numMerges = 12)
      .collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[String]("left"),
        r.getAs[String]("right"), r.getAs[String]("merged"),
        r.getAs[Long]("pair_count"))).toSeq
    assert(got === expected)
    assert(got.nonEmpty, "the fixture corpus must yield merges")
    // merges chain: later merges may consume earlier merged symbols
    assert(got.map(_._4).distinct.size === got.size)
  }

  test("text_perplexity scores common-token docs lower; OOV floors below vocab") {
    // vocabK=3 keeps only the 3 most frequent corpus tokens in-vocab
    // ("the" et al. from the repeated base docs) — everything else
    // takes the 0.5/N OOV floor, which is rarer than ANY real token,
    // so perplexity orders: base-heavy docs < distinct-word docs
    val r = TextAnalysis.textPerplexity(spark, dir, vocabK = 3).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    r.values.foreach { x =>
      assert(x.getAs[Double]("perplexity") > 1.0)
      assert(x.getAs[Long]("n_oov") <= x.getAs[Long]("n_tokens"))
    }
    // doc 2 is all-distinct singleton vocabulary → every token OOV
    assert(r(2L).getAs[Long]("n_oov") === r(2L).getAs[Long]("n_tokens"))
    // the repeated-base docs carry the corpus's most common tokens →
    // strictly lower cross-entropy than the all-OOV doc
    assert(r(10L).getAs[Double]("cross_entropy") < r(2L).getAs[Double]("cross_entropy"))
    // full-vocab run: nothing is OOV
    val full = TextAnalysis.textPerplexity(spark, dir).collect()
    assert(full.forall(_.getAs[Long]("n_oov") === 0L))
  }

  test("dedup_span_exact marks cross-doc spans hot, multiplicity kept") {
    val r = Dedup.dedupSpanExact(spark, dir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    // 10 and 11 are byte-identical long docs → every span is hot
    assert(r(10L).getAs[Double]("hot_span_frac") === 1.0)
    assert(r(11L).getAs[Double]("hot_span_frac") === 1.0)
    assert(r(10L).getAs[Int]("keep") === 0)
    // 12 differs from them only in its final token → only the one
    // span containing that token is cold
    val near = r(12L)
    assert(near.getAs[Long]("n_hot_spans") === near.getAs[Long]("n_spans") - 1)
    assert(near.getAs[Int]("keep") === 0)
    // 20=21: internally-repeated shared phrase — every occurrence of
    // a hot span counts (multiplicity), so hot == total
    assert(r(20L).getAs[Long]("n_hot_spans") === r(20L).getAs[Long]("n_spans"))
    // an isolated doc shares nothing and keeps
    assert(r(2L).getAs[Long]("n_hot_spans") === 0L)
    assert(r(2L).getAs[Int]("keep") === 1)
  }

  test("decontaminate_embedding: identical leaks flag, orthogonal stays, ties take the smaller eval id") {
    val d = Files.createTempDirectory("graft-embdecon").toString
    def v(xs: Float*) = xs.toSeq
    // eval set = vec_id % 97 == 0 → ids 0 and 97
    Seq(
      (0L, v(1f, 0f, 0f, 0f), 1),   // eval axis-x
      (97L, v(0f, 1f, 0f, 0f), 1),  // eval axis-y
      (1L, v(1f, 0f, 0f, 0f), 1),   // identical to eval 0 → contaminated
      (2L, v(0f, 0f, 1f, 0f), 1),   // orthogonal to both → clean
      (3L, v(1f, 1f, 0f, 0f), 1))   // cos 1/√2 to BOTH evals — a tie
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val r = Dedup.decontaminateEmbedding(spark, d).collect()
      .map(x => x.getAs[Long]("vec_id") -> x).toMap
    assert(r.keySet === Set(1L, 2L, 3L), "eval vectors are not train vectors")
    assert(r(1L).getAs[Double]("max_eval_sim") === 1.0)
    assert(r(1L).getAs[Long]("closest_eval_id") === 0L)
    assert(r(1L).getAs[Int]("contaminated") === 1)
    assert(r(2L).getAs[Double]("max_eval_sim") === 0.0)
    assert(r(2L).getAs[Int]("contaminated") === 0)
    assert(r(2L).getAs[Long]("n_close") === 0L)
    // the tie resolves to the SMALLEST eval id (struct-max on
    // (sim, -eval_id)); both evals are within the n_close band
    assert(r(3L).getAs[Double]("max_eval_sim") === 0.707107)
    assert(r(3L).getAs[Long]("closest_eval_id") === 0L)
    assert(r(3L).getAs[Long]("n_close") === 2L)
    assert(r(3L).getAs[Int]("contaminated") === 1)
  }
}
