package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-fixture semantics for the round-10 operators: the oracle
  * parity run proves cross-engine agreement; these prove the
  * operators compute the RIGHT thing on inputs whose answers are
  * known in closed form.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** embeddings: 0/1 identical (cos = 1), 2 near-orthogonal;
    * orders: one customer cycling 3 priorities over known days;
    * events: one fully-converted user with exact stage gaps, one
    * view-only user; documents: token k planted ~100/k times
    * (textbook Zipf, slope ≈ −1). */
  lazy val dir: String = {
    val d = Files.createTempDirectory("graft-r10").toString
    val e0 = Seq.tabulate(64)(i => math.sin(i + 1).toFloat)
    val e2 = Seq.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    Seq((0L, e0, 1), (1L, e0, 1), (2L, e2, 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    // customer 7: priorities A,B,A,C,B on days 0,1,2,3,4 → running
    // distinct 1,2,2,3,3; customer 8: same-day tie broken by orderkey
    val day0 = 1700000000000000L
    def ts(day: Int) = new Timestamp((day0 + day * 86400000000L) / 1000)
    Seq(
      (1L, 7L, "O", 10.0, ts(0), "A"),
      (2L, 7L, "O", 10.0, ts(1), "B"),
      (3L, 7L, "O", 10.0, ts(2), "A"),
      (4L, 7L, "O", 10.0, ts(3), "C"),
      (5L, 7L, "O", 10.0, ts(4), "B"),
      (6L, 8L, "O", 10.0, ts(0), "A"),
      (7L, 8L, "O", 10.0, ts(0), "B"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    def ets(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
    Seq(
      (1L, ets(0), 100L, "view", 1.0, "{}"),
      (2L, ets(10), 100L, "click", 1.0, "{}"),
      (3L, ets(30), 100L, "purchase", 1.0, "{}"),
      (4L, ets(5), 200L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    // Zipf corpus: token t01 ×100, t02 ×50, … t10 ×10 (100 DIV k)
    val zipfText = (1 to 10)
      .flatMap(k => Seq.fill(100 / k)(f"t$k%02d")).mkString(" ")
    Seq((0L, zipfText, "en", "srcZ", zipfText.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  /** MIPS fixture (separate dir — extra vectors would add edges to
    * the threshold-sweep fixture): corpus 5 = e0·0.5, 6 = e0·2,
    * 7 ⊥ e0. Cosine ties 5 and 6 at 1.0 (id tie-break → 5 first);
    * MIPS must rank 6 first — the norm sensitivity IS the metric. */
  lazy val mipsDir: String = {
    val d = Files.createTempDirectory("graft-r10-mips").toString
    val e0 = Seq.tabulate(64)(i => math.sin(i + 1).toFloat)
    val e2 = Seq.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    Seq(
      (0L, e0, 1),
      (5L, e0.map(x => x * 0.5f), 1),
      (6L, e0.map(x => x * 2.0f), 1),
      (7L, e2, 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("ann_mips_topk ranks by inner product, not cosine: the 2x-norm vector wins") {
    val r = Similarity.annMipsTopk(spark, mipsDir).collect()
      .filter(_.getAs[Long]("qid") == 0L)
      .sortBy(_.getAs[Long]("rank"))
      .map(x => x.getAs[Long]("vec_id"))
    assert(r.take(2).toSeq === Seq(6L, 5L),
      "MIPS must prefer the longer colinear vector; cosine's id tie-break would pick 5")
    // and cosine indeed ties them the other way on the same data
    val c = Similarity.annBruteforceTopk(spark, mipsDir).collect()
      .filter(_.getAs[Long]("qid") == 0L)
      .sortBy(_.getAs[Long]("rank"))
      .map(x => x.getAs[Long]("vec_id"))
    assert(c.take(2).toSeq === Seq(5L, 6L))
  }

  test("events_concentration: exact discrete quartiles over the planted user counts") {
    // users: 100 → 3 events, 200 → 1 event; q1=q2=1, q3=3
    val r = EventAnalytics.concentration(spark, dir).collect()
      .map(x => x.getAs[Long]("quartile") ->
        ((x.getAs[Long]("n_users"), x.getAs[Long]("n_events"),
          x.getAs[Double]("event_share")))).toMap
    assert(r.keySet === Set(1L, 3L))
    assert(r(1L) === ((1L, 1L, 0.25)))
    assert(r(3L) === ((1L, 3L, 0.75)))
  }

  test("text_vocab_coverage: the 10-token corpus is fully covered at every cutoff") {
    val r = TextAnalysis.textVocabCoverage(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("vocab_size") === 10L)
    assert(row.getAs[Long]("total_tokens") ===
      (1 to 10).map(k => 100 / k).sum.toLong)
    assert(row.getAs[Double]("cov_100") === 1.0)
    assert(row.getAs[Double]("cov_10000") === 1.0)
  }

  test("pipeline_mixture_epochs: single source takes the whole budget; epochs exact") {
    val total = (1 to 10).map(k => 100 / k).sum.toLong
    val r = Pipeline.mixtureEpochs(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("avail_tokens") === total)
    // ws routes through DECIMAL(28,12) (order-free sums), so
    // sqrt(a)/ws is a hair under 1 and the floor lands one token
    // short of the full budget — the specified arithmetic, which the
    // oracle reproduces exactly
    assert(row.getAs[Long]("target_tokens") === 999999L)
    assert(row.getAs[Double]("epochs") ===
      BigDecimal(999999.0 / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(row.getAs[Boolean]("oversampled"))
  }

  test("q38_merge_upsert: update, insert, and keep rows land exactly") {
    val r = Relational.q38MergeUpsert(spark, dir).collect()
      .map(x => x.getAs[Long]("orderkey") ->
        ((x.getAs[String]("status"), x.getAs[Double]("totalprice"),
          x.getAs[String]("action")))).toMap
    assert(r.size === 8, "7 base rows + 1 insert")
    assert(r(7L) === (("X", 11.0, "update")), "7 % 7 == 0 updates in place")
    assert(r(10000000000003L) === (("X", 11.0, "insert")),
      "3 % 11 == 3 re-enters under key+1e13 (collision-proof up to SF ~1.6M)")
    assert(r(1L) === (("O", 10.0, "keep")))
  }

  /** lifecycle fixture: user 1 active weeks 0,1; user 2 weeks 0,2;
    * user 3 week 0 only — every state and the churn attribution
    * rules appear exactly once. */
  lazy val lifecycleDir: String = {
    val d = Files.createTempDirectory("graft-r10-lc").toString
    val weekUs = 7L * 86400000000L
    def wts(week: Int, u: Long) =
      new Timestamp((1700000000000000L + week * weekUs) / 1000 + u)
    Seq(
      (1L, wts(0, 1), 1L, "view", 1.0, "{}"),
      (2L, wts(1, 1), 1L, "view", 1.0, "{}"),
      (3L, wts(0, 2), 2L, "view", 1.0, "{}"),
      (4L, wts(2, 2), 2L, "view", 1.0, "{}"),
      (5L, wts(0, 3), 3L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("events_lifecycle_states: new/retained/resurrected/churned land exactly") {
    val r = EventAnalytics.lifecycleStates(spark, lifecycleDir).collect()
      .map(x => (x.getAs[Long]("n_new"), x.getAs[Long]("n_retained"),
        x.getAs[Long]("n_resurrected"), x.getAs[Long]("n_churned")))
    assert(r.length === 3)
    assert(r(0) === ((3L, 0L, 0L, 0L)), "week 0: all three users are new")
    assert(r(1) === ((0L, 1L, 0L, 2L)),
      "week 1: user 1 retained; users 2 and 3 went missing")
    assert(r(2) === ((0L, 0L, 1L, 1L)),
      "week 2: user 2 resurrected; user 1 went missing")
  }

  test("text_kl_divergence: a single-source corpus has KL exactly 0") {
    val r = TextAnalysis.textKlDivergence(spark, dir).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Double]("kl_divergence") === 0.0,
      "p_source = p_corpus when there is one source, so every ln ratio is 0")
    assert(r.head.getAs[Long]("n_tokens") ===
      (1 to 10).map(k => 100 / k).sum.toLong)
  }

  /** containment fixture: eval doc 0's text appears verbatim inside
    * train doc 1 (containment 1.0); train doc 2 shares only the
    * first 5-gram (0.5). */
  lazy val containDir: String = {
    val d = Files.createTempDirectory("graft-r10-ct").toString
    val evalText = "w1 w2 w3 w4 w5 w6"
    Seq(
      (0L, evalText, "en", "srcE", evalText.length.toLong),
      (1L, s"prefix tokens here $evalText and a suffix", "en", "srcT", 40L),
      (2L, "w1 w2 w3 w4 w5 different tail entirely", "en", "srcT", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("decontaminate_containment: verbatim embedding scores 1.0 against the right train doc") {
    val r = Dedup.decontaminateContainment(spark, containDir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("eval_id") === 0L)
    assert(row.getAs[Long]("best_train_id") === 1L,
      "the full-containment doc must out-rank the half-containment one")
    assert(row.getAs[Long]("n_eval_grams") === 2L)
    assert(row.getAs[Long]("n_shared") === 2L)
    assert(row.getAs[Double]("containment") === 1.0)
  }

  test("mm_phash_hamming: banding is recall-complete — equals brute force at the threshold") {
    val real = "/root/testdata/sf0.001"
    val got = Multimodal.mmPhashHamming(spark, real).collect()
      .map(x => (x.getAs[Long]("d1"), x.getAs[Long]("d2"),
        x.getAs[Long]("hamming"))).toSet
    // brute-force all-pairs over the same hashes (500 docs → 124,750
    // pairs; any pair the pigeonhole missed would be absent here)
    val hashes = Multimodal.mmPhashDedup(spark, real) // keeper per exact hash
    val px = graft.Tables.t(spark, real, "documents").count()
    assert(px === 500L)
    val hs = {
      import org.apache.spark.sql.functions._
      graft.Tables.t(spark, real, "documents")
        .withColumn("px", transform(sequence(lit(0), lit(31)),
          i => ascii(substring(col("text"),
            floor(i.cast("double") * length(col("text")) / 32.0).cast("int") + 1,
            lit(1))).cast("long")))
        .withColumn("mean",
          aggregate(col("px"), lit(0L), (a, x) => a + x).cast("double") / 32.0)
        .select(col("doc_id"),
          aggregate(transform(sequence(lit(0), lit(31)),
              i => when(element_at(col("px"), i + 1).cast("double") >= col("mean"),
                pow(lit(2.0), i)).otherwise(lit(0.0))),
            lit(0.0), (a, x) => a + x).cast("long").as("phash"))
        .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("phash"))
    }
    val brute = (for {
      (d1, h1) <- hs; (d2, h2) <- hs if d1 < d2
      hm = java.lang.Long.bitCount(h1 ^ h2).toLong if hm <= 3
    } yield (d1, d2, hm)).toSet
    assert(got === brute,
      "4×8-bit banding must find EXACTLY the hamming ≤ 3 pairs (pigeonhole)")
    assert(hashes.count() > 0)
  }

  test("events_forecast_baseline: seasonal-naive errors land exactly") {
    val d = Files.createTempDirectory("graft-r10-fc").toString
    val dayUs = 86400000000L
    def dts(day: Int, k: Int) =
      new Timestamp((1700000000000000L + day * dayUs) / 1000 + k)
    // type 'view': 10 events day 0, 12 day 7, 8 day 14
    val rows = (0 until 10).map(k => (k.toLong, dts(0, k), 1L, "view", 1.0, "{}")) ++
      (0 until 12).map(k => (100L + k, dts(7, k), 1L, "view", 1.0, "{}")) ++
      (0 until 8).map(k => (200L + k, dts(14, k), 1L, "view", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val r = EventAnalytics.forecastBaseline(spark, d).collect()
    assert(r.length === 1)
    val row = r.head
    // preds: day7 ← 10 (err +2, ape 2/12), day14 ← 12 (err −4, ape 0.5)
    assert(row.getAs[Long]("n_days") === 2L)
    assert(row.getAs[Double]("mae") === 3.0)
    assert(row.getAs[Double]("bias") === -1.0)
    val ape1 = BigDecimal(2.0 / 12.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val mape = ((ape1 + BigDecimal("0.5")) / 2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("mape") === mape)
  }

  test("graph_pagerank: regular components sit exactly at the fixed point") {
    val d = Files.createTempDirectory("graft-r10-pr").toString
    val e0 = Seq.tabulate(64)(i => math.sin(i + 1).toFloat)
    val e2 = Seq.tabulate(64)(i => math.cos(i * 2 + 1).toFloat)
    // a pair (deg 1 each) and a triangle (deg 2 each) of identical
    // vectors: in a regular component each node's inflow equals its
    // own rank, so (15·base + 85·base) DIV 100 = base — the rank
    // must sit at EXACTLY Scale/n after any number of rounds
    Seq((0L, e0, 1), (1L, e0, 1), (5L, e2, 1), (6L, e2, 1), (7L, e2, 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val r = Similarity.graphPagerank(spark, d).collect()
    assert(r.length === 5)
    r.foreach { row =>
      assert(row.getAs[Long]("pr_scaled") === 200000000000L,
        s"node ${row.getAs[Long]("vec_id")} must hold the exact fixed point")
    }
  }

  test("q39_percentile_cont: interpolation lands the textbook quartiles") {
    val d = Files.createTempDirectory("graft-r10-pc").toString
    Seq(("A", 10.0), ("A", 20.0), ("A", 30.0), ("A", 40.0))
      .toDF("l_returnflag", "l_extendedprice")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val r = Relational.q39PercentileCont(spark, d).collect().head
    // pos = p·(n−1) over [10,20,30,40]: 0.75 → 17.5; 1.5 → 25; 2.25 → 32.5
    assert(r.getAs[Long]("n_rows") === 4L)
    assert(r.getAs[Double]("p25") === 17.5)
    assert(r.getAs[Double]("p50") === 25.0)
    assert(r.getAs[Double]("p75") === 32.5)
  }

  test("q40_mode: frequency ties break by value, share exact") {
    // r10 orders fixture: priorities A×3, B×3, C×1, all status 'O'
    val r = Relational.q40Mode(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("mode_priority") === "A",
      "A and B tie at 3; the value tie-break must pick A")
    assert(row.getAs[Long]("n_mode") === 3L)
    assert(row.getAs[Long]("n_group") === 7L)
    assert(row.getAs[Double]("mode_share") ===
      BigDecimal(3.0 / 7.0).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("text_code_detect: code trips the verdict, prose doesn't") {
    val d = Files.createTempDirectory("graft-r10-cd").toString
    val code = "if (x == 1) { y[2] = z; } else { return f(a, b); }"
    val prose = "the quick brown fox jumps over the lazy dog again and again"
    Seq((0L, code, "en", "s", code.length.toLong),
      (1L, prose, "en", "s", prose.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = TextAnalysis.textCodeDetect(spark, d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_symbols"), x.getAs[Long]("n_code_marks"),
          x.getAs[Int]("is_code")))).toMap
    assert(r(0L)._3 === 1, "brace/equals density must trip the code verdict")
    assert(r(1L) === ((0L, 0L, 0)), "pure prose has zero symbols and stays prose")
    // ( ) ×2 pairs, { } ×2 pairs, [ ], = ×3, ; ×2
    assert(r(0L)._2 === 15L, "{}()[];= marks counted exactly")
  }

  test("mm_scene_cuts: a byte flip between sampled frames cuts; identical frames don't") {
    val d = Files.createTempDirectory("graft-r10-sc").toString
    // sampled frames are chunks 0 and 2 (chunk 1 is skipped):
    // doc 0 flips a→z across them (per-byte delta 25 ≥ 13 → cut at
    // chunk index 2); doc 1 repeats the same frame (no cut)
    val cut = "a" * 256 + "b" * 256 + "z" * 256
    val flat = "a" * 256 + "b" * 256 + "a" * 256
    Seq((0L, cut, "en", "s", cut.length.toLong),
      (1L, flat, "en", "s", flat.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = Multimodal.mmSceneCuts(spark, d).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_frames"), x.getAs[Long]("n_cuts"),
          x.getAs[Long]("first_cut_idx")))).toMap
    assert(r(0L) === ((2L, 1L, 2L)))
    assert(r(1L) === ((2L, 0L, -1L)))
  }

  test("dedup_threshold_sweep: identical pair survives every threshold; rate = 2/3") {
    val r = Dedup.dedupThresholdSweep(spark, dir).collect()
    assert(r.length === 8, "cos=1.0 edge must survive all 8 thresholds")
    r.foreach { row =>
      assert(row.getAs[Long]("n_pairs") === 1L)
      assert(row.getAs[Long]("n_flagged") === 2L)
      assert(row.getAs[Double]("dup_rate") === math.rint(2.0 / 3.0 * 1e6) / 1e6)
    }
    assert(r.map(_.getAs[Double]("threshold")).toSeq ===
      Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.95))
  }

  test("q37_running_distinct: first-occurrence markers sum to a distinct counter") {
    val r = Relational.q37RunningDistinct(spark, dir).collect()
      .map(x => x.getAs[Long]("o_orderkey") ->
        x.getAs[Long]("distinct_priorities_so_far")).toMap
    assert(r(1L) === 1L); assert(r(2L) === 2L); assert(r(3L) === 2L)
    assert(r(4L) === 3L); assert(r(5L) === 3L)
    // same-day tie: orderkey order decides who sees 1 vs 2
    assert(r(6L) === 1L); assert(r(7L) === 2L)
  }

  test("events_funnel_latency: exact stage gaps for the one converted user") {
    val r = EventAnalytics.funnelLatency(spark, dir).collect()
      .map(x => x.getAs[String]("transition") ->
        ((x.getAs[Long]("n_converted"), x.getAs[Long]("min_gap_us"),
          x.getAs[Double]("mean_gap_s")))).toMap
    assert(r.keySet === Set("1_view_to_click", "2_click_to_purchase",
      "3_view_to_purchase"))
    assert(r("1_view_to_click") === ((1L, 10000000L, 10.0)))
    assert(r("2_click_to_purchase") === ((1L, 20000000L, 20.0)))
    assert(r("3_view_to_purchase") === ((1L, 30000000L, 30.0)))
  }

  test("text_zipf_slope: planted 100/k corpus fits slope ≈ −1 and matches the closed form") {
    val r = TextAnalysis.textZipfSlope(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[String]("lang") === "en")
    assert(row.getAs[Long]("n_ranks") === 10L)
    // recompute the regression exactly as specified: ln's quantized
    // at 1e-4, exact sums, closed-form slope — BigDecimal for the
    // sums so the recompute is order-free like the engine's
    val pts = (1 to 10).map { k =>
      val rank = k.toDouble
      val cnt = (100 / k).toDouble
      (BigDecimal(math.rint(math.log(rank) * 1e4) / 1e4),
        BigDecimal(math.rint(math.log(cnt) * 1e4) / 1e4))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert(row.getAs[Double]("zipf_slope") === math.rint(slope * 1e6) / 1e6)
    assert(math.abs(row.getAs[Double]("zipf_slope") + 1.0) < 0.1,
      "planted 100/k frequencies must fit slope near −1")
  }

  /** lineitem fixture for q41/q42: flag A is EXACTLY linear
    * (price = 2·qty + 1 → slope 2, intercept 1, r² 1); flag B is two
    * points (any two points regress perfectly, slope 3). */
  lazy val regrDir: String = {
    val d = Files.createTempDirectory("graft-r10-regr").toString
    Seq(
      (1L, 1, "A", "O", 1.0, 3.0, 0.0, new Timestamp(1700000000000L)),
      (1L, 2, "A", "O", 2.0, 5.0, 0.0, new Timestamp(1700000000000L)),
      (2L, 1, "A", "O", 3.0, 7.0, 0.0, new Timestamp(1700000000000L)),
      (3L, 1, "B", "F", 1.0, 1.0, 0.0, new Timestamp(1700000000000L)),
      (3L, 2, "B", "F", 2.0, 4.0, 0.0, new Timestamp(1700000000000L)))
      .toDF("l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("q41_unpivot: the wide aggregate melts to exact (measure, value) rows") {
    val r = Relational.q41Unpivot(spark, regrDir).collect()
      .map(x => (x.getAs[String]("l_returnflag"), x.getAs[String]("l_linestatus"),
        x.getAs[String]("measure")) -> x.getAs[Double]("value")).toMap
    assert(r.size === 6, "2 groups x 3 measures")
    assert(r(("A", "O", "n_rows")) === 3.0)
    assert(r(("A", "O", "sum_qty")) === 6.0)
    assert(r(("A", "O", "sum_price")) === 15.0)
    assert(r(("B", "F", "sum_price")) === 5.0)
  }

  test("q42_regr: planted linear data regresses to exact slope/intercept/r2") {
    val r = Relational.q42Regr(spark, regrDir).collect()
      .map(x => x.getAs[String]("l_returnflag") ->
        ((x.getAs[Long]("n_rows"), x.getAs[Double]("slope"),
          x.getAs[Double]("intercept"), x.getAs[Double]("r2")))).toMap
    assert(r("A") === ((3L, 2.0, 1.0, 1.0)), "y = 2x + 1 exactly")
    assert(r("B") === ((2L, 3.0, -2.0, 1.0)), "two points regress perfectly")
  }

  /** changepoint fixture: one type stepping 10/day → 30/day after
    * day 3. D_t = n·S_t − t·T peaks (|−320|) at t = 4 (day 3). */
  lazy val cpDir: String = {
    val d = Files.createTempDirectory("graft-r10-cp").toString
    val rows = for {
      day <- 0 until 8
      i <- 0 until (if (day < 4) 10 else 30)
    } yield ((day * 100 + i).toLong,
      new Timestamp((1700000000000000L + day * 86400000000L) / 1000 + i),
      i.toLong, "view", 1.0, "{}")
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("events_changepoint: the CUSUM peak lands on the planted step boundary") {
    val r = EventAnalytics.changepoint(spark, cpDir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_days") === 8L)
    assert(row.getAs[Long]("n_events") === 160L)
    val day0 = 1700000000000000L / 86400000000L
    assert(row.getAs[Long]("cp_day") === day0 + 3,
      "max |n·S_t − t·T| sits on the last low day")
    assert(row.getAs[Long]("cusum_peak") === 320L)
    assert(row.getAs[Double]("cusum_stat") === 0.25, "320 / (8·160)")
  }

  /** emb-stats fixture: two 2-dim vectors [1,3] and [3,5] → each dim
    * has mean ±2/4 and variance exactly 1. */
  lazy val dimDir: String = {
    val d = Files.createTempDirectory("graft-r10-dim").toString
    Seq((0L, Seq(1.0f, 3.0f), 1), (1L, Seq(3.0f, 5.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("emb_dim_stats: exact mean/variance/extremes per dimension") {
    val r = Similarity.embDimStats(spark, dimDir).collect()
      .map(x => x.getAs[Long]("dim") ->
        ((x.getAs[Long]("n_vecs"), x.getAs[Double]("mean_v"),
          x.getAs[Double]("var_v"), x.getAs[Double]("min_v"),
          x.getAs[Double]("max_v")))).toMap
    assert(r(1L) === ((2L, 2.0, 1.0, 1.0, 3.0)))
    assert(r(2L) === ((2L, 4.0, 1.0, 3.0, 5.0)))
  }

  test("q43_gap_fill: nulls forward-fill from the last planted observation") {
    // orders fixture: only keys 3 and 6 are %3==0 ⇒ observed
    val r = Relational.q43GapFill(spark, dir).collect()
      .map(x => x.getAs[Long]("o_orderkey") ->
        ((Option(x.getAs[java.lang.Double]("observed")),
          Option(x.getAs[java.lang.Double]("filled")),
          Option(x.getAs[java.lang.Double]("prev_obs"))))).toMap
    assert(r(1L) === ((None, None, None)), "nothing observed yet")
    assert(r(3L) === ((Some(10.0), Some(10.0), None)), "first observation")
    assert(r(4L) === ((None, Some(10.0), Some(10.0))), "carried forward")
    assert(r(5L) === ((None, Some(10.0), Some(10.0))))
    assert(r(6L) === ((Some(10.0), Some(10.0), None)),
      "customer 8 starts its own history")
    assert(r(7L) === ((None, Some(10.0), Some(10.0))))
  }

  /** contamination fixture: two sources sharing exactly one 8-gram
    * out of two each → containment 0.5 both directions. */
  lazy val contamDir: String = {
    val d = Files.createTempDirectory("graft-r10-cm").toString
    Seq(
      (0L, "a b c d e f g h x", "en", "srcA", 17L),
      (1L, "a b c d e f g h y", "en", "srcB", 17L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("pipeline_contamination_matrix: one shared 8-gram of two lands 0.5 both ways") {
    val r = Pipeline.contaminationMatrix(spark, contamDir).collect()
      .map(x => (x.getAs[String]("source_a"), x.getAs[String]("source_b")) ->
        ((x.getAs[Long]("n_shared"), x.getAs[Long]("n_grams_a"),
          x.getAs[Double]("containment")))).toMap
    assert(r.size === 2)
    assert(r(("srcA", "srcB")) === ((1L, 2L, 0.5)))
    assert(r(("srcB", "srcA")) === ((1L, 2L, 0.5)))
  }

  test("q44_cube: all four margins of the planted lineitem land exactly") {
    val r = Relational.q44Cube(spark, regrDir).collect()
      .map(x => (Option(x.getAs[String]("l_returnflag")),
        Option(x.getAs[String]("l_linestatus")), x.getAs[Long]("gid")) ->
        ((x.getAs[Long]("n_rows"), x.getAs[Double]("sum_qty")))).toMap
    assert(r.size === 7, "2 cells + 2 flag margins + 2 status margins + grand total")
    assert(r((Some("A"), Some("O"), 0L)) === ((3L, 6.0)))
    assert(r((Some("A"), None, 1L)) === ((3L, 6.0)))
    assert(r((None, Some("F"), 2L)) === ((2L, 3.0)))
    assert(r((None, None, 3L)) === ((5L, 9.0)))
  }

  /** set-op fixture: customer nations {1,2}, supplier nations {2,3}. */
  lazy val setopDir: String = {
    val d = Files.createTempDirectory("graft-r10-so").toString
    Seq((1L, "c1", 1L, "SEG", 0.0), (2L, "c2", 2L, "SEG", 0.0))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_mktsegment", "c_acctbal")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    Seq((1L, "s1", 2L), (2L, "s2", 3L))
      .toDF("s_suppkey", "s_name", "s_nationkey")
      .coalesce(1).write.parquet(s"$d/supplier.parquet")
    d
  }

  test("q45_intersect: both/customer_only/supplier_only memberships land exactly") {
    val r = Relational.q45Intersect(spark, setopDir).collect()
      .map(x => x.getAs[Long]("nk") -> x.getAs[String]("membership")).toMap
    assert(r === Map(1L -> "customer_only", 2L -> "both", 3L -> "supplier_only"))
  }

  /** incremental-dedup fixture: existing docs x/y/z; incoming 10
    * repeats x (dup), 20 is new. */
  lazy val incDir: String = {
    val d = Files.createTempDirectory("graft-r10-inc").toString
    Seq((1L, "x", "en", "s", 1L), (2L, "y", "en", "s", 1L),
      (3L, "z", "en", "s", 1L), (10L, "x", "en", "s", 1L),
      (20L, "new text", "en", "s", 8L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_incremental_bloom: the repeated incoming doc flags, the new one doesn't") {
    val r = Dedup.dedupIncrementalBloom(spark, incDir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Int]("is_dup")).toMap
    assert(r === Map(10L -> 1, 20L -> 0))
  }

  /** A/B fixture: arm A (even users) values {1, 3}; arm B (odd)
    * values {5, 9} → means 2/7, variances 1/4, z = −5/√2.5. */
  lazy val abDir: String = {
    val d = Files.createTempDirectory("graft-r10-ab").toString
    def ets(sec: Long) = new Timestamp(1700000000000L + sec * 1000)
    Seq(
      (1L, ets(0), 2L, "view", 1.0, "{}"),
      (2L, ets(1), 4L, "view", 3.0, "{}"),
      (3L, ets(2), 1L, "view", 5.0, "{}"),
      (4L, ets(3), 3L, "view", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("events_ab_test: planted arms land exact means and the closed-form z") {
    val r = EventAnalytics.abTest(spark, abDir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") === 2L)
    assert(row.getAs[Long]("n_b") === 2L)
    assert(row.getAs[Double]("mean_a") === 2.0)
    assert(row.getAs[Double]("mean_b") === 7.0)
    assert(row.getAs[Double]("diff") === -5.0)
    val z = BigDecimal((2.0 - 7.0) / math.sqrt(1.0 / 2.0 + 4.0 / 2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getAs[Double]("z_stat") === z)
  }

  /** novelty fixture: doc 1 plants the gram, doc 2 repeats it
    * (novelty 0), doc 3 shares it plus one new gram (novelty 0.5),
    * doc 4 is too short for any 8-gram (no row). */
  lazy val novDir: String = {
    val d = Files.createTempDirectory("graft-r10-nov").toString
    Seq(
      (1L, "a b c d e f g h", "en", "s", 15L),
      (2L, "a b c d e f g h", "en", "s", 15L),
      (3L, "a b c d e f g h x", "en", "s", 17L),
      (4L, "too short", "en", "s", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("text_novelty_curve: first doc novel, repeat 0, extension 0.5, short doc absent") {
    val r = TextAnalysis.textNoveltyCurve(spark, novDir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_grams"), x.getAs[Long]("n_novel"),
          x.getAs[Double]("novelty")))).toMap
    assert(r.keySet === Set(1L, 2L, 3L))
    assert(r(1L) === ((1L, 1L, 1.0)))
    assert(r(2L) === ((1L, 0L, 0.0)))
    assert(r(3L) === ((2L, 1L, 0.5)))
  }

  /** silence fixture: spaces (energy 256·32² — silent) vs 'z' runs
    * (256·122² — loud): silent, loud, silent, silent → 2 runs,
    * longest 2, first 0; plus a short silent tail window. */
  lazy val silDir: String = {
    val d = Files.createTempDirectory("graft-r10-sil").toString
    val text = (" " * 256) + ("z" * 256) + (" " * 512) + (" " * 10)
    Seq((1L, text, "en", "s", text.length.toLong),
      (2L, "z" * 256, "en", "s", 256L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("mm_silence_detect: planted silent/loud runs land exactly, incl. the scaled tail") {
    val r = Multimodal.mmSilenceDetect(spark, silDir).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_windows"), x.getAs[Long]("n_silent"),
          x.getAs[Long]("n_runs"), x.getAs[Long]("longest_run"),
          x.getAs[Long]("first_silent_idx")))).toMap
    // doc 1: windows [sil, loud, sil, sil, sil(10-byte tail)] —
    // the tail classifies on the same mean-square via e·256 < T·len
    assert(r(1L) === ((5L, 4L, 2L, 3L, 0L)))
    assert(r(2L) === ((1L, 0L, 0L, 0L, -1L)), "all loud: no run, first = -1")
  }

  /** interpolation fixture: one customer, observations 10 → 40 with
    * two gaps between, plus leading/trailing nulls. */
  lazy val interpDir: String = {
    val d = Files.createTempDirectory("graft-r10-ip").toString
    def ts(day: Int) =
      new Timestamp((1700000000000000L + day * 86400000000L) / 1000)
    Seq(
      (2L, 9L, "O", 99.0, ts(0), "A"), // 2 % 3 != 0 → leading null
      (3L, 9L, "O", 10.0, ts(1), "A"), // observed 10
      (4L, 9L, "O", 99.0, ts(2), "A"), // gap
      (5L, 9L, "O", 99.0, ts(3), "A"), // gap
      (6L, 9L, "O", 40.0, ts(4), "A"), // observed 40
      (7L, 9L, "O", 99.0, ts(5), "A")) // trailing null
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    d
  }

  test("q46_interpolate: backfill, exact thirds blend, forward fill") {
    val r = Relational.q46Interpolate(spark, interpDir).collect()
      .map(x => x.getAs[Long]("o_orderkey") -> x.getAs[Double]("interpolated"))
      .toMap
    assert(r(2L) === 10.0, "before the first observation: backfill")
    assert(r(3L) === 10.0)
    assert(r(4L) === 20.0, "10 + 30·(1/3)")
    assert(r(5L) === 30.0, "10 + 30·(2/3)")
    assert(r(6L) === 40.0)
    assert(r(7L) === 40.0, "after the last observation: forward fill")
  }

  /** F1 fixture: one true-en doc, one es-labeled doc whose text the
    * heuristic calls en → en: p=1/2, r=1; es: all zero. */
  lazy val f1Dir: String = {
    val d = Files.createTempDirectory("graft-r10-f1").toString
    Seq(
      (1L, "the and of to in", "en", "s", 16L),
      (2L, "the the the", "es", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("text_lang_f1: planted confusion lands exact precision/recall/F1") {
    val r = TextAnalysis.textLangF1(spark, f1Dir).collect()
      .map(x => x.getAs[String]("lang") ->
        ((x.getAs[Long]("tp"), x.getAs[Long]("n_labeled"),
          x.getAs[Long]("n_pred"), x.getAs[Double]("precision"),
          x.getAs[Double]("recall"), x.getAs[Double]("f1")))).toMap
    assert(r("en") === ((1L, 1L, 2L, 0.5, 1.0, 0.666667)))
    assert(r("es") === ((0L, 1L, 0L, 0.0, 0.0, 0.0)),
      "nothing predicted es: precision pins to 0, not NaN")
  }

  test("pipeline_mixture_temperature: equal sources split 0.5 at every temperature") {
    val r = Pipeline.mixtureTemperature(spark, contamDir).collect()
      .map(x => x.getAs[String]("source") ->
        ((x.getAs[Double]("share_t100"), x.getAs[Double]("share_t50"),
          x.getAs[Double]("share_t25")))).toMap
    assert(r("srcA") === ((0.5, 0.5, 0.5)))
    assert(r("srcB") === ((0.5, 0.5, 0.5)))
  }

  test("text_tokenizer_fertility: the zipf corpus counts land exactly") {
    val total = (1 to 10).map(k => 100 / k).sum.toLong
    val zipfLen = (1 to 10).flatMap(k => Seq.fill(100 / k)(f"t$k%02d"))
      .mkString(" ").length
    val r = TextAnalysis.textTokenizerFertility(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("ws_tokens") === total)
    assert(row.getAs[Long]("re_tokens") === total, "every token is one [a-z0-9]+ run")
    assert(row.getAs[Double]("re_fertility") === 1.0)
    assert(row.getAs[Long]("bpe_tokens") === math.ceil(zipfLen / 4.0).toLong)
  }

  test("events_error_rate_sli: error-free stream rates 0; rolling window sums the step") {
    val r = EventAnalytics.errorRateSli(spark, cpDir).collect()
    assert(r.length === 8)
    assert(r.forall(_.getAs[Double]("error_rate") === 0.0))
    val day0 = 1700000000000000L / 86400000000L
    val byDay = r.map(x => x.getAs[Long]("day") -> x.getAs[Long]("roll7_total")).toMap
    assert(byDay(day0) === 10L)
    assert(byDay(day0 + 7) === 150L, "days 1..7 = 3x10 + 4x30")
  }

  test("pipeline_curriculum: the clean zipf doc lands alone in stage 1") {
    val total = (1 to 10).map(k => 100 / k).sum.toLong
    val r = Pipeline.curriculum(spark, dir).collect()
    assert(r.length === 1)
    val row = r.head
    // q = 293/343 ≈ 0.854 (no stopwords) → top stage
    assert(row.getAs[Int]("stage") === 1)
    assert(row.getAs[String]("source") === "srcZ")
    assert(row.getAs[Long]("n_docs") === 1L)
    assert(row.getAs[Long]("n_tokens") === total)
    assert(row.getAs[Long]("stage_tokens") === total)
    assert(row.getAs[Double]("stage_share") === 1.0)
    assert(row.getAs[Long]("cum_tokens") === total)
  }
}
