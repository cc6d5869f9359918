package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-fixture semantics for the round-11 operators: the oracle
  * parity run proves cross-engine agreement; these prove the
  * operators compute the RIGHT thing on inputs whose answers are
  * known in closed form.
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** orders: customer 7's three orders on days 0, 2, 7 with prices
    * 10 < 20 < 30; lineitem: returnflag A skewed 4:1 over B with
    * known quantities; customer keys 5, 10 (÷5 — excluded by NOT IN)
    * and 7. */
  lazy val relDir: String = {
    val d = Files.createTempDirectory("graft-r11-rel").toString
    val day0 = 1700000000000000L
    def ts(day: Int) = new Timestamp((day0 + day * 86400000000L) / 1000)
    Seq(
      (1L, 7L, "O", 10.0, ts(0), "1-URGENT"),
      (2L, 7L, "O", 20.0, ts(2), "3-MEDIUM"),
      (3L, 7L, "O", 30.0, ts(7), "3-MEDIUM"),
      (97L * 1, 9L, "F", 40.0, ts(1), "3-MEDIUM"), // NULLed key (97|key)
      (5L, 5L, "O", 50.0, ts(3), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    Seq((5L, "cust5"), (7L, "cust7"), (10L, "cust10"))
      .toDF("c_custkey", "c_name")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    // flag A: quantities 1,2,3,10 (avg 4 → only 10 above); flag B: 5,5
    Seq((1L, "A", "O", 1.0), (2L, "A", "O", 2.0), (3L, "A", "O", 3.0),
      (4L, "A", "F", 10.0), (5L, "B", "O", 5.0), (6L, "B", "O", 5.0))
      .toDF("l_orderkey", "l_returnflag", "l_linestatus", "l_quantity")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    d
  }

  test("q47_salted_skew_join: salted result equals the unsalted join") {
    val r = Relational.q47SaltedSkewJoin(spark, relDir).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getAs[Long]("n_rows"), x.getAs[Long]("n_above_avg")))).toMap
    assert(r(("A", "O")) === ((3L, 0L)), "1,2,3 all at or below the 4.0 flag avg")
    assert(r(("A", "F")) === ((1L, 1L)), "10 is above")
    assert(r(("B", "O")) === ((2L, 0L)), "5,5 exactly at avg — not above")
  }

  test("q47 plans a shuffled join, not a broadcast (the salting demo)") {
    val plan = Relational.q47SaltedSkewJoin(spark, relDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin") || plan.contains("SortMergeJoin"),
      s"salted join must shuffle on (flag, salt):\n$plan")
  }

  test("q48_not_in_null_aware: NULL lhs rows vanish, ÷5 keys excluded") {
    val r = Relational.q48NotInNullAware(spark, relDir).collect()
      .map(x => x.getString(0) -> ((x.getAs[Long]("n_rows"),
        x.getAs[Long]("key_checksum")))).toMap
    // order 97 (NULL key) gone; order 5 (cust 5, ÷5) gone; 1,2,3 stay
    assert(r === Map("O" -> ((3L, 6L))))
  }

  test("q49_lead_lag_windows: gaps, nth_value, cume_dist on customer 7") {
    val r = Relational.q49LeadLagWindows(spark, relDir).collect()
      .filter(_.getAs[Long]("o_custkey") == 7L)
      .map(x => x.getAs[Long]("o_orderkey") -> x).toMap
    assert(r(1L).getAs[Any]("prev_gap_days") === null)
    assert(r(2L).getAs[Long]("prev_gap_days") === 2L)
    assert(r(2L).getAs[Long]("next_gap_days") === 5L)
    assert(r(3L).getAs[Long]("first_order") === 1L)
    assert(r(3L).getAs[Long]("second_order") === 2L)
    // prices 10<20<30 → cume_dist 1/3, 2/3, 1
    assert(r(1L).getAs[Double]("price_cume_dist") === 0.333333)
    assert(r(3L).getAs[Double]("price_cume_dist") === 1.0)
  }

  test("q50_except_all: multiplicities, not set difference") {
    val r = Relational.q50ExceptAll(spark, relDir).collect()
      .map(x => x.getAs[Long]("o_custkey") -> x.getAs[Long]("multiplicity")).toMap
    // cust 7: 3 open − 1 urgent = 2 copies; cust 5: 1 open − 1 urgent = 0
    assert(r === Map(7L -> 2L))
  }

  test("q51_histogram: bounds land min in bucket 0, max in bucket 19") {
    val r = Relational.q51Histogram(spark, relDir).collect()
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("n")).toMap
    assert(r(0L) === 1L, "the min price")
    assert(r(19L) === 1L, "the max price caps into the last bucket")
    assert(r.values.sum === 5L)
  }

  /** documents: group X = two copies where doc 2's text is LONGER
    * (trailing spaces normalize away but count in length) → keeper 2;
    * group Y = identical copies → tie to min id. */
  lazy val docsDir: String = {
    val d = Files.createTempDirectory("graft-r11-docs").toString
    Seq(
      (1L, "same text here", "en", "s1"),
      (2L, "same  text  here ", "en", "s1"), // longer original, same normalized
      (5L, "other doc", "en", "s2"),
      (6L, "other doc", "en", "s2"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("dedup_keep_best: longest text wins, ties to min doc_id") {
    val r = Dedup.dedupKeepBest(spark, docsDir).collect()
      .map(x => x.getAs[Long]("keeper") ->
        ((x.getAs[Long]("keeper_len"), x.getAs[Long]("n_copies"))))
      .toMap
    assert(r(2L) === ((17L, 2L)), "doc 2's original is longer — it keeps")
    assert(r(5L) === ((9L, 2L)), "identical copies tie to min id")
  }

  test("text_hapax_ratio: counts and exact ppm") {
    val d = Files.createTempDirectory("graft-r11-hapax").toString
    Seq((0L, "a a b c", "en", "s", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = TextAnalysis.textHapaxRatio(spark, d).collect()(0)
    assert(r.getAs[Long]("vocab") === 3L)
    assert(r.getAs[Long]("hapax") === 2L)
    assert(r.getAs[Long]("n_tokens") === 4L)
    assert(r.getAs[Long]("hapax_ppm") === 2000000L / 3L)
  }

  test("text_word_len_hist: lengths and shares") {
    val d = Files.createTempDirectory("graft-r11-wlh").toString
    Seq((0L, "a bb bb ccc", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = TextAnalysis.textWordLenHist(spark, d).collect()
      .map(x => x.getAs[Long]("len") ->
        ((x.getAs[Long]("n"), x.getAs[Long]("n_distinct"),
          x.getAs[Long]("share_ppm")))).toMap
    assert(r(1L) === ((1L, 1L, 250000L)))
    assert(r(2L) === ((2L, 1L, 500000L)))
    assert(r(3L) === ((1L, 1L, 250000L)))
  }

  test("text_bigram_pmi: exact scaled rational, count floor") {
    val d = Files.createTempDirectory("graft-r11-pmi").toString
    // "x y" ×6 adjacent + filler: c_xy=6; x only before y, y only after x
    val text = Seq.fill(6)("x y").mkString(" z ") // x y z x y z ... x y
    Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = TextAnalysis.textBigramPmi(spark, d).collect()
    val xy = rows.find(r => r.getString(0) == "x" && r.getString(1) == "y").get
    // bigrams: x→y ×6, y→z ×5, z→x ×5 → N=16; c_a(x)=6, c_b(y)=6
    assert(xy.getAs[Long]("c_ab") === 6L)
    assert(xy.getAs[Long]("pmi_ratio_ppm") === 6L * 16L * 1000000L / (6L * 6L))
  }

  test("pipeline_token_histogram: bit-length buckets") {
    val d = Files.createTempDirectory("graft-r11-th").toString
    Seq((0L, "a", "en", "s", 1L), // 1 token  → bucket 1
      (1L, "a b c", "en", "s", 5L), // 3 tokens → bucket 2
      (2L, "a b c d e f g h", "en", "s", 15L)) // 8 tokens → bucket 4
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = Pipeline.tokenHistogram(spark, d).collect()
      .map(x => x.getAs[Long]("bucket") -> x.getAs[Long]("n_docs")).toMap
    assert(r === Map(1L -> 1L, 2L -> 1L, 4L -> 1L))
  }

  test("pipeline_quality_sweep: a doc survives thresholds up to its score") {
    val d = Files.createTempDirectory("graft-r11-qs").toString
    // 10 non-stopword tokens → score = (10/60)·1.0 = 0.166667
    val text = (1 to 10).map(i => s"tok$i").mkString(" ")
    Seq((0L, text, "en", "s", text.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val r = Pipeline.qualitySweep(spark, d).collect()
      .map(x => x.getAs[Double]("threshold") -> x.getAs[Long]("n_docs")).toMap
    assert(r === Map(0.0 -> 1L, 0.1 -> 1L), "survives 0.0 and 0.1 only")
  }

  /** embeddings along axis 7 only (vec_ids ÷5 so the sample keeps
    * them): the covariance has a single nonzero cell → the iteration
    * must land exactly on e₇. */
  test("emb_power_iteration: single-axis corpus converges to that axis") {
    val d = Files.createTempDirectory("graft-r11-pi").toString
    def axis(c: Float) = Seq.tabulate(64)(i => if (i == 7) c else 0.0f)
    Seq((0L, axis(1.0f), 0), (5L, axis(0.5f), 0), (10L, axis(-0.8f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val r = Similarity.embPowerIteration(spark, d).collect()
      .map(x => x.getAs[Long]("dim") -> x.getAs[Long]("component_scaled")).toMap
    assert(r(7L) === 1000L)
    assert((0 until 64).filter(_ != 7).forall(i => r(i.toLong) === 0L))
  }

  test("emb_norm_outliers: the planted deviant flags, the cluster doesn't") {
    val d = Files.createTempDirectory("graft-r11-no").toString
    def uniform(c: Float) = Seq.tabulate(64)(_ => c)
    // nine norm-8 vectors + one norm-80: a single deviant among n
    // contributes dev² ≈ (n−1)·var, so n = 10 clears the ±2σ bar
    // (4·var) while the cluster stays far inside it
    val rows = (0L to 8L).map(i => (i, uniform(1.0f), 3)) :+
      ((9L, uniform(10.0f), 3))
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val r = Similarity.embNormOutliers(spark, d).collect()(0)
    assert(r.getAs[Long]("n_vectors") === 10L)
    assert(r.getAs[Long]("n_outliers") === 1L)
  }

  /** events: two users over known days; user 100 heavy + recent,
    * user 200 light + stale. */
  lazy val evDir: String = {
    val d = Files.createTempDirectory("graft-r11-ev").toString
    val day0 = 1700000000000L
    def ts(day: Int, i: Int) = new Timestamp(day0 + day * 86400000L + i * 1000)
    (Seq.tabulate(8)(i => (i.toLong, ts(7, i), 100L, "view", 10.0, "{}")) ++
      Seq((100L, ts(0, 0), 200L, "view", 1.0, "{}")))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("events_rfm_segments: heavy-recent vs light-stale users separate") {
    val r = EventAnalytics.rfmSegments(spark, evDir).collect()
      .map(x => ((x.getAs[Long]("r"), x.getAs[Long]("f"), x.getAs[Long]("m")),
        x.getAs[Long]("n_users"))).toMap
    // user 100: recency 0, freq 8, monetary 80 → quintile 1 on all axes
    // user 200: recency 7d, freq 1, monetary 1 → pushed to later quintiles
    assert(r(((1L, 1L, 1L))) === 1L)
    assert(r.values.sum === 2L)
    assert(r.size === 2)
  }

  test("events_stickiness: single-day week = 1e6 ppm") {
    val r = EventAnalytics.stickiness(spark, evDir).collect()
      .map(x => x.getAs[Long]("week") ->
        ((x.getAs[Long]("user_days"), x.getAs[Long]("weekly_users"),
          x.getAs[Long]("days_in_week"), x.getAs[Long]("stickiness_ppm"))))
      .toMap
    // each user active on exactly 1 distinct day of their week
    r.values.foreach { case (ud, wu, dw, ppm) =>
      assert(ppm === ud * 1000000L / (wu * dw))
    }
    assert(r.values.map(_._2).sum === 2L, "both users present across weeks")
  }

  test("events_value_histogram: cents buckets, extremes pinned") {
    val r = EventAnalytics.valueHistogram(spark, evDir).collect()
    val buckets = r.map(x => (x.getString(0), x.getAs[Long]("bucket"))).toSet
    // values 10.0 (×8) and 1.0: lo=100, hi=1000 → 1.0 in bucket 0,
    // 10.0 in bucket least(9, 900*10 DIV 901) = 9
    assert(buckets === Set(("view", 0L), ("view", 9L)))
  }

  test("mm_modality_mixture / mm_aspect_stats: metadata plumbing exact") {
    val mix = Multimodal.mmModalityMixture(spark, docsDir).collect()
      .map(x => x.getString(0) -> x.getAs[Long]("n_records")).toMap
    // doc_ids 1,2,5,6 → mod 3 = 1,2,2,0 → audio×1, video×2, image×1
    assert(mix === Map("image" -> 1L, "audio" -> 1L, "video" -> 2L))
    val asp = Multimodal.mmAspectStats(spark, docsDir).collect()
    assert(asp.map(_.getAs[Long]("n")).sum === 4L)
    // every planted n_chars < 480 → aspect = (w*100) DIV h with w = h
    asp.foreach(x => assert(x.getAs[Long]("aspect_bucket") === 100L))
  }
}
