package graft.operators

import java.nio.file.Files
import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-fixture semantics for the round-12 batch operators: the
  * oracle parity run proves cross-engine agreement; these prove the
  * operators compute the RIGHT thing on inputs whose answers are
  * known in closed form.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** customer: segment X has an acctbal TIE (5.00) broken by custkey;
    * segment Y a single negative-balance customer. lineitem: flag A
    * linenumbers {1,2,4} (and=0, or=7, xor=7), orderkeys {3,5}
    * (xor=6), one zero-quantity row; flag B all-deep-discount. */
  lazy val relDir: String = {
    val d = Files.createTempDirectory("graft-r12-rel").toString
    Seq(
      (1L, "c1", 0, 5.00, "X"),
      (2L, "c2", 0, 5.00, "X"),
      (3L, "c3", 0, -1.25, "Y"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.parquet(s"$d/customer.parquet")
    Seq(
      (3L, 1, 0.0, 0.00, "A"),
      (3L, 2, 2.0, 0.05, "A"),
      (5L, 4, 3.0, 0.00, "A"),
      (7L, 1, 1.0, 0.10, "B"))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    d
  }

  /** documents: docs 1/2 share the first 6 tokens (2 keeps the longer
    * tail), doc 3 unique; sources with hand-countable words, vowel
    * groups, and ≥7-char words. */
  lazy val docDir: String = {
    val d = Files.createTempDirectory("graft-r12-doc").toString
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6", "en", "s1"),
      (2L, "w1 w2 w3 w4 w5 w6 tail tail", "en", "s1"),
      (3L, "aa bb ccccccc", "en", "s2"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  /** events on a day grid (day0 = a fixed µs epoch):
    * u1 active days 0..10 (censored at corpus end 14), u2 day 0 only
    * (churned), u3 days 8..12 (censored), u4 day 14 (the corpus-end
    * anchor, censored), u5 one 0.8-day session SPANNING days 5–6
    * (churned). Sessions under the 24 h gap: u1 splits at the
    * 2.8-day and 7-day gaps (3 sessions), u3's 21.6 h gap does NOT
    * split while its 3.1-day gap does (2 sessions). */
  lazy val evDir: String = {
    val d = Files.createTempDirectory("graft-r12-ev").toString
    // day-ALIGNED epoch (19676 · 86400000000) so fixture day
    // offsets land on calendar-day boundaries
    val day0 = 1700006400000000L
    def ts(day: Double) = new Timestamp((day0 + (day * 86400000000L).toLong) / 1000)
    Seq(
      (1L, 1L, ts(0.0)), (2L, 1L, ts(0.2)), (3L, 1L, ts(3.0)),
      (4L, 1L, ts(10.0)),
      (5L, 2L, ts(0.5)),
      (6L, 3L, ts(8.0)), (7L, 3L, ts(8.9)), (8L, 3L, ts(12.0)),
      (9L, 4L, ts(14.0)),
      (10L, 5L, ts(5.5)), (11L, 5L, ts(6.3))) // one session SPANNING days 5–6
      .toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("q52_arg_minmax: acctbal tie broken by custkey, cents exact") {
    val r = Relational.q52ArgMinmax(spark, relDir).collect()
      .map(x => x.getString(0) -> x).toMap
    val xSeg = r("X")
    assert(xSeg.getAs[Long]("n_customers") === 2L)
    assert(xSeg.getAs[String]("top_name") === "c2") // tie → larger key
    assert(xSeg.getAs[Long]("top_acctbal_cents") === 500L)
    assert(xSeg.getAs[String]("bottom_name") === "c1")
    assert(xSeg.getAs[Long]("bottom_acctbal_cents") === 500L)
    val ySeg = r("Y")
    assert(ySeg.getAs[Long]("top_acctbal_cents") === -125L)
    assert(ySeg.getAs[String]("top_name") === "c3")
  }

  test("q53_bit_agg: known masks, xor, and boolean monoids") {
    val r = Relational.q53BitAgg(spark, relDir).collect()
      .map(x => x.getString(0) -> x).toMap
    val a = r("A")
    assert(a.getAs[Long]("and_linenumber") === 0L) // 1&2&4
    assert(a.getAs[Long]("or_linenumber") === 7L)  // 1|2|4
    assert(a.getAs[Long]("xor_orderkey") === (3L ^ 3L ^ 5L))
    assert(a.getAs[Boolean]("all_qty_ge1") === false) // the 0.0 row
    assert(a.getAs[Boolean]("any_deep_discount") === false) // max 0.05
    val b = r("B")
    assert(b.getAs[Boolean]("all_qty_ge1") === true)
    assert(b.getAs[Boolean]("any_deep_discount") === true) // 0.10
  }

  test("dedup_prefix: shared 6-token prefix groups, keeper = longest") {
    val rows = Dedup.dedupPrefix(spark, docDir).collect()
    assert(rows.length === 1) // only the {1,2} group; doc 3 unique
    val g = rows.head
    assert(g.getAs[Long]("n_docs") === 2L)
    assert(g.getAs[Long]("keeper") === 2L) // longer text wins
    assert(g.getAs[Long]("keeper_len") === "w1 w2 w3 w4 w5 w6 tail tail".length.toLong)
    assert(g.getAs[Long]("first_id") === 1L)
  }

  test("text_readability: hand-counted words, vowel groups, long words") {
    val r = TextAnalysis.textReadability(spark, docDir).collect()
      .map(x => x.getString(0) -> x).toMap
    val s2 = r("s2") // "aa bb ccccccc": 3 words, 11 chars, 1 vowel grp
    assert(s2.getAs[Long]("total_words") === 3L)
    // the operator rounds to 6 dp, so the expectations are exact
    assert(s2.getAs[Double]("avg_word_len") === 3.666667)
    assert(s2.getAs[Double]("syllables_per_word") === 0.333333)
    assert(s2.getAs[Double]("long_word_share") === 0.333333)
    val s1 = r("s1") // 6 + 8 words; "tail" has ONE vowel group (ai)
    assert(s1.getAs[Long]("total_words") === 14L)
    assert(s1.getAs[Double]("syllables_per_word") === 0.142857) // 2/14
    assert(s1.getAs[Double]("long_word_share") === 0.0)
  }

  test("q54_approx_quantile: brackets bound the sketch, exact on small groups") {
    // 100 distinct prices per flag → the GK sketch at accuracy 1000
    // is EXACT here, so in-bracket must hold and the bracket bounds
    // are the order statistics themselves
    val d = Files.createTempDirectory("graft-r12-q54").toString
    (for (f <- Seq("A", "B"); i <- 1 to 100)
      yield (i.toLong, i, 1.0, 0.0, f, i * 10.0))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount",
        "l_returnflag", "l_extendedprice")
      .coalesce(1).write.parquet(s"$d/lineitem.parquet")
    val r = Relational.q54ApproxQuantile(spark, d).collect()
      .map(x => x.getString(0) -> x).toMap
    for (f <- Seq("A", "B")) {
      assert(r(f).getAs[Long]("n") === 100L)
      assert(r(f).getAs[Boolean]("p50_in_bracket") === true)
      assert(r(f).getAs[Boolean]("p90_in_bracket") === true)
      // percentile_disc(0.498) over 1..100 ×10 → the 50th value
      assert(r(f).getAs[Double]("lo50") === 500.0)
      assert(r(f).getAs[Double]("hi90") === 910.0)
    }
  }

  test("events_markov_2nd: planted trigram path with known conditionals") {
    // one user, path A B A B A: trigrams (A,B,A)×2? — spell it out:
    // positions 1..5 → (A,B,A), (B,A,B), (A,B,A) → (A,B,A):2, (B,A,B):1
    val d = Files.createTempDirectory("graft-r12-mkv").toString
    val day0 = 1700006400000000L
    Seq(
      (1L, 1L, "A", 0L), (2L, 1L, "B", 1L), (3L, 1L, "A", 2L),
      (4L, 1L, "B", 3L), (5L, 1L, "A", 4L))
      .map { case (e, u, t, h) =>
        (e, u, t, new Timestamp((day0 + h * 3600000000L) / 1000)) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    val rows = EventAnalytics.markov2nd(spark, d).collect()
      .map(x => ((x.getString(0), x.getString(1), x.getString(2)),
        (x.getAs[Long]("n_tri"), x.getAs[Long]("p_ppm")))).toMap
    assert(rows === Map(
      ("A", "B", "A") -> ((2L, 1000000L)),
      ("B", "A", "B") -> ((1L, 1000000L))))
  }

  test("events_survival_curve: K-M ages, censoring, at-risk cumsum") {
    val rows = EventAnalytics.survivalCurve(spark, evDir).collect()
    val byAge = rows.map(x => x.getAs[Long]("age_days") -> x).toMap
    assert(byAge.keySet === Set(0L, 4L, 10L))
    // age 0: u2 + u5 churned (silent ≥ 7.7 days), u4 censored anchor
    assert(byAge(0L).getAs[Long]("n_churned") === 2L)
    assert(byAge(0L).getAs[Long]("n_censored") === 1L)
    assert(byAge(0L).getAs[Long]("at_risk") === 5L)
    assert(byAge(0L).getAs[Long]("hazard_ppm") === 400000L)
    // age 4: u3, last event 2 days before end → censored
    assert(byAge(4L).getAs[Long]("n_censored") === 1L)
    assert(byAge(4L).getAs[Long]("at_risk") === 2L)
    assert(byAge(4L).getAs[Long]("hazard_ppm") === 0L)
    // age 10: u1 censored (4 days silent < 7)
    assert(byAge(10L).getAs[Long]("at_risk") === 1L)
    assert(byAge(10L).getAs[Long]("n_churned") === 0L)
  }

  /** embeddings: corpus row 107 ([1,0]) has top-5 SEED neighbors with
    * labels 1,1,2,2,3 — a 2-2 vote tie that must break to label 1.
    * Seed = vec_id < 100 (the round-13 O(1) labeled-seed shape). */
  lazy val embDir: String = {
    val d = Files.createTempDirectory("graft-r12-emb").toString
    Seq(
      (107L, Seq(1.0f, 0.0f), 2), // the classified row; true label 2
      (1L, Seq(1.0f, 0.0f), 1),   // cos 1.0
      (2L, Seq(0.9f, 0.1f), 2),   // cos .994
      (3L, Seq(0.8f, 0.2f), 2),   // cos .970
      (4L, Seq(0.0f, 1.0f), 3),   // cos 0 — still 5th of 6
      (5L, Seq(0.95f, 0.05f), 1), // cos .999
      (6L, Seq(-1.0f, 0.0f), 3))  // cos −1 — excluded from top-5
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("knn_classify: majority vote, 2-2 tie breaks to smaller label") {
    val rows = Similarity.knnClassify(spark, embDir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("vec_id") === 107L)
    assert(r.getAs[Int]("true_label") === 2)
    assert(r.getAs[Int]("pred_label") === 1) // labels 1,1,2,2,3 → tie → 1
    assert(r.getAs[Long]("votes") === 2L)
    assert(r.getAs[Boolean]("correct") === false)
  }

  /** documents for frame hashing: doc 1 = two IDENTICAL 256-char
    * frames (hamming 0 → dup), doc 2 = a flat frame then a
    * half-low/half-high frame (hamming 8 → not dup), doc 3 single
    * frame (excluded). */
  lazy val frameDir: String = {
    val d = Files.createTempDirectory("graft-r12-frame").toString
    val flat = "a" * 256
    val split = "a" * 128 + "z" * 128
    Seq(
      (1L, flat + flat, "en", "s1"),
      (2L, flat + split, "en", "s1"),
      (3L, "short", "en", "s1"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("mm_frame_dup_rate: identical frames dup, split frame not, singles excluded") {
    val rows = Multimodal.mmFrameDupRate(spark, frameDir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L).getAs[Long]("n_frames") === 2L)
    assert(rows(1L).getAs[Long]("n_dups") === 1L)
    assert(rows(1L).getAs[Double]("dup_rate") === 1.0)
    // flat frame hashes 0xFFFF (all px = mean), split frame 0xFF00
    // (low half below mean) → hamming 8 > 4
    assert(rows(2L).getAs[Long]("n_dups") === 0L)
    assert(rows(2L).getAs[Double]("dup_rate") === 0.0)
  }

  test("ann_kmeans_recall: planted clusters, verdict true for every query") {
    // 60 vectors in 3 axis-aligned clusters (i % 3) with tiny
    // deterministic jitter; queries 0..4 → a sane learned quantizer
    // must route each to a cell holding true neighbors
    val d = Files.createTempDirectory("graft-r12-kmr").toString
    (0 until 60).map { i =>
      val c = i % 3
      val v = (0 until 8).map(j =>
        (if (j == c) 1.0f else 0.0f) + (if (j == (c + 3)) i * 0.001f else 0.0f))
      (i.toLong, v, c)
    }.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    val rows = Similarity.annKmeansRecall(spark, d).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Boolean]("recall_ok")),
      "every query must land ≥1 true top-10 neighbor in its kmeans top-3")
    // exact_top1 must share the query's cluster (cosine structure)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_top1") % 3 === r.getAs[Long]("qid") % 3)
    }
  }

  test("pipeline_dedup_cascade: each tier removes exactly its own dup class") {
    // A-pair verbatim dups (tier 1), B-pair equal only after
    // whitespace collapse (tier 2), C-pair equal only on the 6-token
    // prefix (tier 3), D unique — the funnel must be 7→6→5→4 with
    // one removal per tier
    val d = Files.createTempDirectory("graft-r12-cascade").toString
    Seq(
      (1L, "x y"), (2L, "x y"),
      (3L, "a  b"), (4L, "a b"),
      (5L, "w1 w2 w3 w4 w5 w6 t7"), (6L, "w1 w2 w3 w4 w5 w6"),
      (7L, "unique doc"))
      .toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val rows = Pipeline.dedupCascade(spark, d).collect()
      .map(x => (x.getAs[Long]("tier_no"), x.getAs[Long]("docs_in"),
        x.getAs[Long]("docs_removed"), x.getAs[Long]("docs_out")))
    assert(rows.toSeq === Seq((1L, 7L, 1L, 6L), (2L, 6L, 1L, 5L),
      (3L, 5L, 1L, 4L)))
  }

  test("events_heavy_hitters: MG eviction under k=3 keeps the recall guarantee") {
    // one heavy dollar bucket (400 of 1000 events = 40% at value 7.0)
    // buried in 40 noise buckets (100..139); k = 3 counters FORCES
    // constant decrement-all eviction, and the guarantee (recall
    // above n/(k+1) = 25%) must still surface the heavy key; θ = n/4
    // = 25% — the LARGEST threshold the k=3 soundness guard admits
    // (review catch: the first draft ran θ = 5% < the recall bound
    // and was sound only by luck) — → exactly one row out, with the
    // EXACT count
    val d = Files.createTempDirectory("graft-r12-hh").toString
    val day0 = 1700006400000000L
    val rows = (0 until 1000).map { i =>
      val value = if (i % 5 < 2) 7.0 else (100 + i % 40).toDouble
      (i.toLong, i.toLong % 7, "click", value,
        new Timestamp((day0 + i * 60000000L) / 1000))
    }
    rows.toDF("event_id", "user_id", "event_type", "value", "ts")
      .repartition(8) // multiple partitions: the union-of-summaries path
      .write.parquet(s"$d/events.parquet")
    val out = EventAnalytics.heavyHitters(spark, d, k = 3,
      thresholdDen = 4L).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("dollars") === 7L)
    assert(out.head.getAs[Long]("n_events") === 400L)
    assert(out.head.getAs[Long]("share_ppm") === 400000L)
    // eviction PROVABLY ran: per-partition summaries hold ≤ k keys,
    // so the candidate union (≤ 3·8 = 24) must be smaller than the
    // 41 distinct keys a full groupBy would shuffle
    import spark.implicits._
    val mg = EventAnalytics.mgSummary(
      graft.Tables.events(spark, d)
        .select(org.apache.spark.sql.functions.expr(
          "CAST(round(value) AS BIGINT)")).as[Long], 3)
    val nCand = mg.filter($"key" =!= EventAnalytics.MgCountKey)
      .select("key").distinct().count()
    assert(nCand < 41L, s"eviction never ran: $nCand candidates")
    assert(nCand >= 1L)
    // the folded per-partition counts must reconstruct the total
    val tot = mg.filter($"key" === EventAnalytics.MgCountKey)
      .agg(org.apache.spark.sql.functions.sum("rows")).collect()(0).getLong(0)
    assert(tot === 1000L)
    // and the unsound parameter pair must be rejected loudly
    intercept[IllegalArgumentException] {
      EventAnalytics.heavyHitters(spark, d, k = 3, thresholdDen = 20L)
    }
  }

  test("events_active_sessions: sweep-line concurrency, zero days dropped") {
    val rows = EventAnalytics.activeSessions(spark, evDir).collect()
      .map(x => (x.getAs[Long]("day"), x.getAs[Long]("open_sessions"),
        x.getAs[Long]("n_starts")))
    // day-ALIGNED epoch (19676 · 86400000000) so fixture day
    // offsets land on calendar-day boundaries
    val day0 = 1700006400000000L / 86400000000L
    // u1 s1 days 0–0, u1 s2 day 3 (27 h gap splits), u1 s3 day 10,
    // u2 day 0, u3 s1 days 8–8 (0.9-day gap does NOT split), u3 s2
    // day 12, u4 day 14
    assert(rows.toSet === Set(
      (day0 + 0, 2L, 2L),  // u1 s1 + u2
      (day0 + 3, 1L, 1L),
      (day0 + 5, 1L, 1L),  // u5's spanning session starts
      (day0 + 6, 1L, 0L),  // ...and is still OPEN on day 6 with no
                           // start — the densification catch
      (day0 + 8, 1L, 1L),
      (day0 + 10, 1L, 1L),
      (day0 + 12, 1L, 1L),
      (day0 + 14, 1L, 1L)))
  }
}
