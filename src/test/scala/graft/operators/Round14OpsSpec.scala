package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Planted-fixture semantics for the round-14 operators: the oracle
  * parity run proves cross-engine agreement; these prove the
  * operators compute the RIGHT thing on inputs whose answers are
  * known in closed form — island boundaries, sign-bit packing edges,
  * the exact-integer CV verdict, disjoint-alphabet classification,
  * and clipped-run folds.
  */
class Round14OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // q55_gaps_islands

  /** cust 1 orders on days 1,2,3 (island of 3), 7 (island of 1),
    * 9,10 (island of 2) — day 2 ordered TWICE (the distinct guard);
    * cust 2 a single day. */
  lazy val ordersDir: String = {
    val d = Files.createTempDirectory("graft-r14-orders").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def day(n: Int) =
      new java.sql.Timestamp(base.getTime + n.toLong * 86400000L)
    Seq((1L, day(1)), (1L, day(2)), (1L, day(2)), (1L, day(3)),
      (1L, day(7)), (1L, day(9)), (1L, day(10)), (2L, day(5)))
      .toDF("o_custkey", "o_orderdate")
      .coalesce(1).write.parquet(s"$d/orders.parquet")
    d
  }

  test("q55_gaps_islands: island boundaries and the duplicate-day guard") {
    val rows = Relational.q55GapsIslands(spark, ordersDir).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("n_islands"),
          r.getAs[Long]("max_streak"))).toMap
    assert(rows === Map(1L -> ((6L, 3L, 3L)), 2L -> ((1L, 1L, 1L))))
  }

  // ---------------------------------------------------------------
  // ann_binary_topk

  /** Sign patterns chosen so Hamming distances are closed-form:
    * ids 0-4 are the query set (id 0 all-positive); id 5 equals id 0
    * (hamming 0), id 6 flips dims 0-3 (hamming 4), id 7 flips dims
    * 32-63 — the ENTIRE hi word, exercising bit 31 of each packed
    * half (hamming 32). Magnitudes differ from signs so the rerank
    * provably orders by cosine, not by Hamming. */
  lazy val embDir: String = {
    val d = Files.createTempDirectory("graft-r14-emb").toString
    def vec(f: Int => Float): Array[Float] = Array.tabulate(64)(f)
    val rows = Seq(
      (0L, vec(_ => 1.0f)),
      (1L, vec(i => if (i % 2 == 0) 1.0f else -1.0f)),
      (2L, vec(i => if (i % 3 == 0) 1.0f else -1.0f)),
      (3L, vec(i => if (i < 16) -1.0f else 1.0f)),
      (4L, vec(i => if (i >= 48) -1.0f else 1.0f)),
      (5L, vec(_ => 2.0f)),
      (6L, vec(i => if (i < 4) -3.0f else 1.0f)),
      (7L, vec(i => if (i >= 32) -1.0f else 1.0f)))
    rows.toDF("vec_id", "embedding").withColumn("label", lit(0))
      .coalesce(1).write.parquet(s"$d/embeddings.parquet")
    d
  }

  test("ann_binary_topk: packing edges, Hamming exactness, cosine rerank") {
    val out = Similarity.annBinaryTopk(spark, embDir).collect()
    val q0 = out.filter(_.getAs[Long]("qid") == 0L)
      .sortBy(_.getAs[Long]("rank"))
    val ham0 = q0.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("hamming")).toMap
    // closed-form sign disagreements with the all-positive query
    assert(ham0(5L) === 0L)
    assert(ham0(6L) === 4L)
    assert(ham0(7L) === 32L) // the full hi word, incl. bit 63
    // rerank is by COSINE: id 5 (identical direction, scaled) must
    // outrank id 6 despite both surviving the shortlist
    assert(q0.head.getAs[Long]("vec_id") === 5L)
    assert(q0.head.getAs[Double]("cos_sim") === 1.0)
    // every query ranks each neighbor once, ranks contiguous from 1
    out.groupBy(_.getAs[Long]("qid")).foreach { case (_, rs) =>
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks === (1L to ranks.length.toLong).toArray)
    }
  }

  // ---------------------------------------------------------------
  // events_bot_regularity

  /** user 1: 22 events exactly 60 s apart (CV = 0 — bot); user 2:
    * 22 events with wildly alternating gaps (CV > 0.5 — human);
    * user 3: metronomic but only 4 events (below the n floor). */
  lazy val botDir: String = {
    val d = Files.createTempDirectory("graft-r14-bot").toString
    val t0 = 1700000000000000L // µs
    def ts(us: Long) = new java.sql.Timestamp(us / 1000L)
    val u1 = (0 until 22).map(i =>
      (100L + i, 1L, ts(t0 + i * 60000000L)))
    val gaps2 = Seq.tabulate(21)(i => if (i % 2 == 0) 1000000L else 3600000000L)
    val times2 = gaps2.scanLeft(t0)(_ + _)
    val u2 = times2.zipWithIndex.map { case (us, i) => (200L + i, 2L, ts(us)) }
    val u3 = (0 until 4).map(i => (300L + i, 3L, ts(t0 + i * 60000000L)))
    (u1 ++ u2 ++ u3).toDF("event_id", "user_id", "ts")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("events_bot_regularity: exact CV verdict and the n-gaps floor") {
    val rows = EventAnalytics.botRegularity(spark, botDir).collect()
      .map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(rows(1L).getAs[Long]("n_gaps") === 21L)
    assert(rows(1L).getAs[Long]("mean_gap_us") === 60000000L)
    assert(rows(1L).getAs[Double]("cv") === 0.0)
    assert(rows(1L).getAs[Boolean]("is_bot"))
    // user 2: gaps alternate 1 s / 3600 s → CV ≈ 1 ≫ 0.5
    assert(rows(2L).getAs[Double]("cv") > 0.5)
    assert(!rows(2L).getAs[Boolean]("is_bot"))
    // user 3: perfectly regular but below the 20-gap floor
    assert(rows(3L).getAs[Long]("n_gaps") === 3L)
    assert(rows(3L).getAs[Double]("cv") === 0.0)
    assert(!rows(3L).getAs[Boolean]("is_bot"))
  }

  // ---------------------------------------------------------------
  // text_char_trigram_langid

  /** Disjoint trigram alphabets: xx docs live in 'aero', yy docs in
    * 'bilk' — doc 3 is LABELED xx but written in yy's alphabet, so
    * the classifier must call it yy (correct = false). */
  lazy val triDir: String = {
    val d = Files.createTempDirectory("graft-r14-tri").toString
    Seq((1L, "xx", "aero aero aero"), (2L, "yy", "bilk bilk bilk"),
      (3L, "xx", "bilk bilk"))
      .toDF("doc_id", "lang", "text")
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("text_char_trigram_langid: disjoint alphabets classify by content") {
    val rows = TextAnalysis.textCharTrigramLangid(spark, triDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("pred_lang"), r.getAs[Boolean]("correct"))).toMap
    assert(rows(1L) === (("xx", true)))
    assert(rows(2L) === (("yy", true)))
    // the mislabeled doc follows its CONTENT, not its label
    assert(rows(3L) === (("yy", false)))
  }

  // ---------------------------------------------------------------
  // mm_audio_clipping

  /** 'z' (122) clips, 'a' (97) doesn't: "zzzaz" → 4 clipped, longest
    * run 3; "aaa" → silent of clips entirely. */
  lazy val clipDir: String = {
    val d = Files.createTempDirectory("graft-r14-clip").toString
    Seq((1L, "zzzaz"), (2L, "aaa"), (3L, "azzzzb"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  // ---------------------------------------------------------------
  // events_ab_srm

  /** 4 users (2 per arm). Type x routes 30 A-events vs 10 B-events
    * (closed form: d = 30·4 − 40·2 = 40, χ² = 1600/(40·2·2) = 10 —
    * SRM); type y routes 10/10 (d = 0, χ² = 0 — healthy). */
  lazy val srmDir: String = {
    val d = Files.createTempDirectory("graft-r14-srm").toString
    val t0 = 1700000000000L
    def ts(i: Int) = new java.sql.Timestamp(t0 + i * 1000L)
    val x = (0 until 40).map(i =>
      (1000L + i, if (i < 30) (i % 2) * 2L else (i % 2) * 2L + 1L, "x", ts(i)))
    val y = (0 until 20).map(i =>
      (2000L + i, (i % 4).toLong, "y", ts(i)))
    (x ++ y).toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("events_ab_srm: exact chi-square verdict on a planted biased split") {
    val rows = EventAnalytics.abSrm(spark, srmDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
          r.getAs[Double]("chi2"), r.getAs[Boolean]("srm"))).toMap
    assert(rows("x") === ((30L, 10L, 10.0, true)))
    assert(rows("y") === ((10L, 10L, 0.0, false)))
  }

  // ---------------------------------------------------------------
  // asof_join_nearest

  /** user 1: views at t=0 s and t=100 s; purchases at 40 s (backward
    * wins 40 < 60), 50 s (exact tie → backward), 70 s (forward wins
    * 30 < 70). user 2: a viewless purchase → direction 'none'. */
  lazy val nearestDir: String = {
    val d = Files.createTempDirectory("graft-r14-asof").toString
    val t0 = 1700000000000000L
    def ts(sec: Long) = new java.sql.Timestamp((t0 + sec * 1000000L) / 1000L)
    Seq(
      (10L, 1L, "view", ts(0)), (11L, 1L, "view", ts(100)),
      (20L, 1L, "purchase", ts(40)), (21L, 1L, "purchase", ts(50)),
      (22L, 1L, "purchase", ts(70)),
      (30L, 2L, "purchase", ts(10)))
      .toDF("event_id", "user_id", "event_type", "ts")
      .coalesce(1).write.parquet(s"$d/events.parquet")
    d
  }

  test("asof_join_nearest: direction choice, the backward tie, and 'none'") {
    val rows = Streams.asofJoinNearest(spark, nearestDir).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.getAs[java.lang.Long]("view_id")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("gap_us")).map(_.toLong),
          r.getAs[String]("direction"))).toMap
    assert(rows(20L) === ((Some(10L), Some(-40000000L), "backward")))
    assert(rows(21L) === ((Some(10L), Some(-50000000L), "backward")))
    assert(rows(22L) === ((Some(11L), Some(30000000L), "forward")))
    assert(rows(30L) === ((None, None, "none")))
  }

  // ---------------------------------------------------------------
  // stream_exec_foreach_upsert

  test("stream_exec_foreach_upsert: multi-batch replace equals the batch agg") {
    val dir = "/root/testdata/sf0.001"
    // the manifest-sized trigger puts the sf0.001 corpus through ~8
    // micro-batches, so every key is REPLACED multiple times before
    // this equality can hold
    val got = Streams.streamExecForeachUpsert(spark, dir).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val exp = graft.Tables.events(spark, dir)
      .select(date_trunc("day", col("ts")).as("ws"), col("event_type"))
      .groupBy("ws", "event_type").agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(got === exp)
  }

  test("mm_audio_clipping: threshold, ppm, and the run-length fold") {
    val rows = Multimodal.mmAudioClipping(spark, clipDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_samples"), r.getAs[Long]("n_clipped"),
          r.getAs[Long]("clip_ppm"), r.getAs[Long]("max_clip_run"))).toMap
    assert(rows(1L) === ((5L, 4L, 800000L, 3L)))
    assert(rows(2L) === ((3L, 0L, 0L, 0L)))
    assert(rows(3L) === ((6L, 4L, 666666L, 4L)))
  }
}
