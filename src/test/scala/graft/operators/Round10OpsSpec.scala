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
}
