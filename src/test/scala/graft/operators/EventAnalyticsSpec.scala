package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structural invariants for the §2h event-analytics suite on the
  * sf0.001 tables — properties the DuckDB hash oracle can't state
  * (partition/monotonicity laws), checked against the real data.
  */
class EventAnalyticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private val GapUs = 24L * 3600 * 1000 * 1000

  test("sessionize partitions the event stream exactly") {
    val ev = graft.Tables.events(spark, dir)
    val sessions = EventAnalytics.sessionize(spark, dir).collect()
    assert(sessions.map(_.getAs[Long]("n_events")).sum === ev.count())
    // session numbering is contiguous from 1 per user
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val nos = rows.map(_.getAs[Long]("session_no")).sorted
      assert(nos.head === 1L)
      assert(nos === (1L to nos.length.toLong).toArray)
    }
  }

  test("sessionize: consecutive sessions of a user are separated by > gap") {
    val sessions = EventAnalytics.sessionize(spark, dir).collect()
    sessions.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rows) =>
      val ordered = rows.sortBy(_.getAs[Long]("session_no"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          val gap = b.getAs[Long]("session_start_us") - a.getAs[Long]("session_end_us")
          assert(gap > GapUs, s"inter-session gap $gap not > $GapUs")
        case _ => ()
      }
      // sessions are well-formed intervals
      ordered.foreach { r =>
        assert(r.getAs[Long]("session_end_us") >= r.getAs[Long]("session_start_us"))
      }
    }
  }

  test("inter-event gaps partition the stream: n_gaps = events - users; percentiles ordered") {
    val ev = graft.Tables.events(spark, dir)
    val rows = EventAnalytics.interEventGaps(spark, dir).collect()
    // every event except each user's FIRST contributes exactly one gap
    val users = ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_gaps")).sum === ev.count() - users)
    rows.foreach { r =>
      val (mn, med, p90, mx) = (r.getAs[Long]("min_gap_us"),
        r.getAs[Long]("median_gap_us"), r.getAs[Long]("p90_gap_us"),
        r.getAs[Long]("max_gap_us"))
      assert(mn >= 0L, "time moves forward within a user's stream")
      assert(mn <= med && med <= p90 && p90 <= mx,
        s"percentiles must be ordered: $mn $med $p90 $mx")
    }
  }

  test("funnel stages are monotone and ordered in time") {
    val rows = EventAnalytics.funnel(spark, dir).collect()
    assert(rows.map(_.getAs[String]("stage")).toSeq ===
      Seq("1_view", "2_click", "3_purchase"))
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2))
    // a stage's earliest entry can never precede the prior stage's
    assert(rows(1).getAs[Long]("first_entry_us") > rows(0).getAs[Long]("first_entry_us"))
    assert(rows(2).getAs[Long]("first_entry_us") > rows(1).getAs[Long]("first_entry_us"))
  }

  test("cohort retention: offset-0 cell is the full cohort, totals add up") {
    val rows = EventAnalytics.cohortRetention(spark, dir).collect()
    assert(rows.forall(_.getAs[Long]("week_offset") >= 0L))
    val users = graft.Tables.events(spark, dir)
      .select("user_id").distinct().count()
    // every user is active in their own first week, so the offset-0
    // cells partition the user base
    val offset0 = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    assert(offset0 === users)
    // and no later cell can exceed its cohort's size
    val cohortSize = rows.filter(_.getAs[Long]("week_offset") == 0L)
      .map(r => r.getAs[Long]("cohort_week") -> r.getAs[Long]("n_users")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= cohortSize(r.getAs[Long]("cohort_week")))
    }
  }

  test("attribution partitions the purchases; latency is non-negative") {
    val rows = EventAnalytics.attribution(spark, dir).collect()
    val purchases = graft.Tables.events(spark, dir)
      .filter(org.apache.spark.sql.functions.col("event_type") === "purchase")
      .count()
    assert(rows.map(_.getAs[Long]("n_conversions")).sum === purchases)
    val types = Set("view", "click", "signup", "error", "(direct)")
    rows.foreach { r =>
      // a purchase can never be its own touch
      assert(types.contains(r.getAs[String]("touch_type")))
      // the touch strictly precedes the purchase, so summed latency
      // is positive wherever a touch exists
      if (r.getAs[String]("touch_type") != "(direct)")
        assert(r.getAs[Long]("sum_latency_us") > 0L)
      else assert(r.isNullAt(r.fieldIndex("sum_latency_us")))
    }
  }

  test("spike days: baseline re-derives from the daily counts") {
    val rows = EventAnalytics.spikeDays(spark, dir).collect()
    val daily = rows.map(r => (r.getAs[String]("event_type"),
      r.getAs[Long]("day")) -> r.getAs[Long]("n_events")).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type"); val d = r.getAs[Long]("day")
      val win = (d - 6 until d).flatMap(x => daily.get((et, x)))
      assert(r.getAs[Long]("base_days") === win.length.toLong)
      assert(r.getAs[Long]("base_events") === win.sum)
      val expect =
        if (win.isEmpty) 0
        else if (r.getAs[Long]("n_events") * win.length * 3 > win.sum * 4) 1
        else 0
      assert(r.getAs[Int]("is_spike") === expect)
    }
  }

  test("rolling daily 7-day sums equal the naive window") {
    val rows = EventAnalytics.rollingDaily(spark, dir).collect()
    val daily = rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
      (r.getAs[Long]("n_events"), r.getAs[Double]("day_value"))).toMap
    rows.foreach { r =>
      val et = r.getAs[String]("event_type"); val d = r.getAs[Long]("day")
      val win = (d - 6 to d).flatMap(x => daily.get((et, x)))
      assert(r.getAs[Long]("roll7_events") === win.map(_._1).sum)
      assert(math.abs(r.getAs[Double]("roll7_value") - win.map(_._2).sum) < 1e-4)
    }
  }
}
