package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.{dsum, events}
import graft.functions.GraftExpressions.{doubleToDecimal18 => d2dec}

/** §2h event-stream analytics — the queries a user of an
  * event-streaming engine (ref: kcore README roadmap's consumer-side
  * processing) runs over the topic's history: sessionization, funnel
  * conversion, cohort retention, rolling activity.
  *
  * Scale discipline (SURVEY §6):
  *   - every window is PARTITIONED by a high-cardinality key
  *     (user_id) or runs over an already-aggregated bounded frame
  *     (event_type × day) — no global sort, no single-partition
  *     window anywhere;
  *   - time buckets are pure integer arithmetic on epoch µs (`DIV`,
  *     never floor(double /)) so bucket edges are bit-identical in
  *     any engine;
  *   - double aggregates go through the decimal parity helpers.
  */
object EventAnalytics {

  private[graft] val DayUs = 86400000000L // µs per day
  // inactivity gap that closes a session — 24 h at the synthetic
  // corpus's density (~5 events/user/day, so a 30-min web-style gap
  // would make nearly every event its own session); gap choice is a
  // parameter of the semantics, not of the plan shape
  private val SessionGapUs = 24L * 3600 * 1000 * 1000

  /** Gap-based sessionization: a new session starts when a user is
    * idle > the gap. One window partitioned by user (lag + running
    * flag-sum), then a per-session aggregate — the classic log→
    * session rollup, parallel in #users at any scale.
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_no", sum("new_s").over(run))
      .groupBy("user_id", "session_no")
      .agg(
        min("ts_us").as("session_start_us"),
        max("ts_us").as("session_end_us"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("sum_value"))
      .orderBy("user_id", "session_no")
  }

  /** Inter-event gap distribution per event type — the engagement-
    * cadence view (how long between a user's consecutive actions,
    * attributed to the LATER event's type): one user-partitioned lag
    * window derives every gap, then exact DISCRETE percentiles per
    * type (the [[graft.operators.Relational.q29QuantileBucket]]
    * recipe — a boundary is an element OF the data, so the all-
    * integer µs gaps cross engines exactly, no interpolation to
    * drift by an ulp).
    *
    * 100-TB shape: the window shuffle is the event stream keyed by
    * user_id (the sessionize shape, §15.2-probed); the percentile
    * agg reduces to |types| rows. No global sort anywhere. */
  def interEventGaps(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val gaps = ev
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_us", col("ts_us") - col("prev_us"))
    def pd(p: Double) =
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY gap_us)")
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n_gaps"),
        min("gap_us").as("min_gap_us"),
        // percentile_disc returns DOUBLE even over BIGINT input; the
        // boundary is an element OF the integer data, so the cast back
        // is exact
        pd(0.5).cast("long").as("median_gap_us"),
        pd(0.9).cast("long").as("p90_gap_us"),
        max("gap_us").as("max_gap_us"))
      .orderBy("event_type")
  }

  /** Staged funnel view → click → purchase: each stage's entry time
    * is the user's first qualifying event STRICTLY AFTER the prior
    * stage (min-aggregate per user, then a keyed join — the corpus
    * is scanned per stage with the event_type filter pushed to the
    * parquet scan; only per-user stage times shuffle).
    */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    def stage(etype: String, prev: Option[DataFrame], prevCol: String): DataFrame = {
      val base = ev.filter(col("event_type") === etype)
      val gated = prev match {
        case Some(p) => base.join(p, "user_id").where(col("ts_us") > col(prevCol))
        case None    => base
      }
      gated.groupBy("user_id").agg(min("ts_us").as(s"t_$etype"))
    }
    val s1 = stage("view", None, "")
    val s2 = stage("click", Some(s1), "t_view")
    val s3 = stage("purchase", Some(s2), "t_click")
    def row(name: String, df: DataFrame, tcol: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"),
          min(col(tcol)).as("first_entry_us"), max(col(tcol)).as("last_entry_us"))
        .select(lit(name).as("stage"), col("n_users"),
          col("first_entry_us"), col("last_entry_us"))
    row("1_view", s1, "t_view")
      .unionAll(row("2_click", s2, "t_click"))
      .unionAll(row("3_purchase", s3, "t_purchase"))
      .orderBy("stage")
  }

  /** Weekly cohort retention: users grouped by first-seen week,
    * activity counted per (cohort week, week offset). Weeks are
    * integer epoch-week indices (µs DIV day DIV 7) — no calendar
    * WEEK() semantics to disagree across engines. The (user, week)
    * activity set is made distinct BEFORE the join, so each user
    * contributes exactly one row per active week and the final
    * count(*) IS the distinct-user count — no second distinct
    * aggregate over the joined stream.
    */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV $DayUs DIV 7").as("week"))
    val first = ev.groupBy("user_id").agg(min("week").as("cohort_week"))
    val active = ev.distinct()
    active.join(first, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** First-order transition matrix over each user's event sequence
    * (the Markov-chain view of behavior): one lag window partitioned
    * by user, then a bounded (|types|²) count aggregate — the window
    * shuffle is the corpus's one crossing, the aggregate output is
    * type-cardinality-sized at any scale.
    */
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev.withColumn("prev_type", lag("event_type", 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("prev_type", "next_type")
  }

  /** Last-touch conversion attribution: each purchase is credited to
    * the user's most recent STRICTLY PRECEDING non-purchase event
    * (the "touch"); purchases with no prior activity are `(direct)`.
    * One window partitioned by user carries the running last-touch
    * (an ignore-nulls `last` over the rows-preceding frame — no
    * self-join, no per-purchase probe), then a |types|-bounded
    * aggregate. The corpus crosses the shuffle exactly once.
    */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = (c: org.apache.spark.sql.Column) =>
      last(when(col("event_type") =!= "purchase", c), ignoreNulls = true).over(w)
    // both window columns in ONE projection → a single Window node
    // (one pass over each user's sorted buffer, not two)
    ev.select(col("*"), touch(col("event_type")).as("touch_type"),
        touch(col("ts_us")).as("touch_us"))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch_type"), lit("(direct)")).as("touch_type"))
      .agg(
        count(lit(1)).as("n_conversions"),
        dsum(col("value")).as("sum_value"),
        sum(col("ts_us") - col("touch_us")).as("sum_latency_us"))
      .orderBy("touch_type")
  }

  /** Daily spike detection, all-integer: a (type, day) is a spike
    * when its count exceeds 4/3 of the trailing 7-day baseline mean
    * — compared as `n·days·3 > events·4`, so no division and no
    * float threshold crosses an engine boundary. The RANGE window
    * (6 PRECEDING .. 1 PRECEDING — the baseline excludes the day
    * under test) runs over the (type × day) aggregate, a calendar-
    * bounded frame at any corpus size.
    */
  def spikeDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, -1)
    daily.select(
        col("event_type"), col("day"), col("n_events"),
        count(lit(1)).over(w).as("base_days"),
        coalesce(sum("n_events").over(w), lit(0L)).as("base_events"))
      .withColumn("is_spike",
        when(col("base_days") === 0, 0)
          .when(col("n_events") * col("base_days") * 3 > col("base_events") * 4, 1)
          .otherwise(0).cast("int"))
      .orderBy("event_type", "day")
  }

  /** Day-level volume anomalies per event type via MEDIAN ABSOLUTE
    * DEVIATION — the robust monitoring detector (mean/stddev get
    * dragged by the very outliers being hunted; the median does
    * not). Two exact DISCRETE medians (percentile_disc — elements OF
    * the integer daily counts, so every value crosses engines
    * exactly): the per-type median of daily counts, then the median
    * of |count − median|. A day flags when |count − median| > 3·MAD,
    * compared in pure integers (no division, no float threshold);
    * a MAD of 0 (over half the days identical) flags any deviating
    * day, the standard degenerate-MAD rule. The corpus reduces to
    * (type, day) counts in its ONE shuffle; the median/MAD
    * aggregates and join-backs run over |types|·|days| rows — a
    * calendar-bounded table at any corpus size, broadcast both ways.
    */
  def anomalyMad(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"),
        expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n_events"))
    val med = daily.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_events)")
        .cast("long").as("median_daily"))
    val dev = daily.join(broadcast(med), "event_type")
      .withColumn("abs_dev", abs(col("n_events") - col("median_daily")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev)")
        .cast("long").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .withColumn("is_anomaly",
        when(col("abs_dev") > col("mad") * 3, 1).otherwise(0).cast("int"))
      .select(col("event_type"), col("day"), col("n_events"),
        col("median_daily"), col("abs_dev"), col("mad"), col("is_anomaly"))
      .orderBy("event_type", "day")
  }

  /** DAU / WAU / stickiness — the product-analytics headline metrics:
    * daily active users, trailing-7-day weekly active users, and
    * their ratio. The (user, day) activity set is made DISTINCT
    * first (≤ one row per user-day — the corpus's dedup), each
    * activity row then contributes to the ≤7 window days it supports
    * (a bounded 7× explode, filtered to observed days by the join
    * with the daily table), and the WAU count is a distinct over
    * that bounded expansion. Stickiness is one IEEE division of
    * exact integers — engine-deterministic.
    */
  def dauWau(spark: SparkSession, dir: String): DataFrame = {
    val act = events(spark, dir)
      .select(col("user_id"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .distinct()
    val dau = act.groupBy("day").agg(count(lit(1)).as("n_dau"))
    val wau = act
      .select(col("user_id"),
        explode(sequence(col("day"), col("day") + 6)).as("day"))
      .distinct()
      .join(dau.select("day"), "day") // only observed days report
      .groupBy("day").agg(count(lit(1)).as("n_wau"))
    dau.join(wau, "day")
      .select(col("day"), col("n_dau"), col("n_wau"),
        (col("n_dau").cast("double") / col("n_wau").cast("double"))
          .as("stickiness"))
      .orderBy("day")
  }

  /** Top conversion paths — the 2-step event sequences immediately
    * preceding each purchase (sequence mining's bread-and-butter
    * "what funnels actually convert" view). One user-partitioned
    * window carries both lags (a single Window node), the aggregate
    * is ≤ (|types|+1)²-bounded, and the top-10 is deterministic
    * (count desc, then the path itself). `(start)` marks purchases
    * with fewer than two preceding events.
    */
  def pathConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    ev.select(col("event_type"),
        lag("event_type", 1).over(w).as("p1"),
        lag("event_type", 2).over(w).as("p2"))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("p2"), lit("(start)")).as("step1"),
        coalesce(col("p1"), lit("(start)")).as("step2"))
      .agg(count(lit(1)).as("n_conversions"))
      .orderBy(col("n_conversions").desc, col("step1"), col("step2"))
      .limit(10)
  }

  /** Cohort-relative RFM segmentation — recency / frequency /
    * monetary quartiles computed WITHIN each signup cohort (users who
    * arrived the same epoch-week), the form marketers actually use
    * ("is this user engaged *for their tenure*"). One per-user
    * aggregate, one broadcast corpus-horizon row, then three ntile
    * windows all sharing the cohort_week partitioning — at scale the
    * partition key is the calendar, so no global sort and no
    * single-partition window; every order carries user_id as the
    * total-order tie-break, so the quartile edges are deterministic
    * in any engine.
    */
  def userSegments(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("value"),
        expr(s"unix_micros(ts) DIV $DayUs").as("day"),
        expr(s"unix_micros(ts) DIV $DayUs DIV 7").as("week"))
    val horizon = ev.agg(max("day").as("horizon_day"))
    val users = ev.groupBy("user_id").agg(
      min("week").as("cohort_week"),
      max("day").as("last_day"),
      count(lit(1)).as("n_events"),
      dsum(col("value")).as("monetary"))
    def quart(order: Seq[org.apache.spark.sql.Column]) =
      ntile(4).over(Window.partitionBy("cohort_week").orderBy(order: _*))
        .cast("long")
    users.crossJoin(broadcast(horizon))
      .withColumn("recency_days", col("horizon_day") - col("last_day"))
      .withColumn("r_q", quart(Seq(col("recency_days").asc, col("user_id").asc)))
      .withColumn("f_q", quart(Seq(col("n_events").desc, col("user_id").asc)))
      .withColumn("m_q", quart(Seq(col("monetary").desc, col("user_id").asc)))
      .select(col("user_id"), col("cohort_week"), col("recency_days"),
        col("n_events"), col("monetary"),
        col("r_q"), col("f_q"), col("m_q"),
        (col("r_q") * 100 + col("f_q") * 10 + col("m_q")).as("segment"))
      .orderBy("user_id")
  }

  /** Event-type co-occurrence: for every unordered type pair, how
    * many users did BOTH (plus each side's own user count). The pair
    * expansion happens INSIDE a per-user set — collect_set bounds it
    * at |types|² per user (|types| is a domain constant), so the plan
    * is one (user) shuffle + a bounded explode + a |types|²-row
    * aggregate; per-type totals broadcast back onto the matrix. No
    * pairwise user join anywhere, at any corpus size.
    */
  def cooccurrence(spark: SparkSession, dir: String): DataFrame = {
    val ut = events(spark, dir).select("user_id", "event_type").distinct()
    val totals = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("users"))
    val pairs = ut.groupBy("user_id")
      .agg(collect_set(col("event_type")).as("ts"))
      .select(explode(col("ts")).as("type_a"), col("ts"))
      .select(col("type_a"), explode(col("ts")).as("type_b"))
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(count(lit(1)).as("users_both"))
    pairs
      .join(broadcast(totals.withColumnRenamed("users", "users_a")),
        col("type_a") === col("event_type")).drop("event_type")
      .join(broadcast(totals.withColumnRenamed("users", "users_b")),
        col("type_b") === col("event_type")).drop("event_type")
      .select("type_a", "type_b", "users_both", "users_a", "users_b")
      .orderBy("type_a", "type_b")
  }

  /** Hour-of-day × ISO-weekday activity profile per event type — the
    * seasonality heatmap behind capacity planning and anomaly
    * baselines. Buckets are PURE INTEGER arithmetic on epoch µs
    * (hour = µs DIV 3.6e9 mod 24; isodow from the epoch-day number,
    * 1970-01-01 being a Thursday — no engine calendar/timezone in
    * the loop), so edges cross engines exactly. ONE corpus scan and
    * ONE shuffle reduce the stream to ≤ |types|×7×24 rows; the
    * per-type total the share divides by is an unbounded-frame window
    * over that tiny aggregate (re-aggregating the corpus for totals
    * would scan it twice — plan-audited). */
  def hourlySeasonality(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val ev = events(spark, dir).select(col("event_type"), col("value"),
      expr(s"unix_micros(ts) DIV $HourUs % 24").as("hour_utc"),
      expr(s"(unix_micros(ts) DIV $DayUs + 3) % 7 + 1").as("isodow"))
    val hourly = ev.groupBy("event_type", "isodow", "hour_utc")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
    val total = sum(col("n_events")).over(Window.partitionBy("event_type"))
    hourly
      .select(col("event_type"), col("isodow"), col("hour_utc"),
        col("n_events"),
        (col("n_events").cast("double") / total.cast("double")).as("share"),
        col("sum_value"))
      .orderBy("event_type", "isodow", "hour_utc")
  }

  /** Per-type daily activity with a trailing 7-day rolling window.
    * The RANGE window runs over the (event_type × day) AGGREGATE —
    * a frame bounded by the calendar, not the corpus — and the
    * rolling sum accumulates the exact decimal partials (order-free),
    * casting to double only at the edge.
    */
  def rollingDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n_events"),
        sum(d2dec(col("value"), 4)).as("dval"))
    val w = Window.partitionBy("event_type").orderBy("day").rangeBetween(-6, 0)
    daily.select(
        col("event_type"), col("day"), col("n_events"),
        col("dval").cast("double").as("day_value"),
        sum("n_events").over(w).as("roll7_events"),
        sum("dval").over(w).cast("double").as("roll7_value"))
      .orderBy("event_type", "day")
  }

  /** Funnel CONVERSION LATENCY — how long each [[funnel]] stage
    * transition takes, the metric a growth team reads next to the
    * conversion counts: per fully-converted user the view→click,
    * click→purchase and end-to-end view→purchase gaps, aggregated to
    * one row per transition (converts, min / mean / max gap).
    *
    * Scale shape: the three per-user stage times are the [[funnel]]
    * machinery verbatim (event_type filter pushed to the scan, only
    * per-user µs timestamps shuffle — all three aggregates and both
    * gating joins share the user_id key, so AQE coalesces them onto
    * one partitioning); the transition explode is 3 rows per
    * converted user; the final aggregate reduces to exactly 3 rows.
    *
    * Determinism: gaps are integer µs differences; the mean is ONE
    * division of an exact decimal sum by an exact count (the §5
    * recipe) — no double accumulates across rows anywhere. */
  /** Seasonal-naïve FORECAST baseline + error report — the capacity
    * planner's sanity model (predict each (type, day) by the count 7
    * days earlier) and the floor every fancier forecaster must beat;
    * per type the day count, MAE, signed bias, and MAPE over days
    * where both actual and prediction exist.
    *
    * Scale shape: ONE corpus shuffle into the (type, day) daily
    * aggregate; the lag-7 join and the error aggregate run over the
    * calendar-bounded daily table (self-join on (type, day−7) —
    * never the corpus). Determinism: errors are integer
    * differences; MAE/bias are decimal sums of integers through one
    * division; each MAPE term is ONE exact double division of
    * integers quantized at 1e-6 before its decimal sum (a raw double
    * sum would be partition-order dependent). */
  def forecastBaseline(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n"))
    val pred = daily.select(col("event_type"),
      (col("day") + 7).as("day"), col("n").as("n_pred"))
    val err = (col("n") - col("n_pred")).cast("long")
    daily.join(pred, Seq("event_type", "day"))
      .select(col("event_type"), err.as("e"),
        abs(err).as("ae"),
        d2dec(round(abs(err).cast("double") / col("n").cast("double"), 6), 6)
          .as("ape"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_days"),
        round(sum(col("ae").cast(DecimalType(18, 0))).cast("double") /
          count(lit(1)), 4).as("mae"),
        round(sum(col("e").cast(DecimalType(18, 0))).cast("double") /
          count(lit(1)), 4).as("bias"),
        round(sum(col("ape")).cast("double") / count(lit(1)), 6).as("mape"))
      .orderBy("event_type")
  }

  /** Growth accounting — the weekly user LIFECYCLE states every
    * product-analytics stack reports (the "new / retained /
    * resurrected / churned" quad): per week, users active for the
    * first time (new), active in the immediately prior week
    * (retained), returning after a gap (resurrected), and users
    * active the PRIOR week who did not return this week (churned —
    * attributed to the week they went missing).
    *
    * Scale shape: the corpus reduces to DISTINCT (user, week) rows in
    * ONE map-combined shuffle; ONE user-partitioned window computes
    * both lag and lead over each user's weeks; each row then explodes
    * into its own week's state flags PLUS (when the user goes
    * missing) a churn flag on week+1 — so states and churn ride a
    * SINGLE calendar-bounded aggregate instead of two corpus passes
    * joined back together (the two-branch draft recomputed the
    * distinct + window per branch; caught in the plan audit). Weeks
    * are integer epoch-week indices (µs DIV day DIV 7 — the
    * cohort-retention convention, no engine calendar in the loop).
    * The activity filter (some user active that week) drops churn
    * attributed past the corpus's last active week — exactly the
    * observed-weeks join semantics, stated as a HAVING. All
    * integers. */
  def lifecycleStates(spark: SparkSession, dir: String): DataFrame = {
    val uw = events(spark, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV $DayUs DIV 7").as("week"))
      .distinct()
    val w = Window.partitionBy("user_id").orderBy("week")
    val zero = lit(0L)
    uw.withColumn("prev_week", lag("week", 1).over(w))
      .withColumn("next_week", lead("week", 1).over(w))
      .select(explode(array(
        struct(col("week"),
          when(col("prev_week").isNull, 1L).otherwise(0L).as("is_new"),
          when(col("prev_week") === col("week") - 1, 1L).otherwise(0L)
            .as("is_retained"),
          when(col("prev_week").isNotNull &&
            col("prev_week") < col("week") - 1, 1L).otherwise(0L)
            .as("is_resurrected"),
          zero.as("is_churned")),
        struct((col("week") + 1).as("week"), zero.as("is_new"),
          zero.as("is_retained"), zero.as("is_resurrected"),
          when(col("next_week").isNull || col("next_week") > col("week") + 1,
            1L).otherwise(0L).as("is_churned")))).as("x"))
      .select(col("x.*"))
      .groupBy("week")
      .agg(sum("is_new").as("n_new"),
        sum("is_retained").as("n_retained"),
        sum("is_resurrected").as("n_resurrected"),
        sum("is_churned").as("n_churned"))
      .filter(col("n_new") + col("n_retained") + col("n_resurrected") > 0)
      .orderBy("week")
  }

  /** Activity CONCENTRATION — how top-heavy is the user base (the
    * "1% of users generate X% of traffic" report; Gini's tabular
    * cousin): per-user event counts bucketed into activity QUARTILES
    * by exact discrete percentiles, each bucket's user count, event
    * volume, and share of all events.
    *
    * Scale shape: the q29 recipe applied to a USER aggregate — the
    * corpus reduces to per-user counts in ONE map-combined shuffle;
    * the quartile boundaries are exact `percentile_disc` over that
    * users-sized table reduced to ONE broadcast row (never a global
    * sort or a single-partition ntile window — the trap this
    * formulation exists to avoid); bucket assignment is a broadcast
    * comparison; the final aggregate is 4 rows. VALUE-based buckets:
    * count ties land in the same bucket in any engine (ntile's
    * arrival-order splits don't survive engines).
    *
    * Determinism: counts are integers, boundaries are elements OF
    * the data (percentile_disc), shares are one exact division. */
  def concentration(spark: SparkSession, dir: String): DataFrame = {
    val perUser = events(spark, dir)
      .groupBy("user_id").agg(count(lit(1)).as("n"))
    def pd(p: Double) =
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY n)")
    val bounds = perUser.agg(pd(0.25).as("q1"), pd(0.5).as("q2"),
      pd(0.75).as("q3"), sum(col("n")).as("total"))
    perUser.crossJoin(broadcast(bounds))
      .withColumn("quartile",
        when(col("n") <= col("q1"), 1L)
          .when(col("n") <= col("q2"), 2L)
          .when(col("n") <= col("q3"), 3L)
          .otherwise(4L))
      .groupBy("quartile")
      .agg(count(lit(1)).as("n_users"),
        sum(col("n")).as("n_events"),
        round(sum(col("n")).cast("double") /
          max(col("total")).cast("double"), 6).as("event_share"))
      .orderBy("quartile")
  }

  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    def stage(etype: String, prev: Option[(DataFrame, String)]): DataFrame = {
      val base = ev.filter(col("event_type") === etype)
      val gated = prev match {
        case Some((p, c)) => base.join(p, "user_id").where(col("ts_us") > col(c))
        case None         => base
      }
      gated.groupBy("user_id").agg(min("ts_us").as(s"t_$etype"))
    }
    val s1 = stage("view", None)
    val s2 = stage("click", Some((s1, "t_view")))
    val s3 = stage("purchase", Some((s2, "t_click")))
    s1.join(s2, "user_id").join(s3, "user_id")
      .select(explode(array(
        struct(lit("1_view_to_click").as("transition"),
          (col("t_click") - col("t_view")).as("gap_us")),
        struct(lit("2_click_to_purchase").as("transition"),
          (col("t_purchase") - col("t_click")).as("gap_us")),
        struct(lit("3_view_to_purchase").as("transition"),
          (col("t_purchase") - col("t_view")).as("gap_us")))).as("x"))
      .select(col("x.transition"), col("x.gap_us"))
      .groupBy("transition")
      .agg(count(lit(1)).as("n_converted"),
        min("gap_us").as("min_gap_us"),
        max("gap_us").as("max_gap_us"),
        round((sum(col("gap_us").cast(DecimalType(28, 0))).cast("double") /
          count(lit(1)) / 1000000.0), 6).as("mean_gap_s"))
      .orderBy("transition")
  }

  /** CUSUM changepoint detection over each type's daily volume — the
    * "when did behavior shift" question behind alerting and release
    * regression triage. The classic statistic is
    * C_t = Σ_{i≤t}(c_i − mean); to keep it ENGINE-EXACT it is scaled
    * by n (the day count): D_t = n·S_t − t·T where S_t is the integer
    * running sum and T the integer total — pure 64-bit integers, no
    * float mean to accumulate drift (T·n ≤ |days|·|events| ≪ 2^63).
    * The changepoint is the day maximizing |D_t| (tie → earliest
    * day); the reported stat normalizes to |D|/(n·T) ∈ [0,1).
    *
    * Scale shape: ONE corpus shuffle into the (type, day) daily
    * aggregate (map-combined); both windows (running sum, peak rank)
    * run over that |types|×|days|-bounded table on the SAME type
    * partitioning — nothing downstream is corpus-sized. */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(col("event_type"), expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("c"))
    val wRun = Window.partitionBy("event_type").orderBy("day")
    val scored = daily
      .withColumn("t", row_number().over(wRun).cast("long"))
      .withColumn("s_t", sum(col("c")).over(wRun))
      .withColumn("n_days", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("total", sum(col("c")).over(Window.partitionBy("event_type")))
      .withColumn("d_t", col("n_days") * col("s_t") - col("t") * col("total"))
    val wPeak = Window.partitionBy("event_type")
      .orderBy(abs(col("d_t")).desc, col("day").asc)
    scored.withColumn("rk", row_number().over(wPeak))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n_days"), col("total").as("n_events"),
        col("day").as("cp_day"), abs(col("d_t")).as("cusum_peak"),
        round(abs(col("d_t")).cast("double") /
          (col("n_days") * col("total")).cast("double"), 6).as("cusum_stat"))
      .orderBy("event_type")
  }

  /** Error-rate SLI with a trailing burn window — the SRE view over
    * the event stream: per day the error share of all events, plus
    * the 7-day rolling totals and rate (the slow-burn alert input).
    * ONE corpus shuffle to the daily aggregate (map-combined; errors
    * counted as a conditional agg, no second scan); the RANGE window
    * runs over the calendar-bounded daily table; rates are single
    * exact-integer divisions. */
  def errorRateSli(spark: SparkSession, dir: String): DataFrame = {
    val daily = events(spark, dir)
      .groupBy(expr(s"unix_micros(ts) DIV $DayUs").as("day"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
    val w = Window.orderBy("day").rangeBetween(-6, 0)
    daily.select(col("day"), col("n_total"), col("n_errors"),
        round(col("n_errors").cast("double") /
          col("n_total").cast("double"), 6).as("error_rate"),
        sum(col("n_total")).over(w).as("roll7_total"),
        sum(col("n_errors")).over(w).as("roll7_errors"))
      .withColumn("roll7_rate",
        round(col("roll7_errors").cast("double") /
          col("roll7_total").cast("double"), 6))
      .orderBy("day")
  }

  /** A/B experiment readout — per event type, the two-sample
    * comparison (arm = user_id parity, the deterministic stand-in
    * for an assignment table): arm means, difference, and the
    * two-sample z statistic z = (m_A − m_B)/√(v_A/n_A + v_B/n_B) —
    * the decision number an experimentation platform serves.
    *
    * ONE map-combined aggregate computes all six power sums
    * (FILTER-style conditional aggs; reduce side = |types|); counts
    * are exact, value sums and square sums route through DECIMAL
    * (order-free), and the mean/variance/z chain is fixed-order IEEE
    * over bit-identical doubles (the q42 regression recipe), rounded
    * only at the display edge. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"), (col("user_id") % 2 === 0).as("is_a"),
        col("value"))
    def arm(a: Boolean) = when(col("is_a") === a, col("value"))
    def cnt(a: Boolean) = count(arm(a)).cast("double")
    def s1(a: Boolean) = dsum(arm(a))
    def s2(a: Boolean) = graft.Tables.dsumProd(arm(a), arm(a))
    val agg = ev.groupBy("event_type").agg(
      cnt(true).as("na"), cnt(false).as("nb"),
      s1(true).as("sa"), s1(false).as("sb"),
      s2(true).as("sqa"), s2(false).as("sqb"))
    val ma = col("sa") / col("na"); val mb = col("sb") / col("nb")
    val va = (col("na") * col("sqa") - col("sa") * col("sa")) /
      (col("na") * col("na"))
    val vb = (col("nb") * col("sqb") - col("sb") * col("sb")) /
      (col("nb") * col("nb"))
    agg.select(col("event_type"),
        col("na").cast("long").as("n_a"), col("nb").cast("long").as("n_b"),
        round(ma, 6).as("mean_a"), round(mb, 6).as("mean_b"),
        round(ma - mb, 6).as("diff"),
        round((ma - mb) / sqrt(va / col("na") + vb / col("nb")), 6)
          .as("z_stat"))
      .orderBy("event_type")
  }

  /** RFM segmentation (round 11) — the classic
    * recency/frequency/monetary user quintiles, the segmentation
    * marketing analytics actually runs: per user, recency = whole
    * days from their last event to the corpus frontier (exact integer
    * \u00b5s division), frequency = event count, monetary = the exact
    * DECIMAL value sum scaled to an integer. ntile(5) per axis with a
    * user_id tie-break makes every quintile deterministic; the output
    * is the \u2264125-row segment grid. One shuffle keyed user_id; the
    * three ntile windows all re-sort the SAME user-bounded aggregate
    * (tiny), never the event stream. */
  def rfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val frontier = ev.groupBy().agg(max(unix_micros(col("ts"))).as("max_us"))
    val per = ev.groupBy("user_id")
      .agg(max(unix_micros(col("ts"))).as("last_us"),
        count(lit(1)).as("freq"),
        (sum(d2dec(col("value"), 4)) * 10000).cast("long")
          .as("m_scaled"))
      .crossJoin(broadcast(frontier))
      .select(col("user_id"), col("freq"), col("m_scaled"),
        expr("(max_us - last_us) DIV 86400000000").as("recency_days"))
    val seg = per.select(col("user_id"),
      ntile(5).over(Window.orderBy(col("recency_days"), col("user_id")))
        .cast("long").as("r"),
      ntile(5).over(Window.orderBy(col("freq").desc, col("user_id")))
        .cast("long").as("f"),
      ntile(5).over(Window.orderBy(col("m_scaled").desc, col("user_id")))
        .cast("long").as("m"))
    seg.groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("r", "f", "m")
  }

  /** Stickiness (round 11) — the DAU/MAU-style engagement ratio, per
    * ISO week: distinct (user, day) actives over distinct weekly
    * users, exact ppm integers (the corpus\u2019s calendar bounds the
    * reduce side). */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"),
        expr(s"unix_micros(ts) DIV $DayUs").as("day"),
        expr(s"(unix_micros(ts) DIV $DayUs) DIV 7").as("week"))
    ev.groupBy("week")
      .agg(count_distinct(col("user_id"), col("day")).as("user_days"),
        count_distinct(col("user_id")).as("weekly_users"),
        count_distinct(col("day")).as("days_in_week"))
      .select(col("week"), col("user_days"), col("weekly_users"),
        col("days_in_week"),
        expr("user_days * 1000000 DIV (weekly_users * days_in_week)")
          .as("stickiness_ppm"))
      .orderBy("week")
  }

  /** Event-value histogram (round 11) — exact-integer cent buckets of
    * the value distribution per event type (the payload profile
    * behind alert thresholds): value\u00d7100 rounds to the same long in
    * any engine, decile-of-range buckets stay integer. Reduce side =
    * types \u00d7 10. */
  def valueHistogram(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val bounds = ev.groupBy().agg(min("cents").as("lo"), max("cents").as("hi"))
    ev.crossJoin(broadcast(bounds))
      .select(col("event_type"),
        expr("LEAST(9L, ((cents - lo) * 10) DIV GREATEST(hi - lo + 1, 1))")
          .as("bucket"),
        col("cents"))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"), min("cents").as("min_cents"),
        max("cents").as("max_cents"))
      .orderBy("event_type", "bucket")
  }

  /** Sentinel key of [[mgSummary]]'s per-partition row-count rows —
    * outside any real key domain here (values are non-negative, and
    * [[mgSummary]] REFUSES a colliding input key rather than folding
    * it into the total; a corpus that legitimately needs the full
    * Long domain would use a struct tag instead). */
  private[graft] val MgCountKey = Long.MinValue

  /** One pass of Misra-Gries per partition over a LONG key column:
    * emits each partition's surviving candidate keys as (key, 0)
    * rows PLUS one (MgCountKey, partitionRowCount) row — the total
    * corpus count rides the same scan instead of costing a second
    * one (round-12 verdict: the old shape's separate `.count()` was
    * a third corpus read). Result is ≤ (k+1)·partitions rows,
    * eagerly checkpointed so the two consumers below don't re-run
    * the scan.
    *
    * mapPartitions is the legitimate seam: MG's decrement-all is
    * genuinely imperative per-partition state (the guideline's
    * "last resort" case), and the summary never leaves the task —
    * only candidate KEYS and one count long do. */
  private[graft] def mgSummary(keys: org.apache.spark.sql.Dataset[Long],
      k: Int): DataFrame = {
    import keys.sparkSession.implicits._
    keys.mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[Long, Long]
      var rows = 0L
      it.foreach { key =>
        // loud-fail guard (round-13 advice): a real key equal to the
        // sentinel (e.g. a non-ANSI cast of an extreme negative
        // double saturating to Long.MinValue) would be folded into
        // the corpus total downstream — corrupting the denominator
        // silently. Refuse it here instead.
        if (key == MgCountKey) throw new IllegalArgumentException(
          s"mgSummary key collides with the count sentinel $MgCountKey; " +
            "pre-filter or re-key the input")
        rows += 1L
        if (counters.contains(key)) counters(key) += 1L
        else if (counters.size < k) counters(key) = 1L
        else {
          // decrement-all; drop zeros — the MG overflow step
          val dead = scala.collection.mutable.ArrayBuffer.empty[Long]
          counters.keysIterator.foreach { c =>
            val v = counters(c) - 1L
            if (v == 0L) dead += c else counters(c) = v
          }
          dead.foreach(counters.remove)
        }
      }
      counters.keysIterator.map((_, 0L)).toArray.iterator ++
        Iterator((MgCountKey, rows))
    }.toDF("key", "rows").localCheckpoint(true)
  }

  /** Misra-Gries heavy hitters (round 12; re-keyed round 13) —
    * frequent-item detection with BOUNDED state, the streaming-
    * algorithms classic: a full groupBy over a 100-TB key column
    * shuffles every row; MG keeps k counters per partition
    * (decrement-all on overflow) and GUARANTEES every key with
    * global frequency > n/(k+1) survives in at least one partition's
    * summary (counts are additive, so a globally-heavy key is
    * locally heavy somewhere). The survivors — ≤ k × partitions
    * candidates — are exactly recounted with the filter pushed to
    * the scan, so the OUTPUT is exact (the oracle is a plain
    * GROUP BY ... HAVING) while the shuffle carries only candidate
    * rows and one count long per partition. TWO corpus scans total.
    *
    * The key is the whole-dollar value bucket (round(value) — the
    * "which price points dominate" question): ~300 distinct keys at
    * sf0.01 against k = 64 counters, so the eviction path RUNS AT
    * GATE SCALE in every partition (the round-12 gate keyed on the
    * 5-value event_type never overflowed its counters and
    * degenerated to a distinct-scan; the guarantee now carries real
    * weight at both SFs, and the planted k=3 spec still pins the
    * recall bound). θ = n/65 — the tightest threshold the k = 64
    * soundness guard admits, low enough that ~10 dollar buckets
    * qualify at every SF. */
  def heavyHitters(spark: SparkSession, dir: String,
      k: Int = 64, thresholdDen: Long = 65L): DataFrame = {
    // soundness of the exactness claim: MG guarantees recall only
    // above n/(k+1), so the output threshold n/thresholdDen must not
    // sit below it — thresholdDen > k+1 would silently drop keys in
    // (n/(k+1), n/thresholdDen] that MG evicted everywhere
    // (review catch: the spec's first draft ran k=3 with the default
    // 20 and passed only because its planted key was 40%)
    require(thresholdDen <= k + 1L,
      s"threshold n/$thresholdDen below the MG recall bound n/${k + 1}")
    import spark.implicits._
    // NULL values would NPE the Dataset[Long] deserializer (and the
    // oracle's GROUP BY would null-group them instead) — exclude them
    // explicitly; a NULL price is not a price point, and the gate
    // corpus has none. Sentinel-colliding keys fail loudly inside
    // mgSummary (round-13 advice).
    val keys = events(spark, dir)
      .filter(col("value").isNotNull)
      .select(expr("CAST(round(value) AS BIGINT)")).as[Long]
    val mg = mgSummary(keys, k)
    // bounded 1-row collect: the total is a scalar off the ≤
    // (k+1)·partitions checkpointed summary, not a corpus read.
    // coalesce: a zero-partition (empty) corpus emits NO sentinel
    // rows and sum() is null — the empty result must stay an empty
    // result, not an NPE (review catch)
    val total = mg.filter(col("key") === MgCountKey)
      .agg(coalesce(sum("rows"), lit(0L))).collect()(0).getLong(0)
    val candidates = mg.filter(col("key") =!= MgCountKey)
      .select(col("key").as("dollars")).distinct()
    // exact recount of the candidate set only (broadcast semi join —
    // the candidate set is ≤ k·partitions by construction)
    events(spark, dir)
      .select(expr("CAST(round(value) AS BIGINT)").as("dollars"))
      .join(broadcast(candidates), "dollars")
      .groupBy("dollars")
      .agg(count(lit(1)).as("n_events"))
      .filter(col("n_events") * thresholdDen > total)
      .select(col("dollars"), col("n_events"),
        expr(s"n_events * 1000000 DIV $total").as("share_ppm"))
      .orderBy("dollars")
  }

  /** The gate entry for [[heavyHitters]] (fixed corpus parameters). */
  def heavyHittersQuery(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(spark, dir)

  /** Second-order Markov transitions (round 12) — the path model
    * upgrade over [[transitionMatrix]]'s first order: given the last
    * TWO event types, where does the user go next? The standard test
    * for whether a journey needs memory (compare these conditionals
    * against the first-order row — if they differ, order matters).
    * Two lag windows over ONE user-keyed sort (same partitioning →
    * one exchange), trigram counts to a |types|³-bounded reduce,
    * conditional probability as exact ppm (trigram·10⁶ DIV bigram).
    */
  def markov2nd(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val tri = events(spark, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev1", lag("event_type", 1).over(w))
      .withColumn("prev2", lag("event_type", 2).over(w))
      .filter(col("prev2").isNotNull)
    tri.groupBy(col("prev2"), col("prev1"), col("event_type").as("next"))
      .agg(count(lit(1)).as("n_tri"))
      .withColumn("n_bi",
        sum("n_tri").over(Window.partitionBy("prev2", "prev1")))
      .select(col("prev2"), col("prev1"), col("next"), col("n_tri"),
        expr("n_tri * 1000000 DIV n_bi").as("p_ppm"))
      .orderBy("prev2", "prev1", "next")
  }

  /** Survival / hazard table (round 12) — the Kaplan-Meier-style
    * churn view product teams read retention risk from: per whole
    * DAY of account age t, how many users were still under
    * observation at age t (at-risk set), how many CHURNED at exactly
    * age t (their last event fell at age t and they had been silent
    * ≥ 7 days before the corpus end — the standard activity-censoring
    * rule), and the hazard as an exact ppm ratio. Users whose last
    * event is within 7 days of corpus end are CENSORED at their
    * observed age: they leave the at-risk set without counting as
    * deaths — dropping them instead would bias hazard upward, the
    * textbook K-M error.
    *
    * All-integer pipeline: per-user (first, last) µs aggregate →
    * whole-day ages by integer DIV → a ≤ |corpus days| per-age table
    * → at-risk via a REVERSE cumulative sum over that bounded table
    * (window over ≤ 366 rows, not over users) → hazard_ppm =
    * churned·10⁶ DIV at_risk. 100-TB shape: one user-keyed aggregate
    * (the sessionize shuffle), everything after is
    * calendar-bounded. */
  def survivalCurve(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
    val perUser = ev.groupBy("user_id")
      .agg(min("ts_us").as("first_us"), max("ts_us").as("last_us"))
    val obsEnd = ev.agg(max("ts_us").as("end_us"))
    val aged = perUser.crossJoin(broadcast(obsEnd))
      .select(
        // integer DIV, never float division + floor: µs spans are
        // ~10¹³ and a double quotient a hair under an integer
        // boundary flips the bucket
        expr(s"(last_us - first_us) DIV $DayUs").as("age_days"),
        (col("end_us") - col("last_us") < lit(7L) * DayUs).as("censored"))
    val perAge = aged.groupBy("age_days")
      .agg(count(lit(1)).as("n_ending"),
        sum(when(col("censored"), 0L).otherwise(1L)).as("n_churned"),
        sum(when(col("censored"), 1L).otherwise(0L)).as("n_censored"))
    // at-risk at age t = users whose observed age ≥ t: reverse cumsum
    // over the CALENDAR-BOUNDED per-age table (≤ 366 rows — the
    // single-partition window is over the aggregate, never the users)
    val w = Window.orderBy(col("age_days").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perAge
      .withColumn("at_risk", sum("n_ending").over(w))
      .select(col("age_days"), col("at_risk"), col("n_churned"),
        col("n_censored"),
        expr("n_churned * 1000000 DIV at_risk").as("hazard_ppm"))
      .orderBy("age_days")
  }

  /** Active-session concurrency by day (round 12) — the occupancy /
    * load view (how many sessions were OPEN on each calendar day):
    * sessions from the [[sessionize]] gap rule, swept with the
    * classic +1/−1 DELTA trick — a session contributes one +1 at its
    * start day and one −1 at the day AFTER its end day, the per-day
    * deltas aggregate map-side to a ≤ |corpus days| table, and a
    * running sum over that bounded table is the concurrent-session
    * count. NO interval explode (a session spanning months costs 2
    * rows, not |days| rows), no interval join — the sweep is why
    * this survives 100 TB: shuffle = the sessionize user shuffle +
    * a 2-rows-per-session delta aggregate; the final window runs
    * over ≤ 366 rows. */
  def activeSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sessions = ev
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > SessionGapUs, 1L).otherwise(0L))
      .withColumn("session_no", sum("new_s").over(run))
      .groupBy("user_id", "session_no")
      .agg(min("ts_us").as("s_us"), max("ts_us").as("e_us"))
      .select(col("user_id"), col("session_no"),
        expr(s"s_us DIV $DayUs").as("start_day"),
        expr(s"e_us DIV $DayUs").as("end_day"))
    val deltas = sessions.select(col("start_day").as("day"), lit(1L).as("d"),
        lit(1L).as("starts"))
      .unionAll(sessions.select((col("end_day") + 1).as("day"),
        lit(-1L).as("d"), lit(0L).as("starts")))
    val perDay = deltas.groupBy("day")
      .agg(sum("d").as("delta"), sum("starts").as("n_starts"))
    // DENSIFY to the full calendar before sweeping: a session
    // spanning days 0–5 puts deltas only at 0 and 6, but days 1–5
    // are open too and must be reported (self-review catch — the
    // synthetic corpus has deltas every day, so the gate alone never
    // saw a hole). The day range is calendar-bounded → the explode
    // is ≤ |corpus days| rows whatever the row count.
    val bounds = perDay.agg(min("day").as("lo"), max("day").as("hi"))
    val calendar = bounds.select(
      explode(sequence(col("lo"), col("hi"))).as("day"))
    val sweep = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    calendar.join(perDay, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("delta"), lit(0L)).as("delta"),
        coalesce(col("n_starts"), lit(0L)).as("n_starts"))
      .withColumn("open_sessions", sum("delta").over(sweep))
      // the day AFTER the last session ends carries the closing −1
      // and zero occupancy — drop pure-zero tail/gap days
      .filter(col("open_sessions") > 0 || col("n_starts") > 0)
      .select(col("day"), col("open_sessions"), col("n_starts"))
      .orderBy("day")
  }

  /** Sample-ratio-mismatch screen (round 14) — the health check run
    * BEFORE believing any A/B readout ([[abTest]] computes the
    * z-stats; THIS query asks whether the traffic split itself is
    * broken): per event type, observed arm event counts vs the
    * expectation from the GLOBAL user assignment (user_id % 2 — the
    * same arm rule abTest uses), the 1-df chi-square, and the SRM
    * verdict at the conventional α = 0.05 cut.
    *
    * Determinism: for two arms the chi-square collapses to
    * d²/(n·u_a·u_b) with d = n_a·U − n·u_a — ALL exact integers — so
    * the VERDICT is an exact DECIMAL/HUGEINT comparison
    * (d²·10⁶ > 3841459·n·u_a·u_b ⟺ χ² > 3.841459) and the reported
    * χ² is a pure scalar double chain over exact inputs. No float
    * ever decides anything.
    *
    * Scale shape: one distinct-user aggregate (broadcast — 2 longs)
    * plus one per-(type, arm) count shuffle; reduce = |types|.
    *
    * Exactness headroom (ADVICE round 14, the botRegularity moment
    * discipline): the verdict's LHS d²·10⁶ saturates DECIMAL(38,0)
    * at |d| ≈ 10¹⁶ and the RHS chain 3841459·n·u_a·u_b at
    * n·u_a·u_b ≈ 2.6×10³¹ — under non-ANSI Spark either overflow
    * silently NULLs the verdict while the oracle's HUGEINT errors
    * loudly. Both are guarded below: an out-of-headroom corpus
    * raise_errors instead of emitting NULL verdicts (|d| < 10¹⁵ and
    * n·u_a·u_b < 10³¹ keep a 10× safety margin; |d| ≤ n·U means any
    * corpus under ~10⁷ events × 10⁸ users sits far inside). */
  def abSrm(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"), col("user_id"),
        (col("user_id") % 2 === 0).as("is_a"))
    val users = ev.select(col("user_id"), col("is_a")).distinct()
      .agg(count(when(col("is_a"), 1)).as("ua"),
        count(when(!col("is_a"), 1)).as("ub"))
    ev.groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("is_a"), 1)).as("n_a"),
        count(when(!col("is_a"), 1)).as("n_b"))
      .crossJoin(broadcast(users))
      .withColumn("d", expr(
        "CAST(n_a AS DECIMAL(19,0)) * (ua + ub) - CAST(n_events AS DECIMAL(19,0)) * ua"))
      .select(col("event_type"), col("n_events"), col("n_a"), col("n_b"),
        round(col("n_events").cast("double") * col("ua") / (col("ua") + col("ub")), 6)
          .as("expected_a"),
        round((col("d") * col("d")).cast("double") /
          (col("n_events").cast("double") * col("ua") * col("ub")), 6)
          .as("chi2"),
        when(abs(col("d")) < 1e15 &&
            col("n_events").cast("double") * col("ua") * col("ub") < 1e31,
          col("d") * col("d") * 1000000L >
            expr("CAST(3841459 AS DECIMAL(19,0)) * n_events") * col("ua") * col("ub"))
          .otherwise(raise_error(lit(
            "abSrm: corpus exceeds exact-decimal headroom " +
              "(|d| >= 1e15 or n*ua*ub >= 1e31) — verdict would NULL")))
          .as("srm"))
      .orderBy("event_type")
  }

  /** Bot-regularity screen (round 14) — the inter-event-gap
    * REGULARITY test abuse teams run before trusting traffic: humans
    * are bursty (coefficient of variation of their gaps ≳ 1), pollers
    * and scripts are metronomic (CV ≪ 1). Per user: gap count, mean
    * gap, CV, and the verdict.
    *
    * Determinism: everything reduces to EXACT integer/decimal sums —
    * Σg fits a long (≤ corpus span per user), Σg² routes through
    * DECIMAL(38,0) (a 30-day µs gap squares to ~7e24), and
    * varN = n·Σg² − (Σg)² stays in the exact decimal domain. The
    * verdict never touches a float: CV < 0.5 ⟺ 4·varN < (Σg)²,
    * compared exactly (oracle: HUGEINT). The reported `cv` is a pure
    * SCALAR double chain over those exact inputs (cast → sqrt →
    * divide, each IEEE-correctly-rounded, no sum reordering) —
    * bit-identical cross-engine before the display rounding.
    *
    * Scale shape: one user-keyed exchange (lag window), then a
    * map-side-combining aggregate on the SAME key — no second
    * shuffle; output is |users|, the terminal sort its only wide op.
    * min-gap floor: users need ≥ 20 gaps before the verdict can say
    * bot (small-n CV is noise), reported as NULL-free `false`.
    *
    * Per-user ceiling (ADVICE round 14 — the sum_g2 bound above
    * covers one term; the PRODUCT does not follow from it):
    * var_n = n·Σg² − (Σg)² is exact only while n·Σg² < 10³⁸, i.e.
    * n²·ḡ² < 10³⁸ — at the worst-case ~30-day mean gap
    * (ḡ ≈ 2.6×10¹² µs) a single user may hold ~4×10⁶ gaps before
    * the decimal domain saturates (tighter-cadence users
    * proportionally more: ~4×10⁹ at 30-s gaps). Past it Spark
    * silently NULLs cv/is_bot while the oracle's HUGEINT
    * (max ~1.7×10³⁸) errors loudly — no realistic event corpus
    * approaches the bound (10⁶ gaps/user at 30-day spacing is an
    * 80,000-year history), so this is documented, not guarded. */
  def botRegularity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val gaps = events(spark, dir)
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag("ts_us", 1).over(w))
      .filter(col("prev_us").isNotNull)
      .withColumn("gap_us", col("ts_us") - col("prev_us"))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
        sum("gap_us").as("sum_g"),
        sum(col("gap_us").cast(DecimalType(19, 0)) *
          col("gap_us").cast(DecimalType(19, 0))).as("sum_g2"))
      .select(col("user_id"), col("n_gaps"),
        expr("sum_g DIV n_gaps").as("mean_gap_us"),
        expr("CAST(n_gaps AS DECIMAL(19,0)) * sum_g2" +
          " - CAST(sum_g AS DECIMAL(19,0)) * CAST(sum_g AS DECIMAL(19,0))")
          .as("var_n"),
        col("sum_g"))
      .select(col("user_id"), col("n_gaps"), col("mean_gap_us"),
        // sum_g = 0 (all events in the same microsecond) has no
        // defined CV: emit NULL like the oracle's 0/0 — Spark's
        // double division would yield NaN and break parity (review
        // catch; no gate user degenerates, but the contract holds)
        when(col("sum_g") === 0L, lit(null))
          .otherwise(round(sqrt(col("var_n").cast("double")) /
            col("sum_g").cast("double"), 6)).as("cv"),
        (col("n_gaps") >= 20 &&
          col("var_n") * 4 < expr("CAST(sum_g AS DECIMAL(19,0))" +
            " * CAST(sum_g AS DECIMAL(19,0))")).as("is_bot"))
      .orderBy("user_id")
  }

}
