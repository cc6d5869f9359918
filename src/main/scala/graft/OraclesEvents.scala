package graft

/** DuckDB oracle SQL for the §2h event-analytics suite — independent
  * reformulations (window/CTE SQL) of the Spark plans, sharing only
  * the integer-µs time arithmetic the parity rules require.
  */
object OraclesEvents {

  val events: Map[String, String] = Map(
    // gaps are integer µs and the percentiles DISCRETE (an element OF
    // the data — quantile_disc shares Spark's percentile_disc
    // definition), so every column is exact cross-engine
    "events_inter_event_gaps" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |              epoch_us(ts) AS ts_us FROM events),
        |g AS (SELECT event_type,
        |        ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id) AS gap_us
        |      FROM ev)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  MIN(gap_us) AS min_gap_us,
        |  quantile_disc(gap_us, 0.5) AS median_gap_us,
        |  quantile_disc(gap_us, 0.9) AS p90_gap_us,
        |  MAX(gap_us) AS max_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_sessionize" ->
      """WITH ev AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
        |            FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |               OR ts_us - lag(ts_us) OVER w > 86400000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM ev
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_no
        |      FROM f)
        |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
        |  MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY 1, 2
        |ORDER BY user_id, session_no""".stripMargin,

    "events_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t2
        |       FROM ev e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts_us > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t3
        |       FROM ev e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2 GROUP BY 1)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users,
        |       MIN(t1) AS first_entry_us, MAX(t1) AS last_entry_us FROM s1
        |UNION ALL
        |SELECT '2_click', COUNT(*), MIN(t2), MAX(t2) FROM s2
        |UNION ALL
        |SELECT '3_purchase', COUNT(*), MIN(t3), MAX(t3) FROM s3
        |ORDER BY stage""".stripMargin,

    "events_cohort_retention" ->
      """WITH ev AS (SELECT user_id,
        |              epoch_us(ts) // 86400000000 // 7 AS week FROM events),
        |first AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1),
        |active AS (SELECT DISTINCT user_id, week FROM ev)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |       COUNT(*) AS n_users
        |FROM active JOIN first USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,

    "events_transition_matrix" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT event_type AS next_type,
        |        lag(event_type) OVER (PARTITION BY user_id
        |          ORDER BY ts_us, event_id) AS prev_type
        |      FROM ev)
        |SELECT prev_type, next_type, COUNT(*) AS n_transitions
        |FROM l WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2
        |ORDER BY prev_type, next_type""".stripMargin,

    "events_attribution" ->
      """WITH ev AS (SELECT user_id, event_id, event_type, value,
        |              epoch_us(ts) AS ts_us FROM events),
        |a AS (SELECT *,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
        |             IGNORE NULLS) OVER w AS touch_type,
        |  last_value(CASE WHEN event_type <> 'purchase' THEN ts_us END
        |             IGNORE NULLS) OVER w AS touch_us
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT COALESCE(touch_type, '(direct)') AS touch_type,
        |  COUNT(*) AS n_conversions,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(SUM(ts_us - touch_us) AS BIGINT) AS sum_latency_us
        |FROM a WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY touch_type""".stripMargin,

    "events_anomaly_mad" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_events)
        |       AS BIGINT) AS median_daily
        |  FROM daily GROUP BY 1),
        |dev AS (SELECT d.event_type, d.day, d.n_events, m.median_daily,
        |  ABS(d.n_events - m.median_daily) AS abs_dev
        |  FROM daily d JOIN med m USING (event_type)),
        |mad AS (SELECT event_type,
        |  CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY abs_dev)
        |       AS BIGINT) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.event_type, dev.day, dev.n_events, dev.median_daily,
        |  dev.abs_dev, mad.mad,
        |  CASE WHEN dev.abs_dev > mad.mad * 3 THEN 1 ELSE 0 END AS is_anomaly
        |FROM dev JOIN mad USING (event_type)
        |ORDER BY dev.event_type, dev.day""".stripMargin,

    "events_spike_days" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT *,
        |  COUNT(*) OVER win AS base_days,
        |  COALESCE(SUM(n_events) OVER win, 0) AS base_events
        |  FROM daily
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 RANGE BETWEEN 6 PRECEDING AND 1 PRECEDING))
        |SELECT event_type, day, n_events,
        |  CAST(base_days AS BIGINT) AS base_days,
        |  CAST(base_events AS BIGINT) AS base_events,
        |  CASE WHEN base_days = 0 THEN 0
        |       WHEN n_events * base_days * 3 > base_events * 4 THEN 1
        |       ELSE 0 END AS is_spike
        |FROM w ORDER BY event_type, day""".stripMargin,

    "events_dau_wau" ->
      """WITH act AS (SELECT DISTINCT user_id,
        |               epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, COUNT(*) AS n_dau FROM act GROUP BY 1),
        |ex AS (SELECT DISTINCT a.user_id, d.day
        |       FROM act a JOIN dau d ON d.day BETWEEN a.day AND a.day + 6),
        |wau AS (SELECT day, COUNT(*) AS n_wau FROM ex GROUP BY 1)
        |SELECT day, n_dau, n_wau,
        |  CAST(n_dau AS DOUBLE) / CAST(n_wau AS DOUBLE) AS stickiness
        |FROM dau JOIN wau USING (day) ORDER BY day""".stripMargin,

    "events_path_conversion" ->
      """WITH ev AS (SELECT user_id, event_id, event_type,
        |              epoch_us(ts) AS ts_us FROM events),
        |l AS (SELECT event_type,
        |        lag(event_type, 1) OVER w AS p1,
        |        lag(event_type, 2) OVER w AS p2
        |      FROM ev
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |p AS (SELECT COALESCE(p2, '(start)') AS step1,
        |             COALESCE(p1, '(start)') AS step2
        |      FROM l WHERE event_type = 'purchase')
        |SELECT step1, step2, COUNT(*) AS n_conversions
        |FROM p GROUP BY 1, 2
        |ORDER BY n_conversions DESC, step1, step2 LIMIT 10""".stripMargin,

    "events_user_segments" ->
      """WITH ev AS (SELECT user_id, value,
        |              epoch_us(ts) // 86400000000 AS day,
        |              epoch_us(ts) // 86400000000 // 7 AS week FROM events),
        |h AS (SELECT MAX(day) AS horizon_day FROM ev),
        |u AS (SELECT user_id, MIN(week) AS cohort_week, MAX(day) AS last_day,
        |        COUNT(*) AS n_events,
        |        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS monetary
        |      FROM ev GROUP BY 1),
        |q AS (SELECT u.*,
        |        (SELECT horizon_day FROM h) - last_day AS recency_days FROM u),
        |s AS (SELECT user_id, cohort_week, recency_days, n_events, monetary,
        |  CAST(NTILE(4) OVER (PARTITION BY cohort_week
        |    ORDER BY recency_days, user_id) AS BIGINT) AS r_q,
        |  CAST(NTILE(4) OVER (PARTITION BY cohort_week
        |    ORDER BY n_events DESC, user_id) AS BIGINT) AS f_q,
        |  CAST(NTILE(4) OVER (PARTITION BY cohort_week
        |    ORDER BY monetary DESC, user_id) AS BIGINT) AS m_q
        |  FROM q)
        |SELECT *, r_q * 100 + f_q * 10 + m_q AS segment
        |FROM s ORDER BY user_id""".stripMargin,

    "events_rolling_daily" ->
      """WITH daily AS (
        |  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n_events,
        |    SUM(CAST(value AS DECIMAL(18,4))) AS dval
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day, n_events,
        |  CAST(dval AS DOUBLE) AS day_value,
        |  CAST(SUM(n_events) OVER w AS BIGINT) AS roll7_events,
        |  CAST(SUM(dval) OVER w AS DOUBLE) AS roll7_value
        |FROM daily
        |WINDOW w AS (PARTITION BY event_type ORDER BY day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY event_type, day""".stripMargin,

    "events_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |tot AS (SELECT event_type, COUNT(*) AS users FROM ut GROUP BY 1)
        |SELECT a.event_type AS type_a, b.event_type AS type_b,
        |  COUNT(*) AS users_both, ta.users AS users_a, tb.users AS users_b
        |FROM ut a
        |JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        |JOIN tot ta ON ta.event_type = a.event_type
        |JOIN tot tb ON tb.event_type = b.event_type
        |GROUP BY 1, 2, 4, 5
        |ORDER BY type_a, type_b""".stripMargin,

    "events_hourly_seasonality" ->
      """SELECT event_type, isodow, hour_utc, n_events,
        |  CAST(n_events AS DOUBLE) / CAST(total AS DOUBLE) AS share,
        |  sum_value
        |FROM (
        |  SELECT event_type,
        |    (epoch_us(ts) // 86400000000 + 3) % 7 + 1 AS isodow,
        |    epoch_us(ts) // 3600000000 % 24 AS hour_utc,
        |    COUNT(*) AS n_events,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |  FROM events GROUP BY 1, 2, 3) h
        |JOIN (SELECT event_type, COUNT(*) AS total
        |      FROM events GROUP BY 1) t USING (event_type)
        |ORDER BY event_type, isodow, hour_utc""".stripMargin,

    // the events_funnel stage CTEs verbatim; the latency measure
    // aggregates integer µs gaps over fully-converted users, mean via
    // one exact decimal-sum division (§5)
    "events_funnel_latency" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts_us) AS t2
        |       FROM ev e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts_us > s1.t1 GROUP BY 1),
        |s3 AS (SELECT e.user_id, MIN(e.ts_us) AS t3
        |       FROM ev e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2 GROUP BY 1),
        |conv AS (SELECT s1.user_id, t1, t2, t3
        |         FROM s1 JOIN s2 USING (user_id) JOIN s3 USING (user_id)),
        |g AS (
        |  SELECT '1_view_to_click' AS transition, t2 - t1 AS gap_us FROM conv
        |  UNION ALL
        |  SELECT '2_click_to_purchase', t3 - t2 FROM conv
        |  UNION ALL
        |  SELECT '3_view_to_purchase', t3 - t1 FROM conv)
        |SELECT transition, COUNT(*) AS n_converted,
        |  MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
        |  round(CAST(SUM(CAST(gap_us AS DECIMAL(28,0))) AS DOUBLE)
        |    / COUNT(*) / CAST(1000000 AS DOUBLE), 6) AS mean_gap_s
        |FROM g GROUP BY 1 ORDER BY transition""".stripMargin,

    // the q29 recipe over the user aggregate: exact discrete quartile
    // boundaries broadcast back, VALUE-based buckets (count ties land
    // together in any engine), shares one exact division
    "events_concentration" ->
      """WITH pu AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1),
        |b AS (SELECT
        |    percentile_disc(0.25) WITHIN GROUP (ORDER BY n) AS q1,
        |    percentile_disc(0.5) WITHIN GROUP (ORDER BY n) AS q2,
        |    percentile_disc(0.75) WITHIN GROUP (ORDER BY n) AS q3,
        |    CAST(SUM(n) AS BIGINT) AS total FROM pu)
        |SELECT CAST(CASE WHEN n <= q1 THEN 1 WHEN n <= q2 THEN 2
        |    WHEN n <= q3 THEN 3 ELSE 4 END AS BIGINT) AS quartile,
        |  COUNT(*) AS n_users, CAST(SUM(n) AS BIGINT) AS n_events,
        |  round(CAST(SUM(n) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 6)
        |    AS event_share
        |FROM pu, b GROUP BY 1 ORDER BY quartile""".stripMargin,

    // growth accounting on integer epoch-weeks (the cohort-retention
    // convention); churn lands on week+1 and joins back onto
    // OBSERVED activity weeks in both engines
    "events_lifecycle_states" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 // 7 AS week FROM events),
        |m AS (SELECT user_id, week,
        |    LAG(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
        |    LEAD(week) OVER (PARTITION BY user_id ORDER BY week) AS next_week
        |  FROM uw),
        |s AS (SELECT week,
        |    COUNT(*) FILTER (WHERE prev_week IS NULL) AS n_new,
        |    COUNT(*) FILTER (WHERE prev_week = week - 1) AS n_retained,
        |    COUNT(*) FILTER (WHERE prev_week IS NOT NULL
        |      AND prev_week < week - 1) AS n_resurrected
        |  FROM m GROUP BY 1),
        |c AS (SELECT week + 1 AS week, COUNT(*) AS n_churned FROM m
        |      WHERE next_week IS NULL OR next_week > week + 1 GROUP BY 1)
        |SELECT s.week, n_new, n_retained, n_resurrected,
        |  COALESCE(c.n_churned, 0) AS n_churned
        |FROM s LEFT JOIN c ON s.week = c.week ORDER BY s.week""".stripMargin,

    // seasonal-naive: predict (type, day) by (type, day-7); errors
    // are integer diffs, MAE/bias via decimal sums, MAPE terms
    // quantized at 1e-6 before their decimal sum
    // deterministic quintiles: every ntile ordering carries a
    // user_id tie-break; monetary is the exact DECIMAL sum scaled
    "events_rfm_segments" ->
      """WITH per AS (SELECT user_id, MAX(epoch_us(ts)) AS last_us,
        |    COUNT(*) AS freq,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) * 10000 AS BIGINT) AS m_scaled
        |  FROM events GROUP BY 1),
        |fr AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
        |r AS (SELECT user_id, freq, m_scaled,
        |    (max_us - last_us) // 86400000000 AS recency_days FROM per, fr),
        |seg AS (SELECT user_id,
        |    ntile(5) OVER (ORDER BY recency_days, user_id) AS r,
        |    ntile(5) OVER (ORDER BY freq DESC, user_id) AS f,
        |    ntile(5) OVER (ORDER BY m_scaled DESC, user_id) AS m
        |  FROM r)
        |SELECT CAST(r AS BIGINT) AS r, CAST(f AS BIGINT) AS f,
        |  CAST(m AS BIGINT) AS m, COUNT(*) AS n_users
        |FROM seg GROUP BY 1, 2, 3 ORDER BY r, f, m""".stripMargin,

    "events_stickiness" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    (epoch_us(ts) // 86400000000) // 7 AS week FROM events)
        |SELECT week, COUNT(DISTINCT (user_id, day)) AS user_days,
        |  COUNT(DISTINCT user_id) AS weekly_users,
        |  COUNT(DISTINCT day) AS days_in_week,
        |  COUNT(DISTINCT (user_id, day)) * 1000000
        |    // (COUNT(DISTINCT user_id) * COUNT(DISTINCT day)) AS stickiness_ppm
        |FROM e GROUP BY 1 ORDER BY week""".stripMargin,

    // exact-integer cent buckets; (cents−lo) ≥ 0 so // ≡ Spark's DIV
    "events_value_histogram" ->
      """WITH e AS (SELECT event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |b AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM e)
        |SELECT event_type,
        |  LEAST(9, ((cents - lo) * 10) // GREATEST(hi - lo + 1, 1)) AS bucket,
        |  COUNT(*) AS n, MIN(cents) AS min_cents, MAX(cents) AS max_cents
        |FROM e, b GROUP BY 1, 2 ORDER BY event_type, bucket""".stripMargin,

    "events_forecast_baseline" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.n - p.n AS e, abs(a.n - p.n) AS ae,
        |    CAST(round(CAST(abs(a.n - p.n) AS DOUBLE) / CAST(a.n AS DOUBLE), 6)
        |      AS DECIMAL(18,6)) AS ape
        |  FROM daily a JOIN daily p
        |    ON p.event_type = a.event_type AND p.day = a.day - 7)
        |SELECT event_type, COUNT(*) AS n_days,
        |  round(CAST(SUM(CAST(ae AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 4)
        |    AS mae,
        |  round(CAST(SUM(CAST(e AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 4)
        |    AS bias,
        |  round(CAST(SUM(ape) AS DOUBLE) / COUNT(*), 6) AS mape
        |FROM j GROUP BY 1 ORDER BY event_type""".stripMargin,

    "events_error_rate_sli" ->
      """WITH daily AS (SELECT epoch_us(ts) // 86400000000 AS day,
        |    COUNT(*) AS n_total,
        |    COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_errors
        |  FROM events GROUP BY 1)
        |SELECT day, n_total, n_errors,
        |  round(CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE), 6)
        |    AS error_rate,
        |  CAST(SUM(n_total) OVER w AS BIGINT) AS roll7_total,
        |  CAST(SUM(n_errors) OVER w AS BIGINT) AS roll7_errors,
        |  round(CAST(SUM(n_errors) OVER w AS DOUBLE)
        |    / CAST(SUM(n_total) OVER w AS DOUBLE), 6) AS roll7_rate
        |FROM daily
        |WINDOW w AS (ORDER BY day RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY day""".stripMargin,

    // n-scaled CUSUM: D_t = n·S_t − t·T stays in exact integers (no
    // float mean accumulates); peak day ties break earliest
    "events_changepoint" ->
      """WITH daily AS (SELECT event_type,
        |    epoch_us(ts) // 86400000000 AS day, COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |sc AS (SELECT event_type, day, c,
        |    CAST(ROW_NUMBER() OVER w AS BIGINT) AS t,
        |    SUM(c) OVER w AS s_t,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n_days,
        |    SUM(c) OVER (PARTITION BY event_type) AS total
        |  FROM daily
        |  WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |d AS (SELECT *, n_days * s_t - t * total AS d_t FROM sc),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
        |    ORDER BY abs(d_t) DESC, day ASC) AS rk FROM d)
        |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
        |  CAST(total AS BIGINT) AS n_events, day AS cp_day,
        |  CAST(abs(d_t) AS BIGINT) AS cusum_peak,
        |  round(CAST(abs(d_t) AS DOUBLE) / CAST(n_days * total AS DOUBLE), 6)
        |    AS cusum_stat
        |FROM r WHERE rk = 1 ORDER BY event_type""".stripMargin,

    // the z chain mirrors the engine token for token over named
    // double intermediates; square sums at DECIMAL(19,6) (DuckDB's
    // 18-digit multiply overflows, the q42 lesson)
    "events_ab_test" ->
      """WITH s AS (SELECT event_type,
        |    CAST(COUNT(value) FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS na,
        |    CAST(COUNT(value) FILTER (WHERE user_id % 2 <> 0) AS DOUBLE) AS nb,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE user_id % 2 = 0) AS DOUBLE) AS sa,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4))) FILTER (WHERE user_id % 2 <> 0) AS DOUBLE) AS sb,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6)))
        |      FILTER (WHERE user_id % 2 = 0) AS DECIMAL(28,6)) AS DOUBLE) AS sqa,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6)))
        |      FILTER (WHERE user_id % 2 <> 0) AS DECIMAL(28,6)) AS DOUBLE) AS sqb
        |  FROM events GROUP BY 1),
        |m AS (SELECT event_type, na, nb, sa / na AS ma, sb / nb AS mb,
        |    (na * sqa - sa * sa) / (na * na) AS va,
        |    (nb * sqb - sb * sb) / (nb * nb) AS vb
        |  FROM s)
        |SELECT event_type, CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  round(ma, 6) AS mean_a, round(mb, 6) AS mean_b,
        |  round(ma - mb, 6) AS diff,
        |  round((ma - mb) / sqrt(va / na + vb / nb), 6) AS z_stat
        |FROM m ORDER BY event_type""".stripMargin,

    // the MG candidate tier is plan-internal (recall-complete above
    // n/(k+1) ⇒ exact output); the oracle is the direct GROUP BY
    // exactness contract of the MG pass: candidates ⊇ every key above
    // n/65 (recall bound n/(k+1) = n/65), recount is exact, so the
    // output equals this plain GROUP BY ... HAVING
    "events_heavy_hitters" ->
      """WITH t AS (SELECT COUNT(*) AS total FROM events)
        |SELECT CAST(round(value) AS BIGINT) AS dollars, COUNT(*) AS n_events,
        |  COUNT(*) * 1000000 // MAX(total) AS share_ppm
        |FROM events CROSS JOIN t
        |GROUP BY 1, t.total
        |HAVING COUNT(*) * 65 > t.total
        |ORDER BY dollars""".stripMargin,

    // two lags over one user-keyed order; conditional ppm is exact
    // integer arithmetic on trigram/bigram counts
    "events_markov_2nd" ->
      """WITH ev AS (SELECT user_id, event_type, event_id,
        |    epoch_us(ts) AS ts_us FROM events),
        |t AS (SELECT event_type AS next,
        |    lag(event_type, 1) OVER w AS prev1,
        |    lag(event_type, 2) OVER w AS prev2
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |c AS (SELECT prev2, prev1, next, COUNT(*) AS n_tri
        |  FROM t WHERE prev2 IS NOT NULL GROUP BY 1, 2, 3)
        |SELECT prev2, prev1, next, CAST(n_tri AS BIGINT) AS n_tri,
        |  CAST(n_tri * 1000000 // SUM(n_tri) OVER (PARTITION BY prev2, prev1)
        |    AS BIGINT) AS p_ppm
        |FROM c ORDER BY prev2, prev1, next""".stripMargin,

    // Kaplan-Meier-style hazard table: whole-day ages by integer
    // floor-division (both engines), activity-censoring at 7 days,
    // at-risk = reverse cumsum over the calendar-bounded age table
    "events_survival_curve" ->
      """WITH u AS (SELECT user_id, MIN(epoch_us(ts)) AS first_us,
        |    MAX(epoch_us(ts)) AS last_us FROM events GROUP BY user_id),
        |b AS (SELECT MAX(epoch_us(ts)) AS end_us FROM events),
        |a AS (SELECT (last_us - first_us) // 86400000000 AS age_days,
        |    (end_us - last_us < 7 * 86400000000) AS censored
        |  FROM u CROSS JOIN b),
        |p AS (SELECT age_days, COUNT(*) AS n_ending,
        |    SUM(CASE WHEN censored THEN 0 ELSE 1 END) AS n_churned,
        |    SUM(CASE WHEN censored THEN 1 ELSE 0 END) AS n_censored
        |  FROM a GROUP BY age_days),
        |r AS (SELECT age_days,
        |    CAST(SUM(n_ending) OVER (ORDER BY age_days DESC
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS at_risk,
        |    CAST(n_churned AS BIGINT) AS n_churned,
        |    CAST(n_censored AS BIGINT) AS n_censored
        |  FROM p)
        |SELECT age_days, at_risk, n_churned, n_censored,
        |  n_churned * 1000000 // at_risk AS hazard_ppm
        |FROM r ORDER BY age_days""".stripMargin,

    // sweep-line concurrency: sessionize CTE + (+1 at start day, −1
    // the day after end day) deltas, running sum over the bounded
    // per-day table — no interval explode on either engine
    "events_active_sessions" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |            FROM events),
        |f AS (SELECT *,
        |        CASE WHEN lag(ts_us) OVER w IS NULL
        |               OR ts_us - lag(ts_us) OVER w > 86400000000
        |             THEN 1 ELSE 0 END AS new_s
        |      FROM ev
        |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS session_no
        |      FROM f),
        |g AS (SELECT user_id, session_no,
        |        MIN(ts_us) // 86400000000 AS start_day,
        |        MAX(ts_us) // 86400000000 AS end_day
        |      FROM s GROUP BY 1, 2),
        |d AS (SELECT start_day AS day, 1 AS delta, 1 AS starts FROM g
        |      UNION ALL
        |      SELECT end_day + 1 AS day, -1 AS delta, 0 AS starts FROM g),
        |pd AS (SELECT day, SUM(delta) AS delta, SUM(starts) AS n_starts
        |       FROM d GROUP BY day),
        |-- densify to the full calendar: open days BETWEEN deltas
        |-- must be reported too
        |cal AS (SELECT UNNEST(generate_series((SELECT MIN(day) FROM pd),
        |                                      (SELECT MAX(day) FROM pd))) AS day),
        |dense AS (SELECT cal.day, COALESCE(pd.delta, 0) AS delta,
        |    COALESCE(pd.n_starts, 0) AS n_starts
        |  FROM cal LEFT JOIN pd ON cal.day = pd.day)
        |SELECT day,
        |  CAST(SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS open_sessions,
        |  CAST(n_starts AS BIGINT) AS n_starts
        |FROM dense
        |QUALIFY open_sessions > 0 OR n_starts > 0
        |ORDER BY day""".stripMargin,

    // sample-ratio mismatch: 2-arm chi-square collapses to
    // d²/(n·ua·ub), all exact integers — verdict in HUGEINT, the
    // reported χ² a pure scalar double chain
    "events_ab_srm" ->
      """WITH ev AS (SELECT event_type, user_id, user_id % 2 = 0 AS is_a
        |  FROM events),
        |u AS (SELECT COUNT(DISTINCT CASE WHEN is_a THEN user_id END) AS ua,
        |    COUNT(DISTINCT CASE WHEN NOT is_a THEN user_id END) AS ub
        |  FROM ev),
        |t AS (SELECT event_type, COUNT(*) AS n_events,
        |    COUNT(CASE WHEN is_a THEN 1 END) AS n_a,
        |    COUNT(CASE WHEN NOT is_a THEN 1 END) AS n_b
        |  FROM ev GROUP BY 1),
        |c AS (SELECT t.*, u.ua, u.ub,
        |    CAST(n_a AS HUGEINT) * (ua + ub)
        |      - CAST(n_events AS HUGEINT) * ua AS d
        |  FROM t, u)
        |SELECT event_type, n_events, n_a, n_b,
        |  round(CAST(n_events AS DOUBLE) * ua / (ua + ub), 6) AS expected_a,
        |  round(CAST(d * d AS DOUBLE)
        |    / (CAST(n_events AS DOUBLE) * ua * ub), 6) AS chi2,
        |  d * d * 1000000 > CAST(3841459 AS HUGEINT) * n_events * ua * ub
        |    AS srm
        |FROM c ORDER BY event_type""".stripMargin,

    // bot regularity: exact integer/HUGEINT gap moments; the verdict
    // never touches a float (CV < 0.5 ⟺ 4·varN < (Σg)²); the
    // reported cv is a pure scalar double chain over exact inputs
    "events_bot_regularity" ->
      """WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
        |  FROM events),
        |g AS (SELECT user_id,
        |    ts_us - lag(ts_us) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS gap_us
        |  FROM ev QUALIFY gap_us IS NOT NULL),
        |s AS (SELECT user_id, COUNT(*) AS n_gaps,
        |    SUM(gap_us) AS sum_g,
        |    SUM(CAST(gap_us AS HUGEINT) * gap_us) AS sum_g2
        |  FROM g GROUP BY user_id),
        |v AS (SELECT user_id, n_gaps, sum_g,
        |    n_gaps * sum_g2 - CAST(sum_g AS HUGEINT) * sum_g AS var_n
        |  FROM s)
        |SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
        |  CAST(sum_g // n_gaps AS BIGINT) AS mean_gap_us,
        |  round(sqrt(CAST(var_n AS DOUBLE)) / CAST(sum_g AS DOUBLE), 6) AS cv,
        |  n_gaps >= 20 AND var_n * 4 < CAST(sum_g AS HUGEINT) * sum_g AS is_bot
        |FROM v ORDER BY user_id""".stripMargin
  )
}
