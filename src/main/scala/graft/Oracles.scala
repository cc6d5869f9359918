package graft

/** DuckDB oracle SQL for every SQL-expressible query in SparkEntry.
  *
  * Parity contract (SURVEY.md §5): identical column aliases, identical
  * deterministic ORDER BY, and all double aggregation routed through
  * exact DECIMAL arithmetic on both sides so engine-dependent FP
  * summation order cannot flip result bits.
  */
object Oracles {

  private val dsumQty = "CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)"
  private val revenue =
    "CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DECIMAL(28,6)) AS DOUBLE)"

  val relational: Map[String, String] = Map(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $dsumQty AS sum_qty,
         |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base,
         |  $revenue AS sum_disc_price,
         |  $dsumQty / COUNT(*) AS avg_qty,
         |  COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1999-01-01' AND l_discount > 0.05 AND l_quantity < 10
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q3_join_agg" ->
      s"""SELECT c_mktsegment, $revenue AS revenue, COUNT(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q4_broadcast_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    "q5_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 150000)
        |ORDER BY c_custkey""".stripMargin,

    "q6_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q7_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q8_window_running" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS running_spend,
        |  LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
        |                             ORDER BY o_orderdate, o_orderkey) AS prev_price
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q9_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
        |LIMIT 20""".stripMargin,

    "q10_distinct_setops" ->
      """(SELECT DISTINCT c_nationkey AS nk FROM customer)
        |EXCEPT
        |(SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |ORDER BY nk""".stripMargin,

    "q11_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows, $dsumQty AS sum_qty
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    "q12_case_expr" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_r,
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS qty_n,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    // tolerance gate for the HLL sketch: the oracle recomputes the
    // exact distincts and pins the engine's ±2% bounded-error verdict
    // to literal TRUE — a drifting sketch breaks the hash
    "q14_approx_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS exact_parts,
        |  COUNT(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS parts_within_2pct,
        |  TRUE AS orders_within_2pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q13_exists_subquery" ->
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
        |ORDER BY o_orderkey""".stripMargin,

    "q15_quantiles" ->
      """SELECT l_returnflag,
        |  ROUND(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
        |  ROUND(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
        |  ROUND(quantile_cont(l_extendedprice, 0.75), 4) AS p75
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q16_string_funcs" ->
      """SELECT c_custkey, UPPER(c_name) AS uname, SUBSTRING(c_name, 1, 5) AS prefix5,
        |  LENGTH(c_name) AS name_len,
        |  REGEXP_REPLACE(c_name, '[aeiou]', '', 'g') AS no_vowels,
        |  c_mktsegment || '#' || c_name AS tag
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "q17_datetime_funcs" ->
      """SELECT date_trunc('month', o_orderdate) AS month_start,
        |  CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM orders GROUP BY 1, 2 ORDER BY month_start""".stripMargin,

    "q18_having" ->
      """SELECT c_nationkey, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
        |FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 3
        |ORDER BY c_nationkey""".stripMargin,

    "q19_cross_join_small" ->
      """SELECT r_regionkey, r_name, status
        |FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS status FROM orders) s
        |ORDER BY r_regionkey, status""".stripMargin,

    "q20_union_all" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS src, c_custkey AS id, c_name AS name FROM customer
        |  UNION ALL
        |  SELECT 'supplier' AS src, s_suppkey AS id, s_name AS name FROM supplier) u
        |ORDER BY src, id""".stripMargin,

    // two-phase salted agg merges exact decimal partials → equals the
    // direct group-by
    "q21_two_phase_agg" ->
      s"""SELECT l_returnflag, $dsumQty AS sum_qty, COUNT(*) AS n_rows
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q22_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
         |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_stat,
         |  COUNT(*) AS n_rows, $dsumQty AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY g_flag, g_stat, l_returnflag, l_linestatus""".stripMargin,

    "q23_pivot" ->
      """SELECT l_linestatus,
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'A' THEN l_quantity END AS DECIMAL(18,4))) AS DOUBLE) AS qty_a,
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'N' THEN l_quantity END AS DECIMAL(18,4))) AS DOUBLE) AS qty_n,
        |  CAST(SUM(CAST(CASE WHEN l_returnflag = 'R' THEN l_quantity END AS DECIMAL(18,4))) AS DOUBLE) AS qty_r
        |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q24_scalar_subquery" ->
      s"""WITH seg AS (
         |  SELECT c_mktsegment, $revenue AS revenue
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  GROUP BY c_mktsegment),
         |tot AS (SELECT $revenue AS total_rev FROM lineitem)
         |SELECT c_mktsegment, revenue, round(revenue / total_rev, 6) AS rev_share
         |FROM seg CROSS JOIN tot ORDER BY c_mktsegment""".stripMargin,

    "q26_topk_exec" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, o_totalprice DESC, o_orderkey ASC""".stripMargin,

    "q27_exact_distinct" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q28_bloom_semi_join" ->
      s"""SELECT l_returnflag, COUNT(*) AS n_rows, $dsumQty AS sum_qty
         |FROM lineitem
         |WHERE EXISTS (SELECT 1 FROM orders
         |              WHERE o_orderkey = l_orderkey AND o_totalprice > 200000)
         |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q25_ntile_dense_rank" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, quartile, drank
        |FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
        |    CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |    CAST(DENSE_RANK() OVER w AS BIGINT) AS drank
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |               ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC)) t
        |WHERE drank <= 50
        |ORDER BY l_returnflag, drank, l_orderkey, l_linenumber""".stripMargin,

    // quantile_disc picks an element OF the data (SQL-standard
    // percentile_disc semantics, same as Spark's) — boundary values
    // match bit-for-bit with no interpolation arithmetic
    "q29_quantile_bucket" ->
      """WITH b AS (
        |  SELECT l_returnflag,
        |    quantile_disc(l_extendedprice, 0.25) AS q1,
        |    quantile_disc(l_extendedprice, 0.5)  AS q2,
        |    quantile_disc(l_extendedprice, 0.75) AS q3
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_returnflag,
        |  CAST(CASE WHEN l_extendedprice <= q1 THEN 1
        |            WHEN l_extendedprice <= q2 THEN 2
        |            WHEN l_extendedprice <= q3 THEN 3
        |            ELSE 4 END AS BIGINT) AS bucket,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  MAX(l_extendedprice) AS max_price
        |FROM lineitem l JOIN b USING (l_returnflag)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the pure inequality join (DuckDB plans it as an IEJoin) — the
    // engine's bucketed equi-join + residual must produce the SAME
    // set, since bucketing is exact integer arithmetic
    "q30_range_join" ->
      """WITH ev AS (SELECT event_type, user_id, value, epoch_us(ts) AS ts_us
        |            FROM events),
        |iv AS (SELECT event_type AS itype, user_id % 50 AS ub,
        |         MIN(ts_us) AS lo, MIN(ts_us) + 600000000 AS hi
        |       FROM ev GROUP BY 1, 2)
        |SELECT itype, ub, lo, hi, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM iv JOIN ev e ON e.ts_us >= iv.lo AND e.ts_us < iv.hi
        |GROUP BY 1, 2, 3, 4
        |ORDER BY itype, ub""".stripMargin,

    // genuinely correlated formulation — DuckDB decorrelates it into
    // the same join the engine writes out; price·n > sum keeps the
    // comparison divisionless (exact decimal × integer)
    "q31_correlated_agg" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders o
        |WHERE CAST(o_totalprice AS DECIMAL(18,4)) *
        |        (SELECT COUNT(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        |      > (SELECT SUM(CAST(i.o_totalprice AS DECIMAL(18,4)))
        |         FROM orders i WHERE i.o_custkey = o.o_custkey)
        |ORDER BY o_orderkey""".stripMargin,

    "q33_range_frame" ->
      """SELECT o_orderkey, o_custkey,
        |  epoch_us(o_orderdate) // 86400000000 AS day_num,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,4)) AS DOUBLE) AS o_totalprice,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER w AS DOUBLE)
        |    AS trail30_value,
        |  COUNT(*) OVER w AS trail30_orders
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY epoch_us(o_orderdate) // 86400000000
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_orderkey""".stripMargin,

    "q34_filtered_agg" ->
      """SELECT o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |    FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) AS finished_value,
        |  COUNT(DISTINCT o_custkey) FILTER (WHERE o_orderstatus = 'O')
        |    AS open_customers,
        |  BOOL_OR(o_totalprice > 300000) AS has_large,
        |  BOOL_AND(o_totalprice > 1000) AS all_above_1k
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,

    "q35_percent_rank" ->
      """SELECT c_custkey, c_nationkey, c_acctbal,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q36_listagg" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_top,
        |  string_agg(c_name, ',' ORDER BY rank) AS top_names
        |FROM (SELECT c_nationkey, c_name,
        |        ROW_NUMBER() OVER (PARTITION BY c_nationkey
        |          ORDER BY c_acctbal DESC, c_custkey) AS rank
        |      FROM customer) t
        |WHERE rank <= 5 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q32_lateral_topk" ->
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin,

    "q39_percentile_cont" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
        |  round(percentile_cont(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p25,
        |  round(percentile_cont(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p50,
        |  round(percentile_cont(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 4) AS p75
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    // mode composed (not mode(): both engines tie-break arbitrarily)
    "q40_mode" ->
      """WITH c AS (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        |           FROM orders GROUP BY 1, 2),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
        |        ORDER BY n DESC, o_orderpriority ASC) AS rk,
        |      CAST(SUM(n) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS total
        |      FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  n AS n_mode, total AS n_group,
        |  round(CAST(n AS DOUBLE) / CAST(total AS DOUBLE), 6) AS mode_share
        |FROM r WHERE rk = 1 ORDER BY o_orderstatus""".stripMargin,

    // UNPIVOT spelled as the portable UNION ALL (DuckDB's UNPIVOT
    // keyword reshapes identically; the union is the semantics)
    "q41_unpivot" ->
      s"""WITH a AS (SELECT l_returnflag, l_linestatus,
         |    $dsumQty AS sum_qty,
         |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
         |    CAST(COUNT(*) AS DOUBLE) AS n_rows
         |  FROM lineitem GROUP BY 1, 2)
         |SELECT l_returnflag, l_linestatus, measure, value FROM (
         |  SELECT l_returnflag, l_linestatus, 'n_rows' AS measure, n_rows AS value FROM a
         |  UNION ALL SELECT l_returnflag, l_linestatus, 'sum_price', sum_price FROM a
         |  UNION ALL SELECT l_returnflag, l_linestatus, 'sum_qty', sum_qty FROM a) u
         |ORDER BY l_returnflag, l_linestatus, measure""".stripMargin,

    // regression aggregates closed-form over exact decimal power sums
    // (regr_slope()/regr_r2() stream doubles in partition order on
    // both engines — nondeterministic); arithmetic order mirrors the
    // Spark expressions token for token
    "q42_regr" ->
      """WITH s AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sxy,
        |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS sxx,
        |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS DECIMAL(28,6)) AS DOUBLE) AS syy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
        |  round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
        |  round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6) AS intercept,
        |  round((n * sxy - sx * sy) * (n * sxy - sx * sy)
        |        / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
        |FROM s ORDER BY l_returnflag""".stripMargin,

    // IGNORE NULLS forward fill; the sparsity rule is deterministic
    // (orderkey % 3) so both engines see identical nulls
    "q43_gap_fill" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS observed
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, observed,
        |  last_value(observed IGNORE NULLS) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
        |  last_value(observed IGNORE NULLS) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_obs
        |FROM o ORDER BY o_custkey, o_orderkey""".stripMargin,

    // the interpolation blend mirrors the engine token for token;
    // neighbor values AND row indices via IGNORE NULLS frames
    "q46_interpolate" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate,
        |    CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice END AS observed
        |  FROM orders),
        |b AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate ASC, o_orderkey ASC) AS BIGINT) AS rn FROM o),
        |s AS (SELECT *,
        |    last_value(observed IGNORE NULLS) OVER wp AS pv,
        |    last_value(CASE WHEN observed IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER wp AS pi,
        |    first_value(observed IGNORE NULLS) OVER wn AS nv,
        |    first_value(CASE WHEN observed IS NOT NULL THEN rn END IGNORE NULLS)
        |      OVER wn AS ni
        |  FROM b
        |  WINDOW wp AS (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |    wn AS (PARTITION BY o_custkey
        |      ORDER BY o_orderdate ASC, o_orderkey ASC
        |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        |SELECT o_custkey, o_orderkey, observed,
        |  round(CASE WHEN observed IS NOT NULL THEN observed
        |    WHEN pv IS NULL THEN nv
        |    WHEN nv IS NULL THEN pv
        |    ELSE pv + (nv - pv) * CAST(rn - pi AS DOUBLE)
        |      / CAST(ni - pi AS DOUBLE) END, 6) AS interpolated
        |FROM s ORDER BY o_custkey, o_orderkey""".stripMargin,

    // gid = grouping(flag)·2 + grouping(status): Spark's grouping_id
    // bit order (first grouping column = MSB), spelled explicitly
    "q44_cube" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n_rows, $dsumQty AS sum_qty
         |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
         |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,

    // the UNSALTED join — salting must be invisible in the result
    "q47_salted_skew_join" ->
      """WITH li AS (SELECT l_returnflag, l_linestatus,
        |    CAST(l_quantity * 100 AS BIGINT) AS qc FROM lineitem),
        |stats AS (SELECT l_returnflag AS f, COUNT(*) AS n_flag,
        |    CAST(SUM(qc) AS BIGINT) AS tot_cents FROM li GROUP BY 1)
        |SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
        |  COUNT(CASE WHEN qc * n_flag > tot_cents THEN 1 END) AS n_above_avg
        |FROM li JOIN stats ON l_returnflag = f
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // ANSI NOT IN three-valued logic: NULL lhs rows never survive
    "q48_not_in_null_aware" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
        |FROM (SELECT *, CASE WHEN o_orderkey % 97 = 0 THEN NULL
        |                     ELSE o_custkey END AS maybe_key FROM orders) o
        |WHERE maybe_key NOT IN
        |  (SELECT c_custkey FROM customer WHERE c_custkey % 5 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q49_lead_lag_windows" ->
      """WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |    epoch_us(o_orderdate) // 86400000000 AS day_num FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  day_num - lag(day_num) OVER w AS prev_gap_days,
        |  lead(day_num) OVER w - day_num AS next_gap_days,
        |  first_value(o_orderkey) OVER wf AS first_order,
        |  nth_value(o_orderkey, 2) OVER wf AS second_order,
        |  round(cume_dist() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice, o_orderkey), 6) AS price_cume_dist
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day_num, o_orderkey),
        |  wf AS (PARTITION BY o_custkey ORDER BY day_num, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,

    // the ANSI bag difference; multiplicities compared, not row order
    "q50_except_all" ->
      """SELECT o_custkey, COUNT(*) AS multiplicity FROM (
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') t
        |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    // identical IEEE ops in identical order — bit-identical buckets
    "q51_histogram" ->
      """WITH b AS (SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |           FROM orders),
        |x AS (SELECT LEAST(19, FLOOR((o_totalprice - lo) * 20
        |        / (CASE WHEN hi = lo THEN 1.0 ELSE hi - lo END)))::BIGINT
        |    AS bucket, lo, hi FROM orders, b)
        |SELECT bucket, COUNT(*) AS n,
        |  round(MIN(lo) + bucket * (MIN(hi) - MIN(lo)) / 20, 4) AS bucket_lo
        |FROM x GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q45_intersect" ->
      """SELECT nk, membership FROM (
        |  SELECT nk, 'both' AS membership FROM (
        |    (SELECT DISTINCT c_nationkey AS nk FROM customer)
        |    INTERSECT
        |    (SELECT DISTINCT s_nationkey AS nk FROM supplier))
        |  UNION ALL
        |  SELECT nk, 'customer_only' FROM (
        |    (SELECT DISTINCT c_nationkey AS nk FROM customer)
        |    EXCEPT
        |    (SELECT DISTINCT s_nationkey AS nk FROM supplier))
        |  UNION ALL
        |  SELECT nk, 'supplier_only' FROM (
        |    (SELECT DISTINCT s_nationkey AS nk FROM supplier)
        |    EXCEPT
        |    (SELECT DISTINCT c_nationkey AS nk FROM customer))) u
        |ORDER BY nk""".stripMargin,

    // the standard MERGE composition; the change set re-derives from
    // the base, price bump in exact DECIMAL on both sides (§5)
    "q38_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice
        |              FROM orders),
        |changes AS (SELECT
        |    CASE WHEN o_orderkey % 7 = 0 THEN o_orderkey
        |         ELSE o_orderkey + 10000000000000 END AS c_orderkey,
        |    'X' AS c_status,
        |    CAST(round(CAST(o_totalprice AS DECIMAL(18,4))
        |      * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE) AS c_totalprice
        |  FROM orders WHERE o_orderkey % 7 = 0 OR o_orderkey % 11 = 3)
        |SELECT COALESCE(o_orderkey, c_orderkey) AS orderkey,
        |  COALESCE(c_status, o_orderstatus) AS status,
        |  COALESCE(c_totalprice, o_totalprice) AS totalprice,
        |  CASE WHEN o_orderkey IS NULL THEN 'insert'
        |       WHEN c_orderkey IS NULL THEN 'keep'
        |       ELSE 'update' END AS action
        |FROM base FULL OUTER JOIN changes ON o_orderkey = c_orderkey
        |ORDER BY orderkey""".stripMargin,

    // same first-occurrence-marker composition as the engine (not
    // COUNT(DISTINCT) OVER, which Spark can't plan — the point of the
    // query is that the composition IS the portable form)
    // arg_max/arg_min on the SAME composite bigint the engine
    // orders by (cents·10¹² + custkey) — tie-broken, so both
    // engines must name the same customer
    "q52_arg_minmax" ->
      """WITH c AS (SELECT c_mktsegment, c_name,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 100 AS BIGINT) AS cents,
        |    CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 100 AS BIGINT)
        |      * 1000000000000 + c_custkey AS ord
        |  FROM customer)
        |SELECT c_mktsegment, COUNT(*) AS n_customers,
        |  arg_max(c_name, ord) AS top_name,
        |  arg_max(cents, ord) AS top_acctbal_cents,
        |  arg_min(c_name, ord) AS bottom_name,
        |  arg_min(cents, ord) AS bottom_acctbal_cents
        |FROM c GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // bitwise + boolean aggregate monoids — commutative/associative,
    // partitioning-independent by construction
    "q53_bit_agg" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  bit_and(CAST(l_linenumber AS BIGINT)) AS and_linenumber,
        |  bit_or(CAST(l_linenumber AS BIGINT)) AS or_linenumber,
        |  bit_xor(l_orderkey) AS xor_orderkey,
        |  bool_and(l_quantity >= 1.0) AS all_qty_ge1,
        |  bool_or(l_discount > 0.09) AS any_deep_discount
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // sketch-contract gate (the q14 recipe for quantiles): exact
    // discrete bracket bounds at rank q ± 2/accuracy cross engines
    // (elements OF the data); the oracle pins the verdicts TRUE
    "q54_approx_quantile" ->
      """SELECT l_returnflag, COUNT(*) AS n,
        |  quantile_disc(l_extendedprice, 0.498) AS lo50,
        |  quantile_disc(l_extendedprice, 0.502) AS hi50,
        |  quantile_disc(l_extendedprice, 0.898) AS lo90,
        |  quantile_disc(l_extendedprice, 0.902) AS hi90,
        |  TRUE AS p50_in_bracket, TRUE AS p90_in_bracket
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,

    "q37_running_distinct" ->
      """WITH o AS (SELECT o_orderkey, o_custkey, o_orderpriority,
        |  epoch_us(o_orderdate) // 86400000000 AS day_num FROM orders),
        |m AS (SELECT *, CASE WHEN ROW_NUMBER() OVER (
        |    PARTITION BY o_custkey, o_orderpriority
        |    ORDER BY day_num, o_orderkey) = 1 THEN 1 ELSE 0 END AS is_first
        |  FROM o)
        |SELECT o_orderkey, o_custkey, day_num,
        |  CAST(SUM(is_first) OVER (PARTITION BY o_custkey
        |    ORDER BY day_num, o_orderkey
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS distinct_priorities_so_far
        |FROM m ORDER BY o_orderkey""".stripMargin,

    // gaps-and-islands: day - row_number() is constant along a
    // consecutive-day run (the canonical trick, both engines)
    "q55_gaps_islands" ->
      """WITH d AS (SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS day
        |  FROM orders),
        |i AS (SELECT o_custkey, day,
        |    day - CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY day) AS INT) AS grp
        |  FROM d),
        |r AS (SELECT o_custkey, grp, COUNT(*) AS run FROM i GROUP BY 1, 2)
        |SELECT o_custkey, CAST(SUM(run) AS BIGINT) AS n_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_islands,
        |  CAST(MAX(run) AS BIGINT) AS max_streak
        |FROM r GROUP BY o_custkey ORDER BY o_custkey""".stripMargin
  )
}
