package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables.{t, dsum, dsumProd}
import graft.functions.GraftExpressions.{doubleToDecimal18 => d2dec}

/** §2b relational / OLAP query suite.
  *
  * Declarative DataFrame plans only — Catalyst handles pushdown,
  * pruning, join selection; small dimension tables are explicitly
  * broadcast. Every query ends with a deterministic unique-key sort
  * (oracle parity; the driver hashes the result).
  */
object Relational {

  /** q1: grouped aggregation with several aggregates (TPC-H Q1 shape). */
  def q1Agg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base"),
        dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q2: predicate + projection pushdown (filters reach the parquet scan). */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_discount") > 0.05 && col("l_quantity") < 10)
      .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate")
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** q3: fact-fact-dim join + aggregation — revenue by market segment. */
  def q3JoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("c_mktsegment")
  }

  /** q4: broadcast star join over small dims. */
  def q4BroadcastJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val n = t(spark, dir, "nation")
    val r = t(spark, dir, "region")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("r_name", "n_name")
  }

  /** q5: EXISTS via left-semi join — customers having a big order. */
  def q5SemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders").filter(col("o_totalprice") > 150000)
    c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** q6: NOT EXISTS via left-anti join — customers with no orders. */
  def q6AntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val o = t(spark, dir, "orders")
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** q7: window rank — top-3 orders per customer by price. */
  def q7WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    o.withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  /** q8: running sum + lag over an ordered per-customer window.
    * Running sum through decimal for cross-engine determinism. */
  def q8WindowRunning(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.withColumn("running_spend",
        sum(d2dec(col("o_totalprice"), 4))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice",
        "running_spend", "prev_price")
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q9: global top-k (sort + limit → TakeOrderedAndProject). */
  def q9TopK(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.select("l_orderkey", "l_linenumber", "l_extendedprice")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(20)
  }

  /** q10: distinct + EXCEPT — nations with customers but no suppliers. */
  def q10DistinctSetops(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
    c.except(s).orderBy("nk")
  }

  /** q11: rollup aggregation (subtotals + grand total). */
  def q11Rollup(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)
  }

  /** q12: conditional (CASE WHEN) pivot-style aggregation. */
  def q12CaseExpr(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    def flagQty(f: String) =
      sum(d2dec(when(col("l_returnflag") === f, col("l_quantity"))
        .otherwise(lit(0.0)), 4)).cast("double")
    li.groupBy("l_linestatus")
      .agg(
        flagQty("R").as("qty_r"),
        flagQty("A").as("qty_a"),
        flagQty("N").as("qty_n"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_linestatus")
  }

  /** q13: correlated EXISTS subquery, decorrelated to a semi join —
    * orders containing a max-quantity line item. */
  def q13ExistsSubquery(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val big = t(spark, dir, "lineitem").filter(col("l_quantity") >= 49)
    o.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** q14: HyperLogLog approximate distinct, TOLERANCE-GATED (round
    * 12, verdict directive 7): DuckDB's approx_count_distinct is a
    * different sketch, so the estimates themselves can never
    * hash-match — but the sketch's CONTRACT can. The query computes
    * both the HLL estimate (rsd 0.01) and the exact distinct, and
    * emits the exact counts plus a BOUNDED-ERROR verdict (estimate
    * within ±2% of exact; measured ≤0.97% at sf0.01/sf0.1/10×, and the
    * estimate is data-deterministic — no run-to-run variance) per group; the oracle recomputes the exact
    * counts and asserts the verdict columns are literally TRUE. A
    * drifting or broken sketch flips a boolean and breaks the hash —
    * the row is semantically checked, not rows-only. The exact
    * distinct here is the measuring stick the gate needs, not the
    * operator's production shape (that is the HLL itself — at 100 TB
    * you run ONLY the sketch; q27 covers exact distinct). */
  def q14ApproxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    // HLL and exact-distinct run as SEPARATE aggregations joined on
    // the 3-row group key: mixing approx_count_distinct with
    // multi-column countDistinct in ONE agg routes the 2^16-register
    // HLL buffers through the distinct-Expand path — measured 338 s
    // vs 4.6 s split at sf0.1, identical results (HLL register merge
    // is max-based and order-free, so the estimate is
    // plan-independent)
    val hll = li.groupBy("l_returnflag")
      .agg(
        approx_count_distinct(col("l_partkey"), 0.01).as("approx_parts"),
        approx_count_distinct(col("l_orderkey"), 0.01).as("approx_orders"))
    val exact = li.groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"))
    hll.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("exact_parts"), col("exact_orders"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= col("exact_parts").cast("double") * 0.02).as("parts_within_2pct"),
        (abs(col("approx_orders") - col("exact_orders"))
          <= col("exact_orders").cast("double") * 0.02).as("orders_within_2pct"))
      .orderBy("l_returnflag")
  }

  /** q15: exact interpolated quantiles per group (rounded — the
    * interpolation formula differs in last-bit across engines),
    * WITHOUT the unbounded per-group value buffer of the single-pass
    * `percentile` aggregate (whose ObjectHashAggregate buffers every
    * distinct value per group — an OOM at 100 TB on an unbounded
    * numeric column). Two passes over the fact table instead:
    *
    *  1. a (group × value-bucket) COUNT histogram — bounded at
    *     #groups × ~1k rows whatever the corpus size — plus a
    *     bounded cumulative window over it locates, for each target
    *     rank k = the two order statistics bracketing position
    *     (n−1)·q, WHICH bucket holds the k-th value and its offset j
    *     within that bucket;
    *  2. only rows of the located buckets (a broadcast semi-filter,
    *     ≈ n/1024 of the table per target) get a per-(group, q, side)
    *     row_number — partitions are bucket-occupancy-sized, never
    *     group-sized — and the j-th row is the order statistic.
    *
    * Interpolation then follows the same (n−1)·q position formula
    * `percentile`/quantile_cont define, so the DuckDB oracle is
    * unchanged, and Q15TwoPassSpec asserts bit-equality against the
    * plain aggregate form. Degenerate shapes: frac 0 makes hi == lo
    * (kHigh capped at n); a massive tie concentrates ONE bucket —
    * offset-j selection still answers from it, and a second
    * refinement level would compose the same way if occupancy ever
    * needed rebounding. The global min/max is one 1-row collect (the
    * adjudicated bounded-scalar pattern). */
  def q15Quantiles(spark: SparkSession, dir: String): DataFrame = {
    val all = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_extendedprice").as("v"))
    val li = all.where(col("v").isNotNull) // percentile ignores nulls
    val stats = li.agg(min("v"), max("v")).head()
    val lo = if (stats.isNullAt(0)) 0.0 else stats.getDouble(0)
    val hi = if (stats.isNullAt(1)) 0.0 else stats.getDouble(1)
    val width = math.max((hi - lo) / 1024.0, 1e-9)
    val withB = li.withColumn("b",
      floor((col("v") - lit(lo)) / lit(width)).cast("long"))
    val hist = withB.groupBy("l_returnflag", "b").agg(count(lit(1)).as("cnt"))
    val wB = Window.partitionBy("l_returnflag").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_before",
      coalesce(sum("cnt").over(wB), lit(0L)))
    val targets = hist.groupBy("l_returnflag").agg(sum("cnt").as("n"))
      .select(col("l_returnflag"), col("n"),
        explode(array(Seq(0.25, 0.5, 0.75).map(lit): _*)).as("q"))
      .withColumn("pos", (col("n") - 1) * col("q"))
      .withColumn("k_lo", floor(col("pos")).cast("long") + 1)
      .withColumn("k_hi", least(floor(col("pos")).cast("long") + 2, col("n")))
      .withColumn("frac", col("pos") - floor(col("pos")))
    val ranks = targets.select(col("l_returnflag"), col("q"), col("frac"),
        explode(array(
          struct(lit("lo").as("side"), col("k_lo").as("k")),
          struct(lit("hi").as("side"), col("k_hi").as("k")))).as("t"))
      .select(col("l_returnflag"), col("q"), col("frac"),
        col("t.side"), col("t.k"))
    val located = ranks.join(cum, Seq("l_returnflag"))
      .where(col("cum_before") < col("k") &&
        col("k") <= col("cum_before") + col("cnt"))
      .select(col("l_returnflag"), col("q"), col("frac"), col("side"),
        col("b"), (col("k") - col("cum_before")).as("j"))
    val cand = withB.join(broadcast(located), Seq("l_returnflag", "b"))
    val wC = Window.partitionBy("l_returnflag", "q", "side").orderBy("v")
    val picked = cand.withColumn("rn", row_number().over(wC))
      .where(col("rn") === col("j"))
    val quantiles = picked.groupBy("l_returnflag", "q", "frac").agg(
        max(when(col("side") === "lo", col("v"))).as("v_lo"),
        max(when(col("side") === "hi", col("v"))).as("v_hi"))
      .withColumn("qv", round(
        col("v_lo") + (col("v_hi") - col("v_lo")) * col("frac"), 4))
      .groupBy("l_returnflag").agg(
        max(when(col("q") === 0.25, col("qv"))).as("p25"),
        max(when(col("q") === 0.5, col("qv"))).as("p50"),
        max(when(col("q") === 0.75, col("qv"))).as("p75"))
    // groups whose values are ALL NULL never reach the histogram but
    // must still answer (with NULL quantiles) — the same shape the
    // plain percentile aggregate returns
    all.select("l_returnflag").distinct()
      .join(quantiles, Seq("l_returnflag"), "left")
      .orderBy("l_returnflag")
  }

  /** Exact order statistics by RANK via the q15 two-pass histogram —
    * the shared machinery behind every exact-percentile query
    * (q15/q29/q39/q54), extracted so none of them carries the
    * unbounded per-group value buffer of `percentile`/
    * `percentile_disc` (whose ObjectHashAggregate builds, serializes,
    * shuffles and merges ONE value→count map PER CALL per group —
    * q54's four percentile_disc calls paid that map 4× over identical
    * data; an OOM at 100 TB on an unbounded numeric column besides).
    *
    * Contract: `values` = (g, v) rows, v non-null; `ranks` = (g, tag,
    * k) with k a 1-based target rank, 1 ≤ k ≤ |group|, and (g, tag)
    * unique. Returns (g, tag, v) where v is the k-th smallest value
    * of the group — ties included in rank order, so the returned
    * VALUE is deterministic under any tie permutation.
    *
    * Scale shape (inherited from q15, see its scaladoc): pass 1 is a
    * (g × 1024-bucket) COUNT histogram — bounded whatever the corpus
    * size — whose cumulative window locates, for each k, WHICH bucket
    * holds the k-th value and its offset j within it; pass 2
    * row_numbers ONLY the located buckets (a broadcast semi-filter,
    * ≈ n/1024 of the table per target). The global min/max is one
    * 1-row collect (the adjudicated bounded-scalar pattern).
    *
    * Skew guard (round 16): the ≈ n/1024 estimate assumes values
    * spread across buckets; an outlier-stretched range or a
    * near-constant column can drop almost the whole group into ONE
    * bucket, degrading pass 2 to a single-task sort of the group. The
    * `located` relation is tiny (one row per target rank), so it is
    * eagerly localCheckpoint-ed and the driver inspects max(cnt) for
    * free. Buckets above `spark.graft.rankselect.refineThreshold`
    * (default 4M rows) take a refined path: exact ties (bucket
    * min == max) are answered directly without any sort — the k-th of
    * identical values IS that value — and the rest get one more
    * equi-width histogram level over the bucket's own [min, max]
    * (another 1024× narrower), after which pass 2 sorts only the
    * located SUB-bucket. One refinement level only: adversarial mass
    * tied at distinct values inside one sub-bucket still degrades to a
    * (spilling, memory-safe) single-task sort of that sub-bucket.
    *
    * Assumes a floating-point DOUBLE (or double-castable) non-NaN `v`
    * column: the result column keeps v's input type (the aggregate
    * forms it replaces always return DOUBLE — they match here only
    * because every caller's column IS double), and a NaN would bucket
    * through floor/cast differently than percentile's sort-NaN-last. */
  private[operators] def rankSelect(values: DataFrame, ranks: DataFrame): DataFrame = {
    val stats = values.agg(min(col("v").cast("double")),
      max(col("v").cast("double"))).head()
    if (stats.isNullAt(0))
      return ranks.select(col("g"), col("tag"),
        lit(null).cast(values.schema("v").dataType).as("v"))
    val lo = stats.getDouble(0)
    val hi = stats.getDouble(1)
    val width = math.max((hi - lo) / 1024.0, 1e-9)
    val withB = values.withColumn("b",
      floor((col("v").cast("double") - lit(lo)) / lit(width)).cast("long"))
    val hist = withB.groupBy("g", "b").agg(count(lit(1)).as("cnt"))
    val wB = Window.partitionBy("g").orderBy("b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_before",
      coalesce(sum("cnt").over(wB), lit(0L)))
    val located = ranks.join(cum, Seq("g"))
      .where(col("cum_before") < col("k") &&
        col("k") <= col("cum_before") + col("cnt"))
      .select(col("g"), col("tag"), col("b"),
        (col("k") - col("cum_before")).as("j"), col("cnt"))
      .localCheckpoint(true) // tiny: one row per (g, tag) target
    val maxCntRow = located.agg(max("cnt")).head()
    val maxCnt = if (maxCntRow.isNullAt(0)) 0L else maxCntRow.getLong(0)
    val refineAt = values.sparkSession.conf
      .get("spark.graft.rankselect.refineThreshold", (4 << 20).toString).toLong
    def pickInBuckets(loc: DataFrame): DataFrame = {
      val cand = withB.join(broadcast(loc.select("g", "tag", "b", "j")),
        Seq("g", "b"))
      val wC = Window.partitionBy("g", "tag").orderBy("v")
      cand.withColumn("rn", row_number().over(wC))
        .where(col("rn") === col("j"))
        .select(col("g"), col("tag"), col("v"))
    }
    if (maxCnt <= refineAt) return pickInBuckets(located)
    val small = located.where(col("cnt") <= refineAt)
    val big = located.where(col("cnt") > refineAt)
    val bigBuckets = big.select("g", "b").distinct()
    val candB = withB.join(broadcast(bigBuckets), Seq("g", "b"))
    // per-bucket extrema: original type for the tie answer (result
    // keeps v's type), double for the sub-bucket arithmetic
    val stats2 = candB.groupBy("g", "b").agg(
        min(col("v")).as("vmin"), max(col("v")).as("vmax"),
        min(col("v").cast("double")).as("dmin"),
        max(col("v").cast("double")).as("dmax"))
      .localCheckpoint(true) // tiny: one row per oversized bucket
    val tiedAns = big.join(stats2.where(col("vmin") === col("vmax")),
        Seq("g", "b"))
      .select(col("g"), col("tag"), col("vmin").as("v"))
    val untied = stats2.where(col("vmin") =!= col("vmax"))
      .select(col("g"), col("b"), col("dmin"),
        greatest((col("dmax") - col("dmin")) / lit(1024.0), lit(1e-9))
          .as("w2"))
    // floor((v - dmin)/w2) is monotone nondecreasing in v, so
    // sub-buckets are value-ordered and the rank arithmetic below is
    // exactly the level-1 argument one level down
    val withB2 = candB.join(broadcast(untied), Seq("g", "b"))
      .withColumn("b2",
        floor((col("v").cast("double") - col("dmin")) / col("w2"))
          .cast("long"))
    val hist2 = withB2.groupBy("g", "b", "b2").agg(count(lit(1)).as("cnt2"))
    val wB2 = Window.partitionBy("g", "b").orderBy("b2")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum2 = hist2.withColumn("cum2_before",
      coalesce(sum("cnt2").over(wB2), lit(0L)))
    val located2 = big.join(cum2, Seq("g", "b"))
      .where(col("cum2_before") < col("j") &&
        col("j") <= col("cum2_before") + col("cnt2"))
      .select(col("g"), col("tag"), col("b"), col("b2"),
        (col("j") - col("cum2_before")).as("j2"))
    val cand2 = withB2.join(broadcast(located2), Seq("g", "b", "b2"))
    val wC = Window.partitionBy("g", "tag").orderBy("v")
    val refined = cand2.withColumn("rn", row_number().over(wC))
      .where(col("rn") === col("j2"))
      .select(col("g"), col("tag"), col("v"))
    pickInBuckets(small).unionAll(tiedAns).unionAll(refined)
  }

  /** The target ranks of Spark's `percentile_disc(p)`: k =
    * ceil(N.toDouble · p) with N the group's NON-NULL value count —
    * the exact double arithmetic PercentileDisc.getPercentile runs
    * (verified against the Spark 4.1 bytecode: N l2d, dmul, ceil,
    * d2l), so the selected order statistic is bit-identical to the
    * aggregate form at any N. */
  private def discRank(nNonNull: org.apache.spark.sql.Column, p: Double) =
    ceil(nNonNull.cast("double") * lit(p)).cast("long")

  /** q16: string function suite. */
  def q16StringFuncs(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    c.select(
        col("c_custkey"),
        upper(col("c_name")).as("uname"),
        substring(col("c_name"), 1, 5).as("prefix5"),
        length(col("c_name")).cast("long").as("name_len"),
        regexp_replace(col("c_name"), "[aeiou]", "").as("no_vowels"),
        concat(col("c_mktsegment"), lit("#"), col("c_name")).as("tag"))
      .orderBy("c_custkey")
  }

  /** q17: datetime bucketing + extraction. */
  def q17DatetimeFuncs(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(
        date_trunc("month", col("o_orderdate")).as("month_start"),
        year(col("o_orderdate")).as("order_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("month_start")
  }

  /** q18: aggregate filter (HAVING). */
  def q18Having(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    c.groupBy("c_nationkey")
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_bal"))
      .filter(col("n_customers") >= 3)
      .orderBy("c_nationkey")
  }

  /** q19: controlled cartesian of tiny dimensions. */
  def q19CrossJoinSmall(spark: SparkSession, dir: String): DataFrame = {
    val r = t(spark, dir, "region")
    val st = t(spark, dir, "orders").select(col("o_orderstatus").as("status")).distinct()
    r.crossJoin(broadcast(st))
      .select("r_regionkey", "r_name", "status")
      .orderBy("r_regionkey", "status")
  }

  /** q20: UNION ALL of heterogeneous projections. */
  def q20UnionAll(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
      .select(lit("customer").as("src"), col("c_custkey").as("id"), col("c_name").as("name"))
    val s = t(spark, dir, "supplier")
      .select(lit("supplier").as("src"), col("s_suppkey").as("id"), col("s_name").as("name"))
    c.unionAll(s).orderBy("src", "id")
  }

  /** q21: salted two-phase aggregation — the skew-safe shape for
    * heavy-hitter grouping keys at 100 TB: phase 1 aggregates
    * (key, salt) so no single reducer sees a whole hot key, phase 2
    * merges the ≤16 partials per key. Decimal partials are exact, so
    * the result equals the direct group-by the oracle runs. */
  def q21TwoPhaseAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val partial = li
      .withColumn("salt", pmod(col("l_orderkey"), lit(16L)))
      .groupBy("l_returnflag", "salt")
      .agg(sum(d2dec(col("l_quantity"), 4)).as("pq"),
        count(lit(1)).as("pn"))
    partial.groupBy("l_returnflag")
      .agg(sum(col("pq")).cast("double").as("sum_qty"), sum(col("pn")).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** q22: GROUPING SETS with grouping() markers (SQL surface). */
  def q22GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("lineitem_v")
    spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(grouping(l_returnflag) AS BIGINT) AS g_flag,
        |  CAST(grouping(l_linestatus) AS BIGINT) AS g_stat,
        |  COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem_v
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY g_flag, g_stat, l_returnflag, l_linestatus""".stripMargin)
  }

  /** q23: pivot operator (wide conditional aggregation). */
  def q23Pivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(sum(d2dec(col("l_quantity"), 4)).cast("double"))
      .select(col("l_linestatus"), col("A").as("qty_a"), col("N").as("qty_n"),
        col("R").as("qty_r"))
      .orderBy("l_linestatus")

  /** q24: scalar subquery — each segment's share of total revenue. */
  def q24ScalarSubquery(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val o = t(spark, dir, "orders")
    val c = t(spark, dir, "customer")
    val seg = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
    val total = li.agg(
      dsumProd(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("total_rev"))
    seg.crossJoin(broadcast(total))
      .select(col("c_mktsegment"), col("revenue"),
        round(col("revenue") / col("total_rev"), 6).as("rev_share"))
      .orderBy("c_mktsegment")
  }

  /** q26: per-key top-k via the custom bounded-heap operator
    * (graft.plans.TopKPerKeyExec) — O(n log k) streaming pass instead
    * of the full per-partition sort the window formulation needs;
    * result is identical (same keys, ordering, tie-breaks). */
  def q26TopkExec(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerKey(t(spark, dir, "orders"), 3,
      groupBy = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", true), ("o_orderkey", false)))
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .orderBy(col("o_custkey"), col("o_totalprice").desc, col("o_orderkey").asc)

  /** q27: exact distinct counting (the exact counterpart q14's HLL
    * approximates; shuffle-heavy by nature — two-level agg). */
  def q27ExactDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    li.groupBy("l_returnflag")
      .agg(
        countDistinct("l_partkey").as("n_parts"),
        countDistinct("l_orderkey").as("n_orders"),
        countDistinct("l_suppkey").as("n_supps"))
      .orderBy("l_returnflag")
  }

  /** q28: bloom-filter runtime pre-filter + exact semi join — the
    * explicit form of Spark's runtime filtering: the build side's
    * key set is sketched (one tiny binary), the probe scan drops
    * non-members BEFORE the shuffle, and the exact join afterwards
    * removes the sketch's false positives, so the result is exactly
    * the plain semi join (which is the oracle). At 100 TB this is the
    * difference between shuffling the full fact table and shuffling
    * the ~matching fraction. */
  def q28BloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType

    val li = t(spark, dir, "lineitem")
    val bigOrders = t(spark, dir, "orders").filter(col("o_totalprice") > 200000)
    // build side → one bloom sketch (collected: it's the sketch, not data)
    val bloomBytes = bigOrders.agg(ColumnBridge.column(
        org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          XxHash64(Seq(ColumnBridge.expression(col("o_orderkey"))), 42L),
          Literal(10000L), Literal(8L * 10000L * 8L), 0, 0)
          .toAggregateExpression()).as("bf"))
      .collect()(0).getAs[Array[Byte]](0)
    val prefiltered = li.filter(ColumnBridge.column(
      BloomFilterMightContain(Literal(bloomBytes, BinaryType),
        XxHash64(Seq(ColumnBridge.expression(col("l_orderkey"))), 42L))))
    prefiltered.join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")
  }

  /** q25: ntile + dense_rank over a unique total order, WITHOUT the
    * full-table per-flag sort the direct window form needs. The
    * consumer keeps only `dense_rank ≤ 50`, and that set is a PREFIX
    * of the per-flag descending order (dense_rank is monotone in it)
    * — so the plan pre-filters to the prefix and windows only the
    * survivors:
    *  1. cutoff = the 50th-highest DISTINCT price per flag, found by
    *     a bounded-heap top-k ([[graft.plans.TopKPerKey]]) over the
    *     distinct (flag, price) pairs — no sort anywhere;
    *  2. n = full per-flag row count (map-side-combining agg) — the
    *     ONLY fact NTILE needs from the rows the filter drops;
    *  3. rows ≥ cutoff get the window. Because survivors are a
    *     prefix, row_number here equals row_number in the full table,
    *     and NTILE(4) over the FULL partition is pure arithmetic on
    *     (position i, count n): the first n%4 buckets hold
    *     ceil(n/4) rows, the rest floor(n/4).
    * Result is bit-identical to the direct form (the oracle is
    * unchanged; Q25PrefilterSpec asserts equivalence against the
    * plain-window formulation). The value-bucketed companion for
    * unbounded per-key volume remains [[q29QuantileBucket]]. */
  def q25NtileDenseRank(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
    val cutoffs = graft.plans.TopKPerKey(
        li.select("l_returnflag", "l_extendedprice").distinct(), 50,
        groupBy = Seq("l_returnflag"),
        orderBy = Seq(("l_extendedprice", true)))
      .groupBy("l_returnflag").agg(min("l_extendedprice").as("cutoff"))
    val counts = li.groupBy("l_returnflag").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("l_returnflag")
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
    li.join(broadcast(cutoffs), "l_returnflag")
      .filter(col("l_extendedprice") >= col("cutoff"))
      .withColumn("i", row_number().over(w).cast("long"))
      .withColumn("drank", dense_rank().over(w).cast("long"))
      .filter(col("drank") <= 50)
      .join(broadcast(counts), "l_returnflag")
      .withColumn("fsz", expr("n DIV 4"))
      .withColumn("rem", col("n") % 4)
      // ceil(a/b) as (a + b - 1) DIV b; the otherwise-branch divisor
      // is guarded with greatest(fsz, 1) — when fsz = 0 every row
      // falls in the when-branch, the guard only keeps ANSI division
      // total
      .withColumn("quartile",
        when(col("i") <= (col("fsz") + 1) * col("rem"),
          expr("(i + fsz) DIV (fsz + 1)"))
        .otherwise(col("rem") +
          expr("(i - (fsz + 1) * rem + greatest(fsz, 1) - 1) DIV greatest(fsz, 1)")))
      .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice",
        "quartile", "drank")
      .orderBy("l_returnflag", "drank", "l_orderkey", "l_linenumber")
  }

  /** q29: per-flag quartile bucketing, the 100-TB formulation of
    * [[q25NtileDenseRank]]'s quartiles. Two passes, neither sorting
    * the table:
    *  1. per-flag boundary values via `percentile_disc` — a
    *     partial-aggregating (map-side-combining) agg whose result
    *     is 3 rows × 3 doubles. DISCRETE percentiles on purpose:
    *     the boundary is an element OF the data (first value whose
    *     cume_dist ≥ p — the SQL-standard definition DuckDB's
    *     quantile_disc shares), so no interpolation arithmetic
    *     exists to drift by an ulp between engines;
    *  2. a BROADCAST range lookup bucketing every row map-side,
    *     then an ordinary two-phase count/sum per (flag, bucket).
    * Value-based buckets (not NTILE's positional tie-splitting), so
    * the per-row pass is embarrassingly parallel at any scale. */
  def q29QuantileBucket(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    // bounds via [[rankSelect]] (round 15): three percentile_disc
    // buffers → one bounded histogram + located-bucket pick,
    // bit-identical by [[discRank]]'s formula and RankSelectSpec
    val vals = li.where(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val groups = li.groupBy(col("l_returnflag").as("g"))
      .agg(count(col("l_extendedprice")).as("nv"))
    val ranks = groups.where(col("nv") > 0)
      .select(col("g"),
        explode(array(Seq("q1" -> 0.25, "q2" -> 0.5, "q3" -> 0.75).map {
          case (tg, p) =>
            struct(lit(tg).as("tag"), discRank(col("nv"), p).as("k"))
        }: _*)).as("t"))
      .select(col("g"), col("t.tag"), col("t.k"))
    val picked = rankSelect(vals, ranks)
      .groupBy("g").agg(
        max(when(col("tag") === "q1", col("v"))).as("q1"),
        max(when(col("tag") === "q2", col("v"))).as("q2"),
        max(when(col("tag") === "q3", col("v"))).as("q3"))
    // a group whose values are ALL NULL still owns a bounds row (the
    // aggregate form emitted one with NULL quantiles) — left join
    val bounds = groups.join(picked, Seq("g"), "left")
      .select(col("g").as("l_returnflag"), col("q1"), col("q2"), col("q3"))
    li.join(broadcast(bounds), "l_returnflag")
      .withColumn("bucket",
        when(col("l_extendedprice") <= col("q1"), 1L)
          .when(col("l_extendedprice") <= col("q2"), 2L)
          .when(col("l_extendedprice") <= col("q3"), 3L)
          .otherwise(4L))
      .groupBy("l_returnflag", "bucket")
      .agg(count(lit(1)).as("n_rows"),
        dsum(col("l_extendedprice")).as("sum_price"),
        max("l_extendedprice").as("max_price"))
      .orderBy("l_returnflag", "bucket")
  }

  /** q30: interval (range) join — the band-join operator Spark's
    * equi-join machinery doesn't cover natively (a bare
    * `ts BETWEEN lo AND hi` condition plans as BroadcastNestedLoop,
    * which dies when neither side broadcasts). The 100-TB shape is
    * BUCKETED: pick a bucket width W on the order of the interval
    * length, key events by `floor(ts/W)`, explode each interval into
    * the ≤ ⌈len/W⌉+1 buckets it touches, equi-join on the bucket key,
    * and keep the residual range predicate. Both sides shuffle
    * hash-partitioned on bucket — no broadcast requirement, no
    * nested loop; candidate volume is Σ_b |events_b|·|intervals_b|,
    * linear in the true overlap when intervals are bounded per
    * bucket. An event owns exactly ONE bucket, so no post-join dedup.
    *
    * The query: per (event_type, user-bucket) "first 10 minutes of
    * observed activity" windows, joined against the FULL event
    * stream — which events of any type landed inside each window. */
  def q30RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    val W = 10L * 60 * 1000 * 1000 // bucket width = interval length, µs
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    // % (not pmod): DuckDB's % takes the dividend's sign, and so does
    // Spark's — pmod would silently diverge on negative user_ids
    val intervals = ev
      .groupBy(col("event_type").as("itype"),
        (col("user_id") % lit(50L)).as("ub"))
      .agg(min(col("ts_us")).as("lo"))
      .withColumn("hi", col("lo") + W)
    // integer DIV, not floor(double /): µs values near 2^53/W bucket
    // boundaries must never round across them
    val left = ev.withColumn("bucket", expr(s"ts_us DIV ${W}L"))
    val right = intervals.withColumn("bucket",
      explode(sequence(expr(s"lo DIV ${W}L"), expr(s"(hi - 1) DIV ${W}L"))))
    left.join(right, Seq("bucket"))
      .where(col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
      .groupBy("itype", "ub", "lo", "hi")
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .orderBy("itype", "ub")
  }

  /** q31: correlated aggregate subquery — orders priced above their
    * customer's average. Decorrelated to one per-customer aggregate
    * + a keyed join back (the SQL-engine rewrite, written out); the
    * `price > avg` test is restated as `price·n > sum` so no
    * division ever happens — the comparison is exact decimal×integer
    * arithmetic, bit-identical in any engine.
    */
  /** q32: correlated LATERAL subquery — per-nation top-2 customers
    * by balance through Spark's LateralJoin planning (the DSv2-era
    * correlated-derived-table path, distinct from the window-rank
    * formulation q7/q25 exercise). Deterministic: the inner ORDER BY
    * carries the name tie-break. At scale the optimizer rewrites the
    * correlated limit into a join + per-key limit — same physics as
    * [[q26TopkExec]], arrived at from the SQL surface. */
  def q32LateralTopk(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "nation").createOrReplaceTempView("nation_v")
    t(spark, dir, "customer").createOrReplaceTempView("customer_v")
    spark.sql(
      """SELECT n.n_name, c.c_name, c.c_acctbal
        |FROM nation_v n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer_v
        |         WHERE c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) c
        |ORDER BY n.n_name, c.c_acctbal DESC, c.c_name""".stripMargin)
  }

  /** q33: RANGE-framed window — the trailing 30-day order-value sum
    * per customer. The frame is VALUE-based (calendar days, peers
    * included), not row-based like q8: order dates map to integer
    * day numbers first so the range bound is exact integer arithmetic
    * in any engine, and the windowed sum accumulates decimal partials
    * (order-free), casting to double only at the edge. Partitioned by
    * o_custkey — parallel in #customers at any scale, no global sort.
    */
  def q33RangeFrame(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)")
          .as("day_num"),
        d2dec(col("o_totalprice"), 4).as("dprice"))
    val w = Window.partitionBy("o_custkey").orderBy("day_num")
      .rangeBetween(-30, 0)
    o.select(col("o_orderkey"), col("o_custkey"), col("day_num"),
        col("dprice").cast("double").as("o_totalprice"),
        sum(col("dprice")).over(w).cast("double").as("trail30_value"),
        count(lit(1)).over(w).as("trail30_orders"))
      .orderBy("o_orderkey")
  }

  /** q34: conditional aggregation — the FILTER-clause family. One
    * hash aggregate over orders by priority: plain counts, filtered
    * counts/sums (`count(when)` compiles to the same partial-agg
    * shape as SQL's FILTER), a filtered DISTINCT (two-phase under the
    * same grouping key), and boolean aggregates (max/min over
    * booleans ≡ bool_or/bool_and). Map-side combined; the reduce side
    * is |priorities| rows. Decimal path for the money sum (§5). */
  def q34FilteredAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_orders"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        sum(when(col("o_orderstatus") === "F",
            d2dec(col("o_totalprice"), 4))).cast("double")
          .as("finished_value"),
        countDistinct(when(col("o_orderstatus") === "O", col("o_custkey")))
          .as("open_customers"),
        max(col("o_totalprice") > 300000.0).as("has_large"),
        min(col("o_totalprice") > 1000.0).as("all_above_1k"))
      .orderBy("o_orderpriority")
  }

  /** q35: fraction-based ranking windows — percent_rank ((rank−1)/
    * (N−1)) and cume_dist (peers≤current / N) per nation over
    * customer balances. Both are exact integer ratios evaluated in
    * one IEEE division, so the doubles cross engines bit-identically;
    * the custkey tie-break makes every rank deterministic. Parallel
    * in #partitions; a window partition pays one sort — the
    * semantics' price, mitigated at scale by the partition key's
    * cardinality (here nations — the q25 family's shape). */
  def q35PercentRank(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    c.select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy("c_custkey")
  }

  /** q36: ordered string aggregation (LISTAGG / string_agg) — the
    * per-group concatenation reports and exports lean on. The
    * aggregation order is pinned END-TO-END: a rank window (top-5 by
    * balance, custkey tie-break — WindowGroupLimit-planned like q26)
    * bounds each group's payload, and the concat joins
    * `collect_list(struct(rank, name))` AFTER an array_sort on the
    * rank — collect_list's arrival order never leaks into the
    * output, so the string crosses engines exactly. */
  def q36Listagg(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal").desc, col("c_custkey").asc)
    c.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_top"),
        expr("array_join(transform(array_sort(collect_list(" +
          "struct(rank, c_name))), s -> s.c_name), ',')").as("top_names"))
      .orderBy("c_nationkey")
  }

  /** q37: RUNNING DISTINCT COUNT — `COUNT(DISTINCT x) OVER (… ROWS
    * UNBOUNDED PRECEDING)`, the one windowed aggregate Spark's window
    * functions refuse outright (DISTINCT is unsupported inside a
    * window frame). Composed from two plain windows
    * sharing ONE hash exchange on the partition key: a row_number
    * over (custkey, priority → order date) marks each priority's
    * FIRST occurrence within the customer, and a running sum of that
    * 0/1 marker over (custkey → order date) IS the running distinct
    * count — first occurrences are exactly what a distinct counter
    * admits. The input is pre-partitioned on o_custkey ALONE:
    * hash(custkey) satisfies BOTH windows' clustering requirements
    * (the marker window's (custkey, priority) groups are subsets of
    * custkey partitions), so Catalyst plans one Exchange and two
    * sorts — left to itself it would key the first window's exchange
    * by (custkey, priority) and then pay a SECOND corpus shuffle to
    * re-key by custkey (the audit caught exactly that). All
    * arithmetic is integer; the orderkey tie-break pins same-day
    * orders to a total order, so every intermediate row is
    * deterministic cross-engine. */
  def q37RunningDistinct(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderpriority"),
        expr("CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)")
          .as("day_num"))
      .repartition(col("o_custkey"))
    val wFirst = Window.partitionBy("o_custkey", "o_orderpriority")
      .orderBy("day_num", "o_orderkey")
    val wRun = Window.partitionBy("o_custkey")
      .orderBy("day_num", "o_orderkey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.withColumn("is_first",
        when(row_number().over(wFirst) === 1, 1L).otherwise(0L))
      .select(col("o_orderkey"), col("o_custkey"), col("day_num"),
        sum(col("is_first")).over(wRun).as("distinct_priorities_so_far"))
      .orderBy("o_orderkey")
  }

  /** q38: MERGE / UPSERT semantics (SQL:2003 MERGE, Delta/Iceberg's
    * workhorse) — Spark core has no MERGE INTO over plain parquet, so
    * this states the standard composition: base FULL OUTER JOIN
    * changes on the key, matched rows take the change's values
    * (update), unmatched change rows enter (insert), unmatched base
    * rows carry forward (keep). The change set is derived
    * deterministically from the base so the oracle re-derives it:
    * every 7th order's status flips to 'X' with a 10% price bump
    * (update), and every 11th≡3 order re-enters under key+10¹³
    * (insert — the offset sits above any real orderkey up to
    * TPC-H SF ~1.6M ≈ 1.6 EB, so synthetic insert keys can never
    * collide with base keys and be mis-marked 'update'; the round-10
    * advice caught +10⁷ colliding from SF 2 up).
    *
    * Scale shape: ONE co-keyed shuffle — both sides hash-partition on
    * the merge key and sort-merge join (the full-outer join's only
    * honest physical form at scale; no broadcast requirement on
    * either side). Output volume = base + inserts. The price bump
    * routes through DECIMAL end-to-end (§5): a double ×1.1 rounded
    * at 2 lands exactly on half-cent ties where Spark's shortest-
    * decimal HALF_UP and a double-arithmetic round disagree — exact
    * decimal ×, decimal round, double only at the edge. */
  def q38MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val changes = t(spark, dir, "orders")
      .filter(col("o_orderkey") % 7 === 0 || col("o_orderkey") % 11 === 3)
      .select(
        when(col("o_orderkey") % 7 === 0, col("o_orderkey"))
          .otherwise(col("o_orderkey") + 10000000000000L).as("c_orderkey"),
        lit("X").as("c_status"),
        expr("CAST(round(CAST(o_totalprice AS DECIMAL(18,4)) * " +
          "CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE)").as("c_totalprice"))
    base.join(changes, col("o_orderkey") === col("c_orderkey"), "full_outer")
      .select(
        coalesce(col("o_orderkey"), col("c_orderkey")).as("orderkey"),
        coalesce(col("c_status"), col("o_orderstatus")).as("status"),
        coalesce(col("c_totalprice"), col("o_totalprice")).as("totalprice"),
        when(col("o_orderkey").isNull, "insert")
          .when(col("c_orderkey").isNull, "keep")
          .otherwise("update").as("action"))
      .orderBy("orderkey")
  }

  /** q39: CONTINUOUS (interpolated) percentiles — the companion to
    * q15/q29's discrete ones: percentile_cont picks
    * lo + (hi − lo)·frac between the two straddling elements, the
    * quantile definition BI tools default to. Probed before landing:
    * Spark's and DuckDB's interpolation produce bit-identical
    * doubles on this data (both compute pos = p·(n−1) and the same
    * two-term interpolation over identical parquet doubles); the
    * 1e-4 display rounding absorbs any future last-ulp divergence in
    * the engines' association order. One sort per group partition
    * (the exact-quantile price, q29's adjudication); reduce side =
    * |returnflags|.
    *
    * Round 15: the shared-array `percentile(col, array(…))` buffer
    * (itself a 3× win over three separate calls — SURVEY §17) is
    * replaced by the bounded [[rankSelect]] two-pass, which drops
    * the remaining value→count map entirely: the two straddling
    * order statistics per target come from the located-bucket pick,
    * and the interpolation below replays PercentileBase.getPercentile
    * term-for-term (position = (N−1)·p as double, lower/higher =
    * floor/ceil, the lower==higher and equal-values short-circuits,
    * then (higher−pos)·v_lo + (pos−lower)·v_hi in that association
    * order — verified against the Spark 4.1 bytecode), so the result
    * is bit-identical to the aggregate form before the 1e-4 display
    * rounding even touches it. */
  def q39PercentileCont(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val qs = Seq("25" -> 0.25, "50" -> 0.5, "75" -> 0.75)
    val groups = li.groupBy(col("l_returnflag").as("g"))
      .agg(count(lit(1)).as("n_rows"),
        count(col("l_extendedprice")).as("nv"))
    def pos(p: Double) = (col("nv") - 1).cast("double") * lit(p)
    val ranks = groups.where(col("nv") > 0)
      .select(col("g"), col("nv"),
        explode(array(qs.flatMap { case (tg, p) => Seq(
          struct(lit(s"lo$tg").as("tag"),
            (floor(pos(p)) + 1).as("k")),
          struct(lit(s"hi$tg").as("tag"),
            (ceil(pos(p)) + 1).as("k")))
        }: _*)).as("t"))
      .select(col("g"), col("t.tag"), col("t.k"))
    val vals = li.where(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val picked = rankSelect(vals, ranks).groupBy("g").agg(
      max(when(col("tag") === "lo25", col("v"))).as("vlo25"),
      max(when(col("tag") === "hi25", col("v"))).as("vhi25"),
      max(when(col("tag") === "lo50", col("v"))).as("vlo50"),
      max(when(col("tag") === "hi50", col("v"))).as("vhi50"),
      max(when(col("tag") === "lo75", col("v"))).as("vlo75"),
      max(when(col("tag") === "hi75", col("v"))).as("vhi75"))
    def qv(p: Double, vlo: org.apache.spark.sql.Column,
        vhi: org.apache.spark.sql.Column) = {
      val interp = (ceil(pos(p)).cast("double") - pos(p)) * vlo +
        (pos(p) - floor(pos(p)).cast("double")) * vhi
      round(when(ceil(pos(p)) === floor(pos(p)), vlo)
        .when(vhi === vlo, vlo).otherwise(interp), 4)
    }
    groups.join(picked, Seq("g"), "left")
      .select(col("g").as("l_returnflag"), col("n_rows"),
        qv(0.25, col("vlo25"), col("vhi25")).as("p25"),
        qv(0.5, col("vlo50"), col("vhi50")).as("p50"),
        qv(0.75, col("vlo75"), col("vhi75")).as("p75"))
      .orderBy("l_returnflag")
  }

  /** q40: deterministic MODE — the most frequent value per group.
    * Spark's and DuckDB's mode() both break frequency ties
    * ARBITRARILY (arrival order), so the mode is composed instead:
    * a (group, value) count aggregate, then a rank window ordered
    * (count desc, value asc) — every tie deterministic in any
    * engine. The window and the per-group total SHARE the group
    * partitioning over the |groups|×|values|-bounded aggregate (the
    * corpus crosses one map-combined shuffle; nothing downstream is
    * corpus-sized). share = one exact integer division. */
  def q40Mode(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("n").desc, col("o_orderpriority").asc)
    val wt = Window.partitionBy("o_orderstatus")
    counts
      .withColumn("rk", row_number().over(w))
      .withColumn("total", sum(col("n")).over(wt))
      .filter(col("rk") === 1)
      .select(col("o_orderstatus"),
        col("o_orderpriority").as("mode_priority"), col("n").as("n_mode"),
        col("total").as("n_group"),
        round(col("n").cast("double") / col("total").cast("double"), 6)
          .as("mode_share"))
      .orderBy("o_orderstatus")
  }

  def q31CorrelatedAgg(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val per = o.groupBy(col("o_custkey").as("k"))
      .agg(sum(d2dec(col("o_totalprice"), 4)).as("tot"),
        count(lit(1)).as("cnt"))
    o.join(per, col("o_custkey") === col("k"))
      .where(d2dec(col("o_totalprice"), 4) * col("cnt") > col("tot"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** q41: UNPIVOT — the inverse reshape of [[q23Pivot]]: a wide
    * per-(flag, status) aggregate melted into (group, measure, value)
    * long form, the shape metric stores and plotting layers ingest.
    * Spark's unpivot is the codegen'd `stack()` generator; it runs
    * over the |flags|×|status| AGGREGATE, so the corpus crosses
    * exactly ONE map-combined shuffle and the reshape itself never
    * touches corpus-sized data. Measures route through DECIMAL (§5);
    * the count widens to double exactly (n ≪ 2^53). */
  def q41Unpivot(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        count(lit(1)).cast("double").as("n_rows"))
      .selectExpr("l_returnflag", "l_linestatus",
        "stack(3, 'n_rows', n_rows, 'sum_price', sum_price, " +
          "'sum_qty', sum_qty) AS (measure, value)")
      .orderBy("l_returnflag", "l_linestatus", "measure")
  }

  /** q42: linear-regression aggregates — regr_slope / regr_intercept /
    * regr_r2 of price on quantity per return flag, the trend-line
    * family BI SQL ships natively. Spelled CLOSED-FORM over exact
    * DECIMAL power sums (Σx, Σy, Σxy, Σx², Σy² — all map-side
    * combined, reduce side = |flags|) instead of the engines'
    * regr_*(), which stream doubles in partition order and differ by
    * accumulation associativity run to run. The slope / intercept /
    * r² are then FIXED-ORDER IEEE arithmetic over bit-identical
    * doubles on both engines (the [[graft.operators.TextAnalysis]]
    * Zipf-fit recipe), rounded only at the display edge. */
  def q42Regr(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val sums = li.groupBy("l_returnflag").agg(
      count(lit(1)).cast("double").as("n"),
      dsum(col("l_quantity")).as("sx"),
      dsum(col("l_extendedprice")).as("sy"),
      dsumProd(col("l_quantity"), col("l_extendedprice")).as("sxy"),
      dsumProd(col("l_quantity"), col("l_quantity")).as("sxx"),
      dsumProd(col("l_extendedprice"), col("l_extendedprice")).as("syy"))
    val covN = col("n") * col("sxy") - col("sx") * col("sy")
    val varXN = col("n") * col("sxx") - col("sx") * col("sx")
    val varYN = col("n") * col("syy") - col("sy") * col("sy")
    val slope = covN / varXN
    sums.select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
        round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6).as("intercept"),
        round(covN * covN / (varXN * varYN), 6).as("r2"))
      .orderBy("l_returnflag")
  }

  /** q43: GAP FILL / forward fill (last observation carried forward)
    * — the IGNORE NULLS window family, the standard sparse-timeseries
    * densification (sensor readings, sparse prices). A deterministic
    * sparsity rule (orderkey % 3) plants the nulls; `filled` carries
    * the latest non-null observation forward within each customer's
    * order history, `prev_obs` is the previous observation exclusive
    * of the current row.
    *
    * Scale shape: ONE window exchange partitioned by the
    * high-cardinality customer key (both frames share the single
    * Sort+Window pair); per-partition frames are running — no
    * per-row rescans. Nothing aggregates; output = input rows. */
  def q43GapFill(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice")).as("observed"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    o.select(col("o_custkey"), col("o_orderkey"), col("observed"),
        last(col("observed"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("filled"),
        last(col("observed"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
          .as("prev_obs"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q46: LINEAR INTERPOLATION between observations — [[q43GapFill]]'s
    * forward fill upgraded to the timeseries-resample semantics:
    * a missing point takes prev + (next − prev)·(i − i_prev)/(i_next
    * − i_prev) over the per-customer row index, back-filling before
    * the first observation and forward-filling after the last. Both
    * neighbor values AND their row indices ride the SAME
    * Sort+Window pair (ignore-nulls last over the preceding frame,
    * ignore-nulls first over the following — one exchange, one sort,
    * one Window node); the blend is fixed-order IEEE arithmetic over
    * exact integers and the observed doubles, identical in the
    * oracle. */
  def q46Interpolate(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        when(col("o_orderkey") % 3 === 0, col("o_totalprice")).as("observed"))
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val rn = row_number().over(w).cast("long")
    val obsRn = when(col("observed").isNotNull, col("rn"))
    val base = o.withColumn("rn", rn)
    val prevF = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nextF = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val scored = base
      .withColumn("pv", last(col("observed"), ignoreNulls = true).over(prevF))
      .withColumn("pi", last(obsRn, ignoreNulls = true).over(prevF))
      .withColumn("nv", first(col("observed"), ignoreNulls = true).over(nextF))
      .withColumn("ni", first(obsRn, ignoreNulls = true).over(nextF))
    scored.select(col("o_custkey"), col("o_orderkey"), col("observed"),
        round(
          when(col("observed").isNotNull, col("observed"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("rn") - col("pi")).cast("double") /
              (col("ni") - col("pi")).cast("double")), 6)
          .as("interpolated"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q44: CUBE — completes the grouping-hierarchy trio beside
    * [[q11Rollup]] (prefix hierarchy) and [[q22GroupingSets]]
    * (explicit sets): all 2² margins of (flag, status) in one pass.
    * Spark plans cube as ONE Expand + ONE map-combined aggregate
    * (the corpus crosses a single shuffle carrying the 4× expanded
    * rows, reduce side = Σ margin cardinalities — grouping-bounded).
    * grouping_id disambiguates NULL-as-margin from NULL-as-value,
    * the same convention as q22. */
  def q44Cube(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"),
        grouping_id().cast("long").as("gid"))
      .select(col("l_returnflag"), col("l_linestatus"), col("gid"),
        col("n_rows"), col("sum_qty"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)
  }

  /** q45: INTERSECT / EXCEPT ALL — the set-op family beside
    * [[q10DistinctSetops]]' EXCEPT: nation keys present among BOTH
    * customers and suppliers (INTERSECT = distinct-both-sides
    * semi-shape; Spark plans a left-semi over two distincts), tagged
    * against the full distinct union so the output reports each
    * key's membership. One row per distinct key — every aggregate is
    * key-bounded. */
  def q45Intersect(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer").select(col("c_nationkey").as("nk")).distinct()
    val s = t(spark, dir, "supplier").select(col("s_nationkey").as("nk")).distinct()
    val both = c.intersect(s).withColumn("membership", lit("both"))
    val cOnly = c.except(s).withColumn("membership", lit("customer_only"))
    val sOnly = s.except(c).withColumn("membership", lit("supplier_only"))
    both.unionAll(cOnly).unionAll(sOnly).orderBy("nk")
  }

  /** q47: SALTED SKEW JOIN (round 11) — the canonical hot-key fix at
    * 100 TB, driven through the gate as result-equivalence: joining
    * the lineitem fact to a per-returnflag stats table keys the
    * shuffle on THREE values (maximal skew — every task but three
    * idles); salting APPENDS `l_orderkey % 16` to the fact's key and
    * EXPLODES the stats side ×16, so the same join runs over 48
    * near-uniform keys with 16-way parallelism per hot key. The
    * oracle computes the UNSALTED join — salting must be invisible in
    * the result, which is exactly the property that licenses it. The
    * `shuffle_hash` hint pins the shuffled plan (a broadcast would
    * dissolve the demo — and at real scale the stats side is only
    * broadcastable until it isn't). All flag-stat comparisons are
    * exact integers: quantity in cents, above-average as
    * qty·100·n_flag > total_cents. */
  def q47SaltedSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    val nSalt = 16
    val li = t(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"),
        (col("l_quantity") * 100).cast("long").as("qc"),
        pmod(col("l_orderkey"), lit(nSalt.toLong)).cast("int").as("salt"))
    val stats = li.groupBy(col("l_returnflag").as("f"))
      .agg(count(lit(1)).as("n_flag"), sum("qc").as("tot_cents"))
    val salted = stats.withColumn("salt",
      explode(lit((0 until nSalt).toArray)))
    li.join(salted.hint("shuffle_hash"),
        col("l_returnflag") === col("f") && li("salt") === salted("salt"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        count(when(col("qc") * col("n_flag") > col("tot_cents"), 1))
          .as("n_above_avg"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** q48: NULL-AWARE NOT IN (round 11) — the three-valued-logic trap
    * plain anti joins (q6) don't model: `x NOT IN (set)` is NULL (not
    * TRUE) when x is NULL, and when the set contains a NULL every
    * non-member comparison is NULL too — rows silently vanish
    * relative to NOT EXISTS. Here every 97th order's key is NULLed:
    * those rows must NOT survive. Spark plans this as a null-aware
    * anti join — a BROADCAST-only operator (no shuffled form exists,
    * because the one-NULL-poisons-everything rule needs the whole
    * build side everywhere): fine at any scale when the exclusion
    * set is dimension-sized, and the reason production pipelines
    * rewrite huge NOT INs to NOT EXISTS (q6's shape). */
  def q48NotInNullAware(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
      .withColumn("maybe_key",
        when(col("o_orderkey") % 97 === 0, lit(null).cast("long"))
          .otherwise(col("o_custkey")))
    o.createOrReplaceTempView("q48_orders")
    t(spark, dir, "customer").createOrReplaceTempView("q48_customer")
    o.sparkSession.sql(
      """SELECT o_orderstatus AS status, COUNT(*) AS n_rows,
        |  CAST(SUM(o_orderkey) AS BIGINT) AS key_checksum
        |FROM q48_orders
        |WHERE maybe_key NOT IN
        |  (SELECT c_custkey FROM q48_customer WHERE c_custkey % 5 = 0)
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** q49: the navigation-window family in one pass — lag/lead
    * (previous/next order-day gap per customer), first_value /
    * nth_value(2) over the customer's full frame, and cume_dist of
    * price within the customer. ONE hash exchange on o_custkey
    * satisfies every window (all partition by custkey; sorts differ
    * but re-sort is exchange-free); (day, orderkey) tie-break makes
    * every navigation deterministic. cume_dist is an exact small-int
    * rational — identical doubles in any engine. */
  def q49LeadLagWindows(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("day_num", "o_orderkey")
    val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrice = Window.partitionBy("o_custkey")
      .orderBy("o_totalprice", "o_orderkey")
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("CAST(unix_date(CAST(o_orderdate AS DATE)) AS BIGINT)").as("day_num"))
      .select(col("o_custkey"), col("o_orderkey"),
        (col("day_num") - lag("day_num", 1).over(w)).as("prev_gap_days"),
        (lead("day_num", 1).over(w) - col("day_num")).as("next_gap_days"),
        first("o_orderkey").over(wFull).as("first_order"),
        nth_value(col("o_orderkey"), 2).over(wFull).as("second_order"),
        round(cume_dist().over(wPrice), 6).as("price_cume_dist"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q50: EXCEPT ALL — bag semantics the q45 set ops deliberately
    * collapse: each customer's open-order multiset minus their
    * urgent-order multiset, multiplicity-exact (max(0, c₁−c₂) copies
    * survive — Spark plans a sort-based bag difference, the oracle
    * runs the ANSI operator). Output re-aggregated per key so the
    * gate compares multiplicities, not row order. */
  def q50ExceptAll(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val open = o.filter(col("o_orderstatus") === "O").select("o_custkey")
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select("o_custkey")
    open.exceptAll(urgent)
      .groupBy("o_custkey").agg(count(lit(1)).as("multiplicity"))
      .orderBy("o_custkey")
  }

  /** q51: fixed-width HISTOGRAM with data-driven bounds — the
    * two-pass profile shape (one row of bounds broadcast back, then
    * a map-side bucket assignment into a 20-row reduce). The bucket
    * index `least(19, floor((x−min)·20/(max−min)))` runs the SAME
    * IEEE ops in the same order on both engines — bit-identical
    * buckets without decimal detours. */
  def q51Histogram(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders")
    val bounds = o.agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    // denominator guarded like events_value_histogram: a degenerate
    // corpus with one distinct price must yield bucket 0 in BOTH
    // engines, not Spark-NaN→19 vs a DuckDB cast error
    o.crossJoin(broadcast(bounds))
      .select(least(lit(19L), floor((col("o_totalprice") - col("lo")) * 20
        // guard ONLY the degenerate equal-bounds case: the previous
        // greatest(range, 1.0) silently widened every sub-1.0 range
        // to 1.0, mis-bucketing rows while bucket_lo still labeled
        // with the true width (review catch; gate data never has
        // sub-1.0 price ranges, the fix is the contract)
        / when(col("hi") === col("lo"), lit(1.0))
          .otherwise(col("hi") - col("lo")))).as("bucket"),
        col("lo"), col("hi"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(first(col("lo")) + col("bucket") * (first(col("hi")) - first(col("lo"))) / 20, 4)
          .as("bucket_lo"))
      .orderBy("bucket")
  }

  /** q52: ARG-MAX / ARG-MIN (`max_by`/`min_by` — DuckDB `arg_max`/
    * `arg_min`) — "which row holds the extreme", the lookup OLAP
    * users otherwise pay a self-join or a rank window for; here ONE
    * hash aggregate, no join, no sort. Determinism is the whole
    * design: the ordering value is the composite
    * `acctbal_cents · 10¹² + custkey` — a single BIGINT that breaks
    * acctbal ties by key, so both engines must pick the same row
    * (bare max_by on a tied column is free to pick either). Cents
    * (≤ 10⁶ in magnitude) · 10¹² stays < 2⁶³; custkey < 10¹² is the
    * documented headroom (TPC-H SF10⁶ has 1.5·10¹¹ customers).
    * 100-TB shape: map-side partial max per segment, reduce side =
    * |segments| rows. */
  def q52ArgMinmax(spark: SparkSession, dir: String): DataFrame = {
    // cents through the decimal parity path (dsum's recipe): the
    // 2-dp double → decimal(18,4) conversion is exact, ×100 exact,
    // → integral long — no round() half-case to diverge on
    val cents = (d2dec(col("c_acctbal"), 4) * 100).cast("long")
    t(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_name"), cents.as("cents"),
        (cents * lit(1000000000000L) + col("c_custkey")).as("ord"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
        expr("max_by(c_name, ord)").as("top_name"),
        expr("max_by(cents, ord)").as("top_acctbal_cents"),
        expr("min_by(c_name, ord)").as("bottom_name"),
        expr("min_by(cents, ord)").as("bottom_acctbal_cents"))
      .orderBy("c_mktsegment")
  }

  /** q54: APPROXIMATE QUANTILES, tolerance-gated (the q14 recipe
    * applied to the quantile sketch): `approx_percentile` (Greenwald-
    * Khanna) promises RANK error ≤ n/accuracy, so the checkable
    * contract is "the estimate lies between the exact order
    * statistics at rank q ± 2/accuracy" (double the promised bound —
    * the gate checks the sketch works, not its worst-case constant).
    * The query emits the exact discrete bracket bounds (elements OF
    * the data — cross-engine exact) plus the in-bracket verdicts; the
    * oracle recomputes the bounds and pins the verdicts TRUE. At
    * 100 TB you run ONLY the sketch (fixed-size state, one pass,
    * mergeable) — the exact brackets here are the measuring stick,
    * like q14's exact distincts (q15/q29 own exact quantiles). */
  def q54ApproxQuantile(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    // ONE aggregate pass owns the sketches + counts; the four exact
    // bracket bounds come from [[rankSelect]] (round 15 — the four
    // percentile_disc buffers each rebuilt, reshuffled and re-sorted
    // the same value→count map; the two-pass rank select replaces
    // them with a bounded histogram + a ~0.4% row_number pass,
    // bit-identical by [[discRank]]'s formula and RankSelectSpec).
    val agg = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        count(col("l_extendedprice")).as("nv"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("a90"))
    val ranks = agg.where(col("nv") > 0)
      .select(col("l_returnflag").as("g"),
        explode(array(Seq(
          "lo50" -> 0.498, "hi50" -> 0.502,
          "lo90" -> 0.898, "hi90" -> 0.902).map { case (tg, p) =>
          struct(lit(tg).as("tag"), discRank(col("nv"), p).as("k"))
        }: _*)).as("t"))
      .select(col("g"), col("t.tag"), col("t.k"))
    val vals = li.where(col("l_extendedprice").isNotNull)
      .select(col("l_returnflag").as("g"), col("l_extendedprice").as("v"))
    val picked = rankSelect(vals, ranks)
    val bounds = picked.groupBy(col("g").as("l_returnflag")).agg(
      max(when(col("tag") === "lo50", col("v"))).as("lo50"),
      max(when(col("tag") === "hi50", col("v"))).as("hi50"),
      max(when(col("tag") === "lo90", col("v"))).as("lo90"),
      max(when(col("tag") === "hi90", col("v"))).as("hi90"))
    agg.join(bounds, Seq("l_returnflag"), "left")
      .select(col("l_returnflag"), col("n"),
        col("lo50"), col("hi50"), col("lo90"), col("hi90"),
        (col("a50") >= col("lo50") && col("a50") <= col("hi50"))
          .as("p50_in_bracket"),
        (col("a90") >= col("lo90") && col("a90") <= col("hi90"))
          .as("p90_in_bracket"))
      .orderBy("l_returnflag")
  }

  /** q53: BITWISE AGGREGATES (`bit_and`/`bit_or`/`bit_xor`) + the
    * boolean pair (`bool_and`/`bool_or`) — flag-mask rollups (ACL
    * unions, feature-bit intersections, parity checksums) that OLAP
    * engines ship as first-class aggregates. All pure integer/boolean
    * monoids: map-side combine, reduce side = |flags| rows,
    * bit-identical in any engine at any partitioning (each op is
    * commutative + associative). */
  def q53BitAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("bit_and(CAST(l_linenumber AS BIGINT))").as("and_linenumber"),
        expr("bit_or(CAST(l_linenumber AS BIGINT))").as("or_linenumber"),
        expr("bit_xor(l_orderkey)").as("xor_orderkey"),
        expr("bool_and(l_quantity >= 1.0)").as("all_qty_ge1"),
        expr("bool_or(l_discount > 0.09)").as("any_deep_discount"))
      .orderBy("l_returnflag")

  /** q55: GAPS-AND-ISLANDS (round 14) — the classic consecutive-run
    * detection SQL interviewers and retention analysts both reach
    * for: per customer, the runs of CONSECUTIVE order days (an
    * "island" = a maximal streak of day-adjacent orders). The
    * canonical trick is fully declarative: within each customer,
    * `day − row_number()` is CONSTANT exactly along a consecutive
    * run, so islands fall out of one partitioned window plus one
    * aggregate — no iteration, no self-join.
    *
    * Scale shape: the window partitions by o_custkey (never a global
    * row_number — a single-task sort at 100 TB); the two stacked
    * aggregates both group on a superset of the window's hash key,
    * so rows exchange ONCE and the aggregates run partition-local.
    * All-integer output (counts and day runs). */
  def q55GapsIslands(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy("day")
    val days = t(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("day"))
      .distinct()
    days
      .withColumn("grp", date_sub(col("day"), row_number().over(w)))
      .groupBy("o_custkey", "grp")
      .agg(count(lit(1)).as("run"))
      .groupBy("o_custkey")
      .agg(sum("run").as("n_days"), count(lit(1)).as("n_islands"),
        max("run").as("max_streak"))
      .orderBy("o_custkey")
  }
}
