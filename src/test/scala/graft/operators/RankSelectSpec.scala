package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Tables.t

/** The round-15 [[Relational.rankSelect]] rewrites of q54/q29/q39 must
  * equal the percentile_disc / percentile AGGREGATE forms bit-for-bit
  * — the two-pass plans are pure reformulations (the rank formula
  * k = ceil(N.toDouble·p) and the (higher−pos)·lo + (pos−lower)·hi
  * interpolation replay PercentileBase/PercentileDisc exactly), never
  * approximations. Checked on the real tables at two SFs and on
  * planted degenerate shapes (ties, integral p·n positions, single
  * rows, all-NULL groups). */
class RankSelectSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def q54Plain(dir: String) = {
    def pd(p: Double) =
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY l_extendedprice)")
    t(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.9, 1000)").as("a90"),
        pd(0.498).as("lo50"), pd(0.502).as("hi50"),
        pd(0.898).as("lo90"), pd(0.902).as("hi90"))
      .select(col("l_returnflag"), col("n"),
        col("lo50"), col("hi50"), col("lo90"), col("hi90"),
        (col("a50") >= col("lo50") && col("a50") <= col("hi50"))
          .as("p50_in_bracket"),
        (col("a90") >= col("lo90") && col("a90") <= col("hi90"))
          .as("p90_in_bracket"))
      .orderBy("l_returnflag")
  }

  private def q29Plain(dir: String) = {
    import graft.Tables.dsum
    val li = t(spark, dir, "lineitem")
    def pd(p: Double) =
      expr(s"percentile_disc($p) WITHIN GROUP (ORDER BY l_extendedprice)")
    val bounds = li.groupBy("l_returnflag")
      .agg(pd(0.25).as("q1"), pd(0.5).as("q2"), pd(0.75).as("q3"))
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

  private def q39Plain(dir: String) =
    t(spark, dir, "lineitem").groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D))").as("pcs"))
      .select(col("l_returnflag"), col("n_rows"),
        round(element_at(col("pcs"), 1), 4).as("p25"),
        round(element_at(col("pcs"), 2), 4).as("p50"),
        round(element_at(col("pcs"), 3), 4).as("p75"))
      .orderBy("l_returnflag")

  test("q54/q29/q39 two-pass forms equal the aggregate forms at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      assert(Relational.q54ApproxQuantile(spark, dir).collect().map(_.toSeq).toSeq ===
        q54Plain(dir).collect().map(_.toSeq).toSeq, s"q54 $dir")
      assert(Relational.q29QuantileBucket(spark, dir).collect().map(_.toSeq).toSeq ===
        q29Plain(dir).collect().map(_.toSeq).toSeq, s"q29 $dir")
      assert(Relational.q39PercentileCont(spark, dir).collect().map(_.toSeq).toSeq ===
        q39Plain(dir).collect().map(_.toSeq).toSeq, s"q39 $dir")
    }
  }

  test("degenerate shapes: ties, integral p·n, single row, two rows, all-NULL group") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rankdeg").toString
    // group A: n=10 distinct (0.5·10 = 5.0 integral — the ceil
    //   boundary PercentileDisc hits with position == position.toLong);
    // group B: massive tie (every rank lands in one histogram bucket);
    // group C: single row; group D: two rows (interpolation frac ≠ 0);
    // group E: all NULL (row present, NULL stats);
    // group F: n=20 with duplicates straddling rank targets.
    val rows =
      (1 to 10).map(i => ("A", Some(i.toDouble))) ++
        Seq.fill(8)(("B", Some(42.0))) ++
        Seq(("C", Some(3.14))) ++
        Seq(("D", Some(1.0)), ("D", Some(2.0))) ++
        Seq(("E", None), ("E", None)) ++
        (1 to 20).map(i => ("F", Some((i / 3).toDouble)))
    rows.toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    assert(Relational.q54ApproxQuantile(spark, dir).collect().map(_.toSeq).toSeq ===
      q54Plain(dir).collect().map(_.toSeq).toSeq, "q54 degenerate")
    assert(Relational.q29QuantileBucket(spark, dir).collect().map(_.toSeq).toSeq ===
      q29Plain(dir).collect().map(_.toSeq).toSeq, "q29 degenerate")
    assert(Relational.q39PercentileCont(spark, dir).collect().map(_.toSeq).toSeq ===
      q39Plain(dir).collect().map(_.toSeq).toSeq, "q39 degenerate")
  }

  test("skew guard: oversized buckets refine (tie shortcut + 2nd histogram) bit-green") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("rankskew").toString
    // Planted so that with refineThreshold=50 every refined path runs:
    // group G: near-CONSTANT column — 500 copies of 7.0 plus one 1e9
    //   outlier stretches [lo,hi] so bucket 0 holds all 500 tied rows
    //   (> 50 ⇒ oversized; vmin == vmax ⇒ tie shortcut answers);
    // group H: outlier-stretched NON-tied — 500 distinct values in
    //   [0,0.5) all land in bucket 0 (> 50, vmin ≠ vmax ⇒ second
    //   histogram level + sub-bucket row_number);
    // group I: 30 spread rows (≤ 50 ⇒ the small/united path);
    // group J: 300 ties at 5.0 + 300 near-ties within one level-1
    //   bucket (vmin ≠ vmax; refined sub-bucket still holds the tied
    //   mass — the documented one-level bound, must stay correct).
    val rows =
      (Seq.fill(500)(("G", 7.0)) :+ (("G", 1e9))) ++
        ((0 until 500).map(i => ("H", i * 0.001)) :+ (("H", 1e9))) ++
        (1 to 30).map(i => ("I", i * 10.0)) ++
        (Seq.fill(300)(("J", 5.0)) ++ (1 to 300).map(i => ("J", 5.0 + i * 1e-13)))
    rows.toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val key = "spark.graft.rankselect.refineThreshold"
    val prior = spark.conf.getOption(key)
    try {
      for (threshold <- Seq("50", (4 << 20).toString)) {
        spark.conf.set(key, threshold)
        assert(Relational.q54ApproxQuantile(spark, dir).collect().map(_.toSeq).toSeq ===
          q54Plain(dir).collect().map(_.toSeq).toSeq, s"q54 skew t=$threshold")
        assert(Relational.q29QuantileBucket(spark, dir).collect().map(_.toSeq).toSeq ===
          q29Plain(dir).collect().map(_.toSeq).toSeq, s"q29 skew t=$threshold")
        assert(Relational.q39PercentileCont(spark, dir).collect().map(_.toSeq).toSeq ===
          q39Plain(dir).collect().map(_.toSeq).toSeq, s"q39 skew t=$threshold")
      }
    } finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
