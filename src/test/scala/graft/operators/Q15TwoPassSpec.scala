package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.Tables.t

/** q15's two-pass histogram-refinement quantiles must equal the plain
  * single-pass `percentile` aggregate bit-for-bit after the shared
  * round(4) — the buffer-bounded plan is a pure reformulation, not an
  * approximation. */
class Q15TwoPassSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plainForm(dir: String) =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"))
      .orderBy("l_returnflag")

  test("two-pass quantiles equal the percentile aggregate at sf0.001 and sf0.01") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val twoPass = Relational.q15Quantiles(spark, dir).collect().map(_.toSeq)
      val plain = plainForm(dir).collect().map(_.toSeq)
      assert(twoPass.toSeq === plain.toSeq, dir)
    }
  }

  test("degenerate groups: single value, all-equal tie, two values, all-NULL group") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q15deg").toString
    Seq(
      ("A", Some(5.0)), // single value: every quantile = it
      ("B", Some(7.0)), ("B", Some(7.0)), ("B", Some(7.0)), ("B", Some(7.0)),
      ("C", Some(1.0)), ("C", Some(2.0)), // frac interpolation
      ("D", None), ("D", None) // all-NULL group: present, NULL quantiles
    ).toDF("l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = Relational.q15Quantiles(spark, dir).collect()
      .map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        if (r.isNullAt(3)) null else r.getDouble(3)))
    assert(got === Array(
      ("A", 5.0, 5.0, 5.0),
      ("B", 7.0, 7.0, 7.0),
      ("C", 1.25, 1.5, 1.75),
      ("D", null, null, null)))
  }
}
