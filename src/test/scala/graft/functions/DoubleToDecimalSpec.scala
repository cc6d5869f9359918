package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Bit-equality gate for the round-16 fast decimal path (the dsum /
  * dsumProd tax): [[DoubleToDecimal18Expr]] must equal
  * `cast(d AS decimal(18,s))` and [[DecimalProd18Expr]] must equal
  * `cast(a AS decimal(18,6)) * cast(b AS decimal(18,6))` for EVERY
  * in-range double — including the adversarial classes the verdict
  * demanded: >4-decimal inputs, half-up ties at the scale boundary,
  * last-ulp neighbors, 17-significant-digit values, subnormals, ±0.0
  * — and must FAIL LOUDLY (like the ANSI Cast it replaces, Spark 4's
  * session default) on NaN/±Inf/precision overflow. Checked three
  * ways: the Catalyst plans (codegen path), the interpreted eval path
  * via literals, and a direct unscaled-vs-BigDecimal replay over a
  * 2M-value random sweep. */
class DoubleToDecimalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** In-range at decimal(18,6): |v| < 1e12 after rounding. */
  private def inRange: Seq[Double] = {
    val specials = Seq(
      0.0, -0.0, 1.0, -1.0,
      // >4-decimal inputs (the dsum scale is 4)
      0.123456789, 12.3456789012345, 0.00005, 0.000049999999999,
      // half-up ties exactly at the 4th/6th decimal
      0.12345, -0.12345, 2.5e-4, -2.5e-4, 0.1234565, 0.0000005, -0.0000005,
      // tie-looking doubles whose toString settles the direction
      0.12344999999999999, 0.12345000000000001,
      // 17 significant digits / last-ulp neighbors
      math.nextUp(0.12345), math.nextDown(0.12345),
      math.nextUp(1.0), math.nextDown(1.0),
      0.1 + 0.2, 1.0 / 3.0, 2.0 / 3.0, math.Pi, math.E,
      // just under the decimal(18,6) bound (12 integer digits)
      9.99999e11, math.nextDown(1e12) - 1e6, -9.99999e11,
      // tiny / subnormal
      1e-300, java.lang.Double.MIN_VALUE, math.nextUp(java.lang.Double.MIN_VALUE),
      4.9e-324, 1e-5, 5e-5, 4.99999e-5)
    val rnd = new scala.util.Random(20260818L)
    val randoms = Seq.fill(6000) {
      rnd.nextInt(3) match {
        case 0 => rnd.nextDouble() * 1e5
        case 1 => (rnd.nextDouble() - 0.5) * 2e11
        case 2 => math.pow(10, rnd.nextInt(40) - 30) * (rnd.nextDouble() - 0.5)
      }
    }
    specials ++ randoms
  }

  test("DoubleToDecimal18Expr equals cast(double as decimal(18,s)) — codegen plan") {
    for (s <- Seq(0, 4, 6)) {
      val df = inRange.toDF("d")
      val rows = df.select(
        GraftExpressions.doubleToDecimal18(col("d"), s).as("fast"),
        col("d").cast(DecimalType(18, s)).as("slow"),
        col("d")).collect()
      rows.foreach { r =>
        assert(r.getDecimal(0) === r.getDecimal(1),
          s"value mismatch at scale $s for d=${r.get(2)}")
      }
    }
  }

  test("DecimalProd18Expr equals cast*cast at (18,6) — codegen plan") {
    val vals = inRange
    val pairs = vals.zip(vals.reverse) ++ vals.map(v => (v, 1.0 - 0.05)) ++
      Seq((9.99999e11, 9.99999e11), (-9.99999e11, 9.99999e11),
        (123456.654321, -98765.4321098))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
      GraftExpressions.decimalProd18(col("a"), col("b")).as("fast"),
      (col("a").cast(DecimalType(18, 6)) * col("b").cast(DecimalType(18, 6))).as("slow"),
      col("a"), col("b")).collect()
    rows.foreach { r =>
      assert(r.getDecimal(0) === r.getDecimal(1),
        s"value mismatch for (${r.get(2)}, ${r.get(3)})")
    }
  }

  test("unscaled() replays BigDecimal.valueOf().setScale(HALF_UP) over a 2M random sweep") {
    val rnd = new scala.util.Random(0xD15EA5E)
    var i = 0
    while (i < 2000000) {
      val d = rnd.nextInt(5) match {
        case 0 => rnd.nextDouble() * 1e6
        case 1 => (rnd.nextDouble() - 0.5) * 2e15
        case 2 => java.lang.Double.longBitsToDouble(rnd.nextLong()) // any bit pattern
        case 3 => math.pow(10, rnd.nextInt(80) - 40) * (rnd.nextDouble() - 0.5)
        case 4 => rnd.nextLong() / 1e4 // many exact 4-decimal values + ties
      }
      if (!d.isNaN && !d.isInfinite) {
        for (s <- Seq(4, 6)) {
          val bd = java.math.BigDecimal.valueOf(d).setScale(s, java.math.RoundingMode.HALF_UP)
          val expected =
            if (bd.precision() > 18) Long.MinValue else bd.unscaledValue().longValue()
          val got = DoubleToDecimal18Expr.unscaled(d, s)
          assert(got === expected, s"unscaled($d, $s)")
        }
      }
      i += 1
    }
  }

  test("NaN/Inf/overflow agree with the ANSI cast: both throw, or both return the same") {
    def outcome(f: => Array[org.apache.spark.sql.Row]): Either[String, Seq[Any]] =
      try Right(f.toSeq.map(r => if (r.isNullAt(0)) null else r.getDecimal(0)))
      catch { case e: Throwable => Left("threw") }
    for (d <- Seq(1e14, -1e14, 1e200, 999999999999.999999, Double.NaN,
        java.lang.Double.POSITIVE_INFINITY, java.lang.Double.NEGATIVE_INFINITY)) {
      val slow = outcome(Seq(d).toDF("d")
        .select(col("d").cast(DecimalType(18, 4))).collect())
      val fast = outcome(Seq(d).toDF("d")
        .select(GraftExpressions.doubleToDecimal18(col("d"), 4)).collect())
      assert(fast === slow, s"outcome mismatch for d=$d")
    }
  }

  test("interpreted eval path (literals, no codegen) agrees too") {
    for (d <- Seq(0.12345, -0.12345, 0.1 + 0.2, 123.00005, -9.99999e11)) {
      val r = spark.range(1).select(
        GraftExpressions.doubleToDecimal18(lit(d), 4).as("fast"),
        lit(d).cast(DecimalType(18, 4)).as("slow")).collect()(0)
      assert(r.getDecimal(0) === r.getDecimal(1), s"d=$d")
    }
  }

  test("dsum/dsumProd over planted adversarial rows match their round-15 cast forms") {
    import graft.Tables
    import org.apache.spark.sql.types.DecimalType
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(20000)(i =>
      (i % 7, rnd.nextDouble() * 99999.99, rnd.nextDouble())) ++
      Seq((0, 0.12345, 0.99995), (1, 0.00005, 0.00005), (2, -0.12345, 1.0))
    val df = rows.toDF("g", "price", "disc")
    val fast = df.groupBy("g").agg(
      Tables.dsum(col("price")).as("s"),
      Tables.dsumProd(col("price"), lit(1.0) - col("disc")).as("p"))
    val slow = df.groupBy("g").agg(
      sum(col("price").cast(DecimalType(18, 4))).cast("double").as("s"),
      sum(col("price").cast(DecimalType(18, 6)) *
        (lit(1.0) - col("disc")).cast(DecimalType(18, 6)))
        .cast(DecimalType(28, 6)).cast("double").as("p"))
    val f = fast.orderBy("g").collect()
    val sl = slow.orderBy("g").collect()
    assert(f.length === sl.length)
    f.zip(sl).foreach { case (a, b) =>
      assert(a.getDouble(1) === b.getDouble(1), s"dsum g=${a.get(0)}")
      assert(a.getDouble(2) === b.getDouble(2), s"dsumProd g=${a.get(0)}")
    }
  }
}
