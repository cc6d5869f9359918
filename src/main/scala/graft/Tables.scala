package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Parquet table loaders + oracle-parity helpers.
  *
  * Parity rules (see SURVEY.md §5): any aggregate over doubles goes
  * through exact decimal arithmetic in BOTH the Spark query and the
  * DuckDB oracle SQL, so that floating-point summation order (which
  * differs across engines and across partitionings) can never change
  * the result bits.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet's `ts` arrives in two physical vintages:
    * TIMESTAMP(NANOS) (which Spark 4 rejects unless read as long —
    * older driver testdata and ScaleTables output) and plain
    * timestamp[us]. Normalize BOTH to µs TimestampType — the type
    * every query and oracle has always seen (the nanos data is
    * µs-aligned — verified: no sub-µs bits at any SF; the ntz→ltz
    * cast is the identity on the stored micros under the UTC session
    * timezone every entry point pins). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  /** Exact sum of a double column: cast to decimal(18,4), sum
    * exactly, back to double. Deterministic across engines.
    * Round 16: the cast is [[graft.functions.GraftExpressions.doubleToDecimal18]]
    * — bit-identical to `cast(c as decimal(18,4))` (DoubleToDecimalSpec)
    * without the per-row BigDecimal parse, and compact-long-backed so
    * the sum stays on Decimal's long add fast path. */
  def dsum(c: Column): Column =
    sum(graft.functions.GraftExpressions.doubleToDecimal18(c, 4)).cast("double")

  /** Exact revenue-style product sum: both factors to decimal(18,6),
    * exact decimal multiply + sum. The sum (scale 12) is rescaled to
    * decimal(28,6) BEFORE the double cast: at scale 6 the unscaled
    * value stays < 2^53, so the decimal→double conversion is a single
    * correctly-rounded step in every engine (DuckDB's scale-12 path
    * double-rounds via hugeint→double → 1-ulp mismatches).
    * Round 16: cast+cast+multiply fused into
    * [[graft.functions.GraftExpressions.decimalProd18]] — bit-identical
    * (DoubleToDecimalSpec) with the two BigDecimal string parses and
    * the MathContext multiply replayed in long arithmetic. */
  def dsumProd(a: Column, b: Column): Column =
    sum(graft.functions.GraftExpressions.decimalProd18(a, b))
      .cast(DecimalType(28, 6)).cast("double")
}
