package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: every declared query runs and yields a sane result at
  * sf0.001 (the correctness gate itself is driver-run DuckDB parity —
  * see tools/parity.py). */
class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("entry flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys all exist in queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries) {
    test(s"query $name runs at sf0.001") {
      val df = fn(spark, dir)
      assert(df.columns.nonEmpty)
      // q6/q10-style anti/except queries may legitimately be empty
      assert(df.count() >= 0)
    }
  }
}
