package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The one-pass char-class census must be EXACTLY the regexp
  * formulation it replaces — on the real corpus and on adversarial
  * inputs (non-ASCII multi-byte chars, empty-ish strings, real code
  * text). The regex semantics being pinned: n_symbols counts every
  * char outside [A-Za-z0-9 ] (so a multi-byte char counts ONCE),
  * n_digits [0-9], n_code the brace/bracket/operator set. */
class CharClassCountsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def regexFormulation(df: org.apache.spark.sql.DataFrame) = {
    val txt = col("text")
    def removed(re: String) =
      (length(txt) - length(regexp_replace(txt, re, ""))).cast("long")
    df.select(col("id"),
      length(txt).cast("long").as("n_chars"),
      removed("[^A-Za-z0-9 ]").as("n_symbols"),
      removed("[0-9]").as("n_digits"),
      removed("[{}()\\[\\];=<>]").as("n_code"))
  }

  private def exprFormulation(df: org.apache.spark.sql.DataFrame) = {
    val c = GraftExpressions.charClassCounts(col("text"))
    df.select(col("id"), c.as("c"))
      .select(col("id"), col("c.n_chars").as("n_chars"),
        col("c.n_symbols").as("n_symbols"),
        col("c.n_digits").as("n_digits"), col("c.n_code").as("n_code"))
  }

  private def assertEqual(df: org.apache.spark.sql.DataFrame): Unit = {
    val diff = exprFormulation(df).exceptAll(regexFormulation(df))
      .unionAll(regexFormulation(df).exceptAll(exprFormulation(df)))
    assert(diff.count() === 0L)
  }

  test("adversarial inputs: unicode, code text, punctuation-only, single space") {
    val df = Seq(
      (1L, "def f(x): return x[0] + {1: 2}"),
      (2L, "café naïve 中文 😀"), // 2- and 3-byte chars + a surrogate-pair emoji
      (3L, ";;;==<<>>"),
      (4L, " "),
      (5L, "abc 123 XYZ"),
      (6L, "tab\tand\nnewline")).toDF("id", "text")
    assertEqual(df)
  }

  test("real corpus: expression == regex formulation on every sf0.001 document") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id").as("id"), col("text"))
    assertEqual(df)
  }

  test("is_code verdict: code trips it, prose doesn't (the textCodeDetect contract)") {
    val df = Seq(
      (1L, "for (int i = 0; i < n; i++) { a[i] = f(b[i]); }"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("id", "text")
    val r = exprFormulation(df).collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[Long]("n_symbols"), x.getAs[Long]("n_chars"),
          x.getAs[Long]("n_code")))).toMap
    val (s1, c1, k1) = r(1L)
    assert(s1 * 10 >= c1 || k1 * 50 >= c1, "code must trip the verdict")
    val (s2, c2, k2) = r(2L)
    assert(!(s2 * 10 >= c2 || k2 * 50 >= c2), "prose must not")
  }
}
