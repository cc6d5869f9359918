package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data pipelines.
  *
  * Builtins-first: everything here composes codegen'd
  * `org.apache.spark.sql.functions` (no UDFs), so the expressions stay
  * inside whole-stage codegen and are reproducible in the DuckDB
  * oracle. All arithmetic is engine-portable (integer or IEEE-754
  * double with a fixed evaluation order).
  */
object TextFunctions {

  /** Whitespace-token count via pure length arithmetic (single-space
    * separated corpora; see `reTokens` for the regex form). */
  def wsTokens(text: Column): Column =
    (length(text) - length(regexp_replace(text, " ", "")) + 1).cast("long")

  /** Regex word tokens (letters/digits runs). */
  def reTokens(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z0-9]+"), lit(0))).cast("long")

  /** BPE-ish token-count estimate: ~4 chars/token heuristic. */
  def bpeTokensEst(text: Column): Column =
    ceil(length(text) / lit(4.0)).cast("long")

  /** Count of tokens belonging to a fixed marker set. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(split(text, " "), w => w.isInCollection(markers))).cast("long")

  /** Mean word length: non-space chars / tokens (double, fixed order). */
  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("double") / wsTokens(text)

  /** Stopword ratio against a fixed English stopword list. */
  val EnStop = Seq("the", "a", "of", "and", "to", "in")
  def stopwordRatio(text: Column): Column =
    markerHits(text, EnStop).cast("double") / wsTokens(text)

  /** Deterministic quality score in (0,1): length saturation ×
    * (1 − stopword share). Rational arithmetic only — no exp/log whose
    * libm bits differ across engines. */
  def qualityScore(text: Column): Column = {
    val t = wsTokens(text).cast("double")
    round((t / (t + lit(50.0))) * (lit(1.0) - stopwordRatio(text)), 6)
  }

  /** Polynomial document fingerprint over the normalized text:
    * h_i = (h_{i-1} * 31 + ascii(char_i)) mod 1e9+7 — left fold, exact
    * 64-bit-safe integer arithmetic, identical in any engine. */
  def fingerprint(text: Column): Column = {
    val norm = lower(trim(text))
    aggregate(
      sequence(lit(1), length(norm)),
      lit(0L),
      (acc, i) => (acc * 31 + ascii(substring(norm, i, lit(1)))) % 1000000007L)
  }

  private def substring(c: Column, pos: Column, len: Column): Column =
    org.apache.spark.sql.functions.substring(c, pos, len)

  /** Word n-grams as an array column (empty when too few words). */
  def wordNgrams(text: Column, n: Int): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*)))
      .otherwise(array())
  }

  /** Language-ID by marker-word voting (n-gram/stopword heuristic).
    * Ties break by fixed precedence en > es > de > fr. */
  val Markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "les"))

  def langHits(text: Column, lang: String): Column = markerHits(text, Markers(lang))

  def predictedLang(text: Column): Column = {
    val en = langHits(text, "en"); val es = langHits(text, "es")
    val de = langHits(text, "de"); val fr = langHits(text, "fr")
    when(en >= es && en >= de && en >= fr && en > 0, "en")
      .when(es >= de && es >= fr && es > 0, "es")
      .when(de >= fr && de > 0, "de")
      .when(fr > 0, "fr")
      .otherwise("und")
  }
}
