package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic checks for the round-6 additions beyond driver parity:
  * the bucketed range join must equal the naive inequality join
  * bit-for-bit (bucketing is an execution strategy, not a semantic),
  * and BM25 must rank by the textbook scoring function. */
class RangeJoinBm25Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("bucketed range join equals the naive inequality join") {
    val bucketed = Relational.q30RangeJoin(spark, dir)
    // naive reference: the same intervals joined by the raw range
    // predicate (BroadcastNestedLoop at this scale — fine for a spec)
    val W = 10L * 60 * 1000 * 1000
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
    val intervals = ev
      .groupBy(col("event_type").as("itype"),
        pmod(col("user_id"), lit(50L)).as("ub"))
      .agg(min(col("ts_us")).as("lo"))
      .withColumn("hi", col("lo") + W)
    val naive = ev.join(intervals,
        col("ts_us") >= col("lo") && col("ts_us") < col("hi"))
      .groupBy("itype", "ub", "lo", "hi")
      .agg(count(lit(1)).as("n_events"),
        graft.Tables.dsum(col("value")).as("sum_value"))
      .orderBy("itype", "ub")
    val a = bucketed.collect().toSeq
    val b = naive.collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
    // every interval contains at least its own defining event
    assert(a.forall(_.getLong(4) >= 1L))
  }

  test("range join never plans a nested-loop join") {
    val plan = Relational.q30RangeJoin(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoop"),
      s"bucketed range join fell back to a nested loop:\n$plan")
  }

  test("BM25 ranks by the textbook function and respects k") {
    val rows = TextAnalysis.textBm25TopK(spark, dir, k = 10).collect()
    assert(rows.length === 10)
    val scores = rows.map(_.getDouble(6))
    // descending, ties broken by doc_id ascending
    assert(scores.sameElements(scores.sorted(Ordering[Double].reverse)))
    // recompute one row's score from first principles
    val docs = graft.Tables.t(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val n = docs.count().toDouble
    val avgdl = docs.agg(sum("dl")).collect()(0).getLong(0).toDouble / n
    val terms = Seq("spark", "join", "window", "fast")
    val dfs = terms.map(t => docs
      .filter(array_contains(col("toks"), t)).count().toDouble)
    val top = rows.head
    val doc = docs.filter(col("doc_id") === top.getLong(0)).collect()(0)
    val toks = doc.getSeq[String](1)
    val dl = doc.getLong(2).toDouble
    val expected = terms.zip(dfs).map { case (t, df) =>
      val tf = toks.count(_ == t).toDouble
      val idf = BigDecimal(math.log((n - df + 0.5) / (df + 0.5) + 1.0))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
    }.reduceLeft(_ + _)
    val rounded = BigDecimal(expected)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(top.getDouble(6) - rounded) < 1e-9)
    // a doc containing none of the query terms scores exactly 0 —
    // and none of those may outrank a doc with any hit
    assert(rows.forall(_.getDouble(6) > 0.0))
  }
}
