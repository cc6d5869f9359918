package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Throwaway A/B for textBpeApply's per-char wrap encoding. */
object DebugBpe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $label"); r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val S1 = graft.operators.TextAnalysis.BpeS1
    val S2 = graft.operators.TextAnalysis.BpeS2
    def w(s: String) = S1 + s + S2

    val docs = t(spark, dir, "documents")
    val regexForm = concat(
      regexp_replace(
        regexp_replace(col("text"), "(.)", w("$1")),
        w(" "), w("</w>")),
      lit(w("</w>")))
    val joinForm = concat(
      replace(
        concat(lit(S1), array_join(split(col("text"), ""), S2 + S1), lit(S2)),
        lit(w(" ")), lit(w("</w>"))),
      lit(w("</w>")))

    // equivalence on the real corpus + planted edges
    val diff = docs.select(regexForm.as("a"), joinForm.as("b"))
      .filter(col("a") =!= col("b")).count()
    println(s"corpus diffs: $diff")
    import spark.implicits._
    val edge = Seq("", "a", " ", "  ", "ab cd", "a b").toDF("text")
    edge.select(col("text"), regexForm.as("a"), joinForm.as("b"))
      .collect().foreach(r => println(
        s"edge '${r.getString(0)}': ${r.getString(1) == r.getString(2)}" +
          (if (r.getString(1) != r.getString(2))
            s"  a=${r.getString(1).replace(S1, "<").replace(S2, ">")}" +
              s" b=${r.getString(2).replace(S1, "<").replace(S2, ">")}" else "")))

    for (r <- 1 to 3) {
      println(s"--- round $r ---")
      time("regex_form")(noop(docs.select(col("doc_id"), regexForm.as("s0"))))
      time("join_form")(noop(docs.select(col("doc_id"), joinForm.as("s0"))))
      val stat = time("stat_agg")(docs.agg(count(lit(1)),
        sum(length(col("text")).cast("long")),
        expr(graft.operators.TextAnalysis.BpeCorpusFpSpark)).head())
      val merges = time("fixture_read")(
        spark.read.parquet("/tmp/graft-bpe-merges.parquet/docs_5000_1485576_f487226119075_v2")
          .orderBy("rank").collect()
          .map(rr => (rr.getAs[String]("left"), rr.getAs[String]("right"),
            rr.getAs[String]("merged"))))
      println(s"  merges: ${merges.length} (all subdirs)")
      val applied = merges.take(20).foldLeft(regexForm) { case (c, (a, b, m)) =>
        replace(c, lit(w(a) + w(b)), lit(w(m)))
      }
      def nSyms(c: org.apache.spark.sql.Column) =
        (length(c) - length(replace(c, lit(S1)))).cast("long")
      time("applied_chain")(noop(docs.select(col("doc_id"), applied.as("sf"))))
      time("applied_plus_nsyms")(noop(docs
        .select(col("doc_id"), regexForm.as("s0"), applied.as("sf"))
        .select(col("doc_id"), nSyms(col("s0")).as("a"), nSyms(col("sf")).as("b"))))
      time("bpe_apply_full")(noop(
        graft.operators.TextAnalysis.textBpeApply(spark, dir)))
    }
    spark.stop()
  }
}
