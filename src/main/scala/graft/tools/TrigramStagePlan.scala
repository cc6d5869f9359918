package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t

/** Prints the trigram-explode stage plan (the part the localCheckpoint
  * hides from the full-query plan) for plans/r15 evidence: the round-15
  * codegen index-explode vs the round-14 transform-lambda form. */
object TrigramStagePlan {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val mode = if (args.nonEmpty) args(0) else "after"
    val tris =
      if (mode == "before")
        t(spark, dir, "documents")
          .filter(length(col("text")) >= 3)
          .select(col("doc_id"), col("lang"),
            explode(expr("transform(sequence(1, length(text) - 2)," +
              " i -> substring(text, i, 3))")).as("tri"))
      else graft.operators.TextAnalysis.charTrigrams(spark, dir)
    println(s"========== trigram docTri stage ($mode) ==========")
    tris.groupBy("doc_id", "lang", "tri").agg(count(lit(1)).as("cnt"))
      .explain("formatted")
    spark.stop()
  }
}
