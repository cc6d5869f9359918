package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables.t

/** Throwaway sub-stage timing for text_char_trigram_langid. */
object DebugTrigram {
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

    for (rnd <- 1 to 2) {
      println(s"--- round $rnd ---")
      val tris = t(spark, dir, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"),
          explode(expr("transform(sequence(1, length(text) - 2)," +
            " i -> substring(text, i, 3))")).as("tri"))
      time("explode_only")(noop(tris))
      // variant A: explode the INDEX (codegen sequence), substring after
      val trisA = t(spark, dir, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"), col("text"),
          explode(expr("sequence(1, length(text) - 2)")).as("i"))
        .select(col("doc_id"), col("lang"),
          expr("substring(text, i, 3)").as("tri"))
      time("explodeA_only")(noop(trisA))
      val docTriA = trisA.groupBy("doc_id", "lang", "tri")
        .agg(count(lit(1)).as("cnt"))
      time("docTriA_agg")(noop(docTriA))
      // variant B: lossless 63-bit codepoint pack, long agg key
      val trisB = t(spark, dir, "documents")
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"), col("lang"), col("text"),
          explode(expr("sequence(1, length(text) - 2)")).as("i"))
        .select(col("doc_id"), col("lang"),
          expr("(cast(ascii(substring(text, i, 1)) as bigint) * 4398046511104L)" +
            " + (cast(ascii(substring(text, i + 1, 1)) as bigint) * 2097152L)" +
            " + cast(ascii(substring(text, i + 2, 1)) as bigint)").as("tri"))
      time("explodeB_only")(noop(trisB))
      val docTriB = trisB.groupBy("doc_id", "lang", "tri")
        .agg(count(lit(1)).as("cnt"))
      time("docTriB_agg")(noop(docTriB))
      val docTriPlain = tris.groupBy("doc_id", "lang", "tri")
        .agg(count(lit(1)).as("cnt"))
      time("docTri_agg")(noop(docTriPlain))
      val docTri = time("docTri_ckpt")(docTriPlain.localCheckpoint(true))
      val prof = docTri.groupBy(col("lang").as("plang"), col("tri"))
        .agg(sum("cnt").as("pcnt"))
      time("prof")(noop(prof))
      val docNorm = docTri.groupBy("doc_id")
        .agg(sum(col("cnt") * col("cnt")).as("dn2"))
      time("docNorm")(noop(docNorm))
      val profNorm = prof.groupBy("plang")
        .agg(sum(col("pcnt").cast(DecimalType(19, 0)) *
          col("pcnt").cast(DecimalType(19, 0))).as("pn2"))
      val scored = docTri.join(broadcast(prof), "tri")
        .groupBy("doc_id", "lang", "plang")
        .agg(sum(col("cnt") * col("pcnt")).as("dotp"))
      time("score_join_agg")(noop(scored))
      val wA = Window.partitionBy("doc_id")
        .orderBy(col("cos_sim").desc, col("plang").asc)
      val full = scored
        .join(docNorm, "doc_id")
        .join(broadcast(profNorm), "plang")
        .withColumn("cos_sim", round(col("dotp").cast("double") /
          (sqrt(col("dn2").cast("double")) * sqrt(col("pn2").cast("double"))), 6))
        .withColumn("rk", row_number().over(wA))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("lang"), col("plang").as("pred_lang"),
          col("cos_sim"), (col("lang") === col("plang")).as("correct"))
        .orderBy("doc_id")
      time("full_tail")(noop(full))
      time("full_query")(noop(graft.operators.TextAnalysis
        .textCharTrigramLangid(spark, dir)))
    }
    spark.stop()
  }
}
