package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.{Dedup, Similarity}

/** Throwaway stage-timing harness for the heavy pipeline queries. */
object DebugTiming {
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
    // full-plan execution, nothing written (see Bench on why not count())
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    time("dedup_ngram_jaccard")(noop(Dedup.dedupNgramJaccard(spark, dir)))
    time("dedup_cluster_cc")(noop(Dedup.dedupClusterCC(spark, dir)))
    time("dedup_embedding_cosine")(noop(Dedup.dedupEmbeddingCosine(spark, dir)))
    time("dedup_embedding_cc")(noop(Dedup.dedupEmbeddingCC(spark, dir)))
    time("ann_ivf_topk")(noop(Similarity.annIvfTopk(spark, dir)))
    time("ann_ivf_kmeans_topk")(noop(Similarity.annIvfKmeansTopk(spark, dir)))
    spark.stop()
  }
}
