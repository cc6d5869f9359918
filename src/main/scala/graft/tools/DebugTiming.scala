package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.functions.TextFunctions.wordNgrams
import graft.operators.Dedup

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

    val docs = t(spark, dir, "documents")
      .select(col("doc_id"),
        array_distinct(wordNgrams(lower(col("text")), 3)).as("shingles"))
      .filter(size(col("shingles")) > 0)
    time("shingle docs count")(docs.count())
    time("shingle docs count (2nd)")(docs.count())
    val expl = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("exploded shingles")(expl.count())
    val sig = time("build sig plan") {
      val minCols = (0 until 64).map(s => min(xxhash64(col("sh"), lit(s))).as(s"m$s"))
      expl.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
    }
    time("signatures")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(array((0 until 16).map { b =>
        struct(lit(b).as("band"),
          xxhash64((0 until 4).map(i => col(s"m${b * 4 + i}")): _*).as("bkey"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
    time("banded")(banded.count())
    val candIds = banded.select(col("doc_id").as("d1"), col("band"), col("bkey"))
      .join(banded.select(col("doc_id").as("d2"), col("band"), col("bkey")),
        Seq("band", "bkey"))
      .filter(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    val nCand = time("candidate pairs")(candIds.count())
    println(s"          candidates = $nCand")
    time("full dedupMinhashLsh")(Dedup.dedupMinhashLsh(spark, dir).count())
    time("full dedupNgramJaccard")(Dedup.dedupNgramJaccard(spark, dir).count())

    // jaccard block stats
    val d = t(spark, dir, "documents")
      .select(col("doc_id"), col("lang"), expr("n_chars DIV 10").as("bucket"))
    val blocks = d.groupBy("lang", "bucket").count()
    time("jaccard block pair volume") {
      println("          pairs = " + blocks.selectExpr("sum(count*count)").collect()(0).getLong(0))
    }
    spark.stop()
  }
}
