package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MinHashAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("one-pass aggregate equals the k-column min formulation bit-for-bit") {
    val k = 16
    val rows = for (doc <- 0 until 20; sh <- 0 until 30)
      yield (doc.toLong, s"shingle-$doc-${sh % 17}")
    val df = rows.toDF("doc_id", "sh")

    val onePass = df.groupBy("doc_id").agg(MinHashAgg(col("sh"), k).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

    val minCols = (0 until k).map(s => min(xxhash64(col("sh"), lit(s))).as(s"m$s"))
    val columnar = df.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to k).map(r.getLong(_))).toMap

    assert(onePass.keySet === columnar.keySet)
    onePass.foreach { case (doc, sig) =>
      assert(sig === columnar(doc), s"doc $doc")
    }
  }

  test("signature similarity tracks set overlap (the MinHash property)") {
    val a = (0 until 100).map(i => (1L, s"g$i"))
    val mostlyA = (0 until 100).map(i => (2L, if (i < 90) s"g$i" else s"x$i"))
    val disjoint = (0 until 100).map(i => (3L, s"z$i"))
    val sigs = (a ++ mostlyA ++ disjoint).toDF("id", "sh")
      .groupBy("id").agg(MinHashAgg(col("sh"), 64).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    def agree(x: Seq[Long], y: Seq[Long]) = x.zip(y).count(p => p._1 == p._2)
    assert(agree(sigs(1L), sigs(2L)) > agree(sigs(1L), sigs(3L)),
      "90%-overlap sets must agree on more minima than disjoint sets")
  }
}
