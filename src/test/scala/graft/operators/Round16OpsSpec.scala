package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-16 internals changes to the decode-seam operators, pinned
  * against the closed forms the DuckDB oracle computes: mm_wav_decode
  * now caches the first-successful AudioFileReader per task instead
  * of paying AudioSystem's full provider iteration (3 thrown
  * exceptions) per document, and mm_png_decode constructs its
  * memory-backed ImageIO streams directly and disposes the codec at
  * task end. Neither may change a single output value.
  */
class Round16OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val dir = "/root/testdata/sf0.001"

  test("mm_wav_decode matches the closed form after the provider-cache rewrite") {
    val rows = Multimodal.mmWavDecode(spark, dir).collect()
    assert(rows.length > 1, "needs >1 doc so the cached-provider path runs")
    rows.foreach { r =>
      val id = r.getLong(0)
      val n = 64 + (id % 65).toInt
      var sum = 0L
      var i = 0
      while (i < n) { sum += ((7L * id + 13L * i) % 65536L) - 32768L; i += 1 }
      assert(r.getLong(1) == n.toLong, s"frames doc $id")
      assert(r.getLong(2) == 8000L, s"rate doc $id")
      assert(r.getLong(3) == 16L, s"bits doc $id")
      assert(r.getLong(4) == sum, s"pcm sum doc $id")
    }
    // sorted by doc_id (declared shape)
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).toSeq.sorted)
  }

  test("bigram index-explode equals the zip_with formulation it replaced") {
    // text_perplexity_bigram's pair stream moved from the interpreted
    // slice+slice+zip_with HOF to codegen sequence+explode+element_at;
    // this pins the row-level identity of the two formulations (bg AND
    // the w1 = substring_index shortcut) on real corpus text,
    // including empty tokens from doubled separators.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
    val oldForm = docs.select(col("doc_id"),
        explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => concat_ws(" ", a, b))).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
    val newForm = docs.select(col("doc_id"), col("toks"),
        explode(expr("sequence(1, size(toks) - 1)")).as("i"))
      .select(col("doc_id"),
        concat_ws(" ", element_at(col("toks"), col("i")),
          element_at(col("toks"), col("i") + 1)).as("bg"),
        element_at(col("toks"), col("i")).as("w1"))
    val key = Seq("doc_id", "bg", "w1")
    val oldCnt = oldForm.groupBy(key.map(col): _*).count()
    val newCnt = newForm.groupBy(key.map(col): _*).count()
    assert(oldCnt.count() > 100, "fixture must produce real bigrams")
    assert(oldCnt.except(newCnt).isEmpty && newCnt.except(oldCnt).isEmpty,
      "bigram multisets differ between formulations")
  }

  test("mm_png_decode matches the closed form after the stream/dispose change") {
    val rows = Multimodal.mmPngDecode(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val w = 8 + (id % 9).toInt
      val h = 8 + (id % 7).toInt
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += (31L * id + 7L * x + 13L * y) % 256L; x += 1 }
        y += 1
      }
      assert(r.getLong(1) == w.toLong, s"width doc $id")
      assert(r.getLong(2) == h.toLong, s"height doc $id")
      assert(r.getLong(3) == sum, s"luma sum doc $id")
      assert(math.abs(r.getDouble(4) -
        math.rint(sum.toDouble / (w * h) * 1e6) / 1e6) < 1e-12, s"mean doc $id")
    }
  }
}
