package graft.operators

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
