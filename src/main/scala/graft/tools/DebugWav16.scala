package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-16 mm_wav_decode codec audit (round-15 verdict item 8): the
  * PNG sibling hid 2.8 s of per-doc plugin-registry + temp-file cost
  * behind the static ImageIO helpers; this probe applies the same
  * decomposition to `AudioSystem.getAudioInputStream` to either
  * confirm the builder's claim that the JDK caches the
  * AudioFileReader provider lookup (→ floor, leave the operator
  * alone) or motivate the same §4.5 hoist-per-task rewrite.
  *
  * Three legs, single thread, same arithmetic as the operator body:
  *   synth-only    — RIFF/WAVE byte synthesis + PCM sum, no demuxer
  *   synth+decode  — the operator body verbatim (AudioSystem parse)
  *   query         — the declared query end-to-end (noop sink)
  * The per-doc demuxer tax is (synth+decode − synth-only) / n.
  */
object DebugWav16 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.3f  $label"); r
    }

    def wavBytes(id: Long): java.io.ByteArrayOutputStream = {
      val n = 64 + (id % 65).toInt
      val bos = new java.io.ByteArrayOutputStream()
      def le32(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff)
        bos.write((v >> 16) & 0xff); bos.write((v >>> 24) & 0xff) }
      def le16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      bos.write("RIFF".getBytes("US-ASCII")); le32(36 + n * 2)
      bos.write("WAVE".getBytes("US-ASCII"))
      bos.write("fmt ".getBytes("US-ASCII")); le32(16)
      le16(1); le16(1); le32(8000); le32(16000); le16(2); le16(16)
      bos.write("data".getBytes("US-ASCII")); le32(n * 2)
      var i = 0
      while (i < n) {
        le16((((7L * id + 13L * i) % 65536L).toInt - 32768) & 0xffff); i += 1
      }
      bos
    }

    val nDocs = 200000L
    for (round <- 1 to 2) {
      var sink = 0L
      time(s"round$round synth-only x$nDocs") {
        var id = 0L
        while (id < nDocs) { sink += wavBytes(id).size(); id += 1 }
      }
      time(s"round$round synth+decode x$nDocs") {
        var id = 0L
        while (id < nDocs) {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(wavBytes(id).toByteArray))
          val frames = ais.getFrameLength
          val data = ais.readAllBytes()
          var i = 0
          while (i < frames.toInt) {
            sink += ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
            i += 1
          }
          id += 1
        }
      }
      println(s"  sink=$sink")
      time(s"round$round synth+decode-hoisted x$nDocs") {
        // §4.5 candidate: resolve the AudioFileReader providers ONCE,
        // then replay AudioSystem's first-success iteration per doc
        val readers = {
          val it = java.util.ServiceLoader
            .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
          val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
          while (it.hasNext) b += it.next()
          b.result()
        }
        println(s"  providers=${readers.map(_.getClass.getName).mkString(",")}")
        var id = 0L
        while (id < nDocs) {
          val bis = new java.io.ByteArrayInputStream(wavBytes(id).toByteArray)
          var ais: javax.sound.sampled.AudioInputStream = null
          val rit = readers.iterator
          while (ais == null && rit.hasNext) {
            val r = rit.next()
            try ais = r.getAudioInputStream(bis)
            catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
          }
          val frames = ais.getFrameLength
          val data = ais.readAllBytes()
          var i = 0
          while (i < frames.toInt) {
            sink += ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
            i += 1
          }
          id += 1
        }
      }
      time(s"round$round synth+decode-first-success-cached x$nDocs") {
        // §4.5 candidate 2: every doc is the same container, so cache
        // WHICH provider succeeded for the first doc and try it first
        // for the rest (exact same first-success result; the failed
        // attempts before it each threw a stack-trace-filling
        // UnsupportedAudioFileException per document)
        val readers = {
          val it = java.util.ServiceLoader
            .load(classOf[javax.sound.sampled.spi.AudioFileReader]).iterator()
          val b = Seq.newBuilder[javax.sound.sampled.spi.AudioFileReader]
          while (it.hasNext) b += it.next()
          b.result()
        }
        var cached: javax.sound.sampled.spi.AudioFileReader = null
        var id = 0L
        while (id < nDocs) {
          val bis = new java.io.ByteArrayInputStream(wavBytes(id).toByteArray)
          var ais: javax.sound.sampled.AudioInputStream = null
          if (cached != null) {
            try ais = cached.getAudioInputStream(bis)
            catch { case _: javax.sound.sampled.UnsupportedAudioFileException =>
              bis.reset() }
          }
          if (ais == null) {
            val rit = readers.iterator
            while (ais == null && rit.hasNext) {
              val r = rit.next()
              try { ais = r.getAudioInputStream(bis); cached = r }
              catch { case _: javax.sound.sampled.UnsupportedAudioFileException => () }
            }
          }
          val frames = ais.getFrameLength
          val data = ais.readAllBytes()
          var i = 0
          while (i < frames.toInt) {
            sink += ((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort
            i += 1
          }
          id += 1
        }
      }
      time(s"round$round mm_wav_decode query (noop)") {
        graft.operators.Multimodal.mmWavDecode(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"round$round mm_png_decode query (noop, control)") {
        graft.operators.Multimodal.mmPngDecode(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"round$round doc_id scan+sort floor (noop)") {
        graft.Tables.t(spark, dir, "documents").select("doc_id")
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
