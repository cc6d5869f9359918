package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** RecordBatch v2 (magic 2) conformance: hand-laid golden frame for a
  * single-record batch (zigzag varints + CRC32C computed over the
  * independently-laid section), full-model round-trip including
  * HEADERS (which message v0 cannot carry), and corruption
  * detection. */
class RecordBatchV2Spec extends AnyFunSuite {
  import KafkaWire._

  test("single-record batch encode matches the hand-laid golden bytes") {
    // record: ts = base (delta 0), key null, value "v", no headers
    val recBody = Array[Byte](
      0, // record attributes
      0, // timestampDelta zigzag(0)
      0, // offsetDelta zigzag(0)
      1, // keyLength zigzag(-1) = 1
      2, 'v'.toByte, // valueLength zigzag(1) = 2, value
      0) // headers count zigzag(0)
    val rec = Array[Byte]((recBody.length << 1).toByte) ++ recBody // length zigzag
    val afterCrc =
      Array[Byte](0, 0) ++ // attributes INT16
        Array[Byte](0, 0, 0, 0) ++ // lastOffsetDelta = 0
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 100) ++ // baseTimestamp = 100
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 100) ++ // maxTimestamp = 100
        Array.fill[Byte](8)(-1) ++ // producerId = -1
        Array[Byte](-1, -1) ++ // producerEpoch = -1
        Array[Byte](-1, -1, -1, -1) ++ // baseSequence = -1
        Array[Byte](0, 0, 0, 1) ++ // recordCount
        rec
    val crc = new java.util.zip.CRC32C()
    crc.update(afterCrc)
    val c = crc.getValue.toInt
    val golden =
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 5) ++ // baseOffset = 5
        Array[Byte](0, 0, 0, (9 + afterCrc.length).toByte) ++ // batchLength
        Array[Byte](-1, -1, -1, -1) ++ // partitionLeaderEpoch
        Array[Byte](2) ++ // magic
        Array[Byte]((c >>> 24).toByte, (c >>> 16).toByte, (c >>> 8).toByte, c.toByte) ++
        afterCrc
    val enc = encodeRecordBatchV2(RecordBatchV2(5L, 100L,
      Seq(WireRecordV2(100L, null, "v".getBytes("UTF-8")))))
    assert(enc.sameElements(golden),
      s"\n got: ${enc.map("%02x".format(_)).mkString(" ")}" +
        s"\nwant: ${golden.map("%02x".format(_)).mkString(" ")}")
  }

  test("full record model round-trips: keys, values, headers, timestamps") {
    val batch = RecordBatchV2(1000L, 1700000000000L, Seq(
      WireRecordV2(1700000000000L, "k1".getBytes("UTF-8"), "v1".getBytes("UTF-8"),
        Seq("route" -> "r1".getBytes("UTF-8"), "trace" -> null)),
      WireRecordV2(1700000000123L, null, "v2".getBytes("UTF-8")),
      WireRecordV2(1700000000456L, "k3".getBytes("UTF-8"), null,
        Seq("h" -> Array[Byte](0, 1, 2)))))
    val dec = decodeRecordBatchV2(encodeRecordBatchV2(batch))
    assert(dec.baseOffset === 1000L)
    assert(dec.records.length === 3)
    assert(new String(dec.records.head.key, "UTF-8") === "k1")
    assert(dec.records.head.headers.map(_._1) === Seq("route", "trace"))
    assert(new String(dec.records.head.headers.head._2, "UTF-8") === "r1")
    assert(dec.records.head.headers(1)._2 === null)
    assert(dec.records(1).key === null)
    assert(dec.records(1).timestampMs === 1700000000123L)
    assert(dec.records(2).value === null)
    assert(dec.records(2).headers.head._2.toSeq === Seq[Byte](0, 1, 2))
  }

  test("zigzag varints cover negative and multi-byte magnitudes") {
    // exercise length/delta varints beyond one byte: a large payload
    // and a record far from the base timestamp
    val big = Array.fill[Byte](300)(7)
    val batch = RecordBatchV2(0L, 1000000L,
      Seq(WireRecordV2(999000L, null, big))) // NEGATIVE tsDelta
    val dec = decodeRecordBatchV2(encodeRecordBatchV2(batch))
    assert(dec.records.head.value.length === 300)
    assert(dec.records.head.timestampMs === 999000L)
  }

  test("maxTimestamp is the max RECORD timestamp, not floored at the base") {
    // all records predate the base timestamp: the header must carry
    // the records' max (999000), never the base (1000000)
    val enc = encodeRecordBatchV2(RecordBatchV2(0L, 1000000L,
      Seq(WireRecordV2(999000L, null, "x".getBytes("UTF-8")))))
    // maxTimestamp lives at bytes 35..42: baseOffset(8) + length(4) +
    // epoch(4) + magic(1) + crc(4) + attributes(2) + lastOffsetDelta(4)
    // + baseTimestamp(8)
    val maxTs = java.nio.ByteBuffer.wrap(enc, 35, 8).getLong
    assert(maxTs === 999000L, s"header maxTimestamp $maxTs")
  }

  test("a flipped bit fails the CRC32C check") {
    val enc = encodeRecordBatchV2(RecordBatchV2(0L, 1L,
      Seq(WireRecordV2(1L, null, "x".getBytes("UTF-8")))))
    enc(enc.length - 1) = (enc(enc.length - 1) ^ 0x01).toByte
    val e = intercept[IllegalArgumentException] { decodeRecordBatchV2(enc) }
    assert(e.getMessage.contains("CRC32C"))
  }
}
