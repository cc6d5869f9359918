package graft.streaming

import java.io.DataInputStream
import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end over a REAL TCP socket: raw v0 Kafka frames in, framed
  * responses out, with the manifest-committed TopicLog as storage —
  * the full surface the reference prototype implements (accept loop +
  * framing + dispatch), driven byte-level. */
class WireServerSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] = {
    sock.getOutputStream.write(request)
    sock.getOutputStream.flush()
    val in = new DataInputStream(sock.getInputStream)
    val size = in.readInt()
    val payload = new Array[Byte](size)
    in.readFully(payload)
    val framed = new Array[Byte](size + 4)
    framed(0) = (size >>> 24).toByte; framed(1) = (size >>> 16).toByte
    framed(2) = (size >>> 8).toByte; framed(3) = size.toByte
    System.arraycopy(payload, 0, framed, 4, size)
    framed
  }

  test("a raw socket client discovers, produces, fetches, and commits") {
    val root = Files.createTempDirectory("graft-wiresrv").toString
    val broker = new Broker(spark, root)
    broker.createTopic("tcp", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // ApiVersions: the server advertises its dispatch table
      val apis = decodeApiVersionsResponseV3(exchange(sock,
        encodeApiVersionsRequestV3(1, "cli", "graft-test", "0")))
      assert(apis.correlationId === 1)
      assert(apis.apiKeys.map(_._1).toSet
        .intersect(Set(0, 1, 3, 8, 9, 18)) === Set(0, 1, 3, 8, 9, 18))

      // Metadata: topic visible with its partitions, this broker leads
      val meta = decodeMetadataResponseV0(exchange(sock,
        encodeMetadataRequestV0(2, "cli", None)))
      assert(meta.brokers === Seq((0, "127.0.0.1", server.boundPort)))
      assert(meta.topics.map(t => (t.name, t.partitions.length)) === Seq(("tcp", 2)))

      // Produce over the socket → real offsets in the manifest log
      def rec(s: String) = WireRecord(null, s.getBytes("UTF-8"))
      val prodResp = decodeProduceResponseV0(exchange(sock,
        encodeProduceRequestV0(3, "cli", 1, 1000,
          Seq(("tcp", Seq((0, Seq(rec("a"), rec("b"))), (1, Seq(rec("c")))))))))
      assert(prodResp._2 === Seq(("tcp", Seq((0, 0, 0L), (1, 0, 0L)))))
      assert(broker.topic("tcp").read().count() === 3)

      // Fetch the records back over the same connection
      val fetched = decodeFetchResponseV0(exchange(sock,
        encodeFetchRequestV0(4, "cli", 100, 1, Seq(("tcp", Seq((0, 0L, 1 << 20)))))))
      val (_, _, hw, msgs) = fetched._2.head._2.head
      assert(hw === 2L)
      assert(msgs.map(m => new String(m._2.value, "UTF-8")) === Seq("a", "b"))

      // ListOffsets: latest (-1), earliest (-2), and by timestamp
      val lo = decodeListOffsetsResponseV0(exchange(sock,
        encodeListOffsetsRequestV0(9, "cli", Seq(("tcp", Seq(
          (0, -1L, 1), (0, -2L, 1), (1, -1L, 1), (9, -1L, 1)))))))
      assert(lo._2 === Seq(("tcp", Seq(
        (0, 0, Seq(2L)), (0, 0, Seq(0L)), (1, 0, Seq(1L)), (9, 3, Seq())))))
      // a timestamp in the far past answers the first offset; in the
      // far future, no offsets
      val past = decodeListOffsetsResponseV0(exchange(sock,
        encodeListOffsetsRequestV0(10, "cli", Seq(("tcp", Seq((0, 1L, 1)))))))
      assert(past._2.head._2.head === ((0, 0, Seq(0L))))
      val future = decodeListOffsetsResponseV0(exchange(sock,
        encodeListOffsetsRequestV0(11, "cli",
          Seq(("tcp", Seq((0, Long.MaxValue / 2, 1)))))))
      assert(future._2.head._2.head === ((0, 0, Seq())))

      // retention-aware EARLIEST: truncate partition 0's front, then
      // -2 must answer the first EXISTING offset, not 0 — and a
      // far-past negative timestamp must answer (not kill the
      // connection on micros overflow)
      broker.topic("tcp").truncateBefore(0, 1L)
      val afterTrunc = decodeListOffsetsResponseV0(exchange(sock,
        encodeListOffsetsRequestV0(12, "cli", Seq(("tcp", Seq(
          (0, -2L, 1), (0, Long.MinValue, 1)))))))
      assert(afterTrunc._2.head._2 === Seq((0, 0, Seq(1L)), (0, 0, Seq(1L))))

      // Commit + fetch offsets for a group
      exchange(sock, encodeOffsetCommitRequestV0(5, "cli", "g",
        Seq(("tcp", Seq((0, 2L, null))))))
      val offs = decodeOffsetFetchResponseV0(exchange(sock,
        encodeOffsetFetchRequestV0(6, "cli", "g", Seq(("tcp", Seq(0, 1))))))
      assert(offs._2 === Seq(("tcp", Seq((0, 2L, "", 0), (1, -1L, null, 0)))))
      assert(broker.topic("tcp").committed("g") === Map(0 -> 2L))

      // a SECOND connection sees the same log state
      val sock2 = new Socket("127.0.0.1", server.boundPort)
      try {
        val again = decodeFetchResponseV0(exchange(sock2,
          encodeFetchRequestV0(7, "cli2", 100, 1, Seq(("tcp", Seq((1, 0L, 1 << 20)))))))
        assert(again._2.head._2.head._4
          .map(m => new String(m._2.value, "UTF-8")) === Seq("c"))
      } finally sock2.close()
    } finally {
      sock.close()
      server.close()
    }
  }
}
