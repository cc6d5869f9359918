package graft.streaming

import java.io.DataInputStream
import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KIP-227 incremental fetch sessions over a real socket: a full
  * fetch at epoch 0 registers the session, incremental epochs send
  * only changes, idle partitions vanish from responses, and the
  * error/recovery paths (70 unknown session, 71 bad epoch, final
  * epoch close) behave per the public spec. */
class FetchSessionSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def rec(v: String) =
    WireRecordV2(1700000000000L, null, v.getBytes("UTF-8"), Seq.empty)

  test("incremental fetch session lifecycle: register, omit idle, surface new data, close") {
    val root = Files.createTempDirectory("graft-fsess").toString
    val broker = new Broker(spark, root)
    broker.createTopic("sess", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // seed: two records on p0, one on p1
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 1, "cli", null, 1, 30000, Seq(("sess", Seq(
          (0, Seq(rec("a"), rec("b"))), (1, Seq(rec("c")))))))))

      // epoch 0 full fetch opens a session and returns everything
      val r1 = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 2, "cli", 500, 1, 1 << 20,
          Seq(("sess", Seq((0, 0L, 1 << 20), (1, 0L, 1 << 20)))),
          sessionId = 0, sessionEpoch = 0)))
      assert(r1._2 === 0)
      val sid = r1._3
      assert(sid > 0, "a new session id is assigned")
      assert(r1._4.head._2.map(p => (p._1, p._4.length)).sortBy(_._1) ===
        Seq((0, 2), (1, 1)))

      // incremental epoch 1: positions advanced to the log end →
      // nothing new anywhere → EMPTY response
      val r2 = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 3, "cli", 500, 1, 1 << 20,
          Seq(("sess", Seq((0, 2L, 1 << 20), (1, 1L, 1 << 20)))),
          sessionId = sid, sessionEpoch = 1)))
      assert(r2._2 === 0)
      assert(r2._3 === sid)
      assert(r2._4.isEmpty, "idle partitions are omitted from incremental responses")

      // new data lands on p0 only
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 4, "cli", null, 1, 30000,
          Seq(("sess", Seq((0, Seq(rec("d")))))))))

      // incremental epoch 2 with NO partitions re-sent: the broker
      // remembers the session state and serves only the moved one
      val r3 = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 5, "cli", 500, 1, 1 << 20, Seq.empty,
          sessionId = sid, sessionEpoch = 2)))
      assert(r3._2 === 0)
      val p0 = r3._4.head._2
      assert(r3._4.map(_._1) === Seq("sess"))
      assert(p0.map(_._1) === Seq(0), "only the partition with new data returns")
      assert(p0.head._4.map(r => new String(r._2.value, "UTF-8")) === Seq("d"))

      // forgotten partitions leave the session: drop p0, produce to
      // it again, and the next incremental stays empty
      val r4 = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 6, "cli", 500, 1, 1 << 20, Seq.empty,
          sessionId = sid, sessionEpoch = 3,
          forgotten = Seq(("sess", Seq(0))))))
      assert(r4._2 === 0)
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 7, "cli", null, 1, 30000,
          Seq(("sess", Seq((0, Seq(rec("e")))))))))
      val r5 = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 8, "cli", 500, 1, 1 << 20, Seq.empty,
          sessionId = sid, sessionEpoch = 4)))
      assert(r5._4.isEmpty, "a forgotten partition is no longer served")

      // a skipped epoch is rejected with INVALID_FETCH_SESSION_EPOCH
      val bad = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 9, "cli", 500, 1, 1 << 20, Seq.empty,
          sessionId = sid, sessionEpoch = 9)))
      assert(bad._2 === 71)

      // an unknown session id answers FETCH_SESSION_ID_NOT_FOUND
      val unknown = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 10, "cli", 500, 1, 1 << 20, Seq.empty,
          sessionId = 999999, sessionEpoch = 1)))
      assert(unknown._2 === 70)

      // FINAL_EPOCH (−1) closes the session and serves a normal full
      // fetch; the old id is gone afterwards
      val closing = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 11, "cli", 500, 1, 1 << 20,
          Seq(("sess", Seq((1, 0L, 1 << 20)))),
          sessionId = sid, sessionEpoch = -1)))
      assert(closing._2 === 0)
      assert(closing._3 === 0)
      assert(closing._4.head._2.head._4.map(r =>
        new String(r._2.value, "UTF-8")) === Seq("c"))
      val gone = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 12, "cli", 500, 1, 1 << 20, Seq.empty,
          sessionId = sid, sessionEpoch = 5)))
      assert(gone._2 === 70)
    } finally {
      sock.close()
      server.close()
    }
  }

  test("a byte-starved session rotates its serve order so no partition starves") {
    val root = Files.createTempDirectory("graft-fsess-rot").toString
    val broker = new Broker(spark, root)
    broker.createTopic("rot", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // both partitions hold a backlog
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 1, "cli", null, 1, 30000, Seq(("rot", Seq(
          (0, Seq(rec("a0"), rec("a1"))), (1, Seq(rec("b0"), rec("b1")))))))))
      // open the session with a request-level max_bytes so small only
      // ONE partition's records fit per response (first record exempt)
      val r1 = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 2, "cli", 500, 1, 1,
          Seq(("rot", Seq((0, 0L, 1 << 20), (1, 0L, 1 << 20)))),
          sessionId = 0, sessionEpoch = 0)))
      val sid = r1._3
      def servedPartitions(r: (Int, Int, Int, Seq[(String, Seq[(Int, Int, Long, Seq[(Long, WireRecordV2)])])])) =
        r._4.flatMap(_._2).collect { case (p, _, _, recs) if recs.nonEmpty => p }
      val first = servedPartitions(r1)
      assert(first.length === 1, s"the 1-byte budget serves one partition, got $first")
      // the next incremental (nothing changed client-side) must serve
      // the OTHER partition — a fixed order would starve it forever
      val r2 = decodeFetchResponseFull(12, exchange(sock,
        encodeFetchRequest(12, 3, "cli", 500, 1, 1, Seq.empty,
          sessionId = sid, sessionEpoch = 1)))
      val second = servedPartitions(r2)
      assert(second.length === 1)
      assert(second.head !== first.head,
        "the rotation cursor must bring the starved partition to the front")
    } finally {
      sock.close()
      server.close()
    }
  }

  test("sessionless fetches (epoch -1) keep working and never register state") {
    val root = Files.createTempDirectory("graft-fsess2").toString
    val broker = new Broker(spark, root)
    broker.createTopic("plain", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 99, "cli", null, 1, 30000,
          Seq(("plain", Seq((0, Seq(rec("x")))))))))
      for (corr <- 1 to 2) {
        val r = decodeFetchResponseFull(12, exchange(sock,
          encodeFetchRequest(12, corr, "cli", 500, 1, 1 << 20,
            Seq(("plain", Seq((0, 0L, 1 << 20)))))))
        assert(r._2 === 0)
        assert(r._3 === 0, "sessionless fetches get session_id 0")
        assert(r._4.head._2.head._4.length === 1)
      }
    } finally {
      sock.close()
      server.close()
    }
  }
}
