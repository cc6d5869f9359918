package graft.streaming

import java.io.{DataInputStream, EOFException}
import java.net.{Socket, SocketException, SocketTimeoutException}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Structured garbage against the live listener: a broker's accept
  * loop must survive any byte stream a port-scanner, a confused
  * client, or a truncated connection can throw at it — each bad
  * connection dies alone (the protocol-visible signal for an
  * undecodable request), the server and every other connection keep
  * serving. Seeded RNG: the byte streams are identical every run. */
class WireFuzzSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def writeFrame(sock: Socket, payload: Array[Byte]): Unit = {
    val out = sock.getOutputStream
    val n = payload.length
    out.write(Array[Byte]((n >>> 24).toByte, (n >>> 16).toByte,
      (n >>> 8).toByte, n.toByte))
    out.write(payload)
    out.flush()
  }

  /** Drain whatever the server answers until it closes or goes
    * quiet — we assert nothing about garbage responses, only that
    * the SERVER survives producing them. */
  private def drain(sock: Socket): Unit =
    try {
      sock.setSoTimeout(300)
      val in = new DataInputStream(sock.getInputStream)
      while (true) {
        val size = in.readInt()
        if (size < 0 || size > (1 << 20)) throw new EOFException
        in.readFully(new Array[Byte](size))
      }
    } catch {
      case _: EOFException | _: SocketTimeoutException |
           _: SocketException => ()
    }

  test("200 seeded garbage connections never kill the listener") {
    val root = Files.createTempDirectory("graft-fuzz").toString
    val broker = new Broker(spark, root)
    broker.createTopic("health", 1)
    val server = new WireServer(broker).start()
    val rnd = new scala.util.Random(42)

    // liveness probe: a full decodable request/response round trip
    // (a produce would add the CAS-timeout flake mode under load —
    // the data path gets its definitive check once, after the storm)
    def healthCheck(round: Int): Unit = {
      val sock = new Socket("127.0.0.1", server.boundPort)
      try {
        val apis = decodeApiVersionsResponsePreV3(0,
          WireTestClient.exchange(sock,
            encodeApiVersionsRequest(0, round, "health")))
        assert(apis.apiKeys.nonEmpty,
          s"server unhealthy after fuzz round $round")
      } finally sock.close()
    }

    for (i <- 0 until 200) {
      val sock = new Socket("127.0.0.1", server.boundPort)
      try {
        // The server is SPEC'D to kill a garbage connection as soon as
        // it decides the stream is undecodable — which can land before
        // this client finishes writing its garbage. A Broken-pipe /
        // connection-reset on OUR write is therefore a pass-shaped
        // outcome (same tolerance drain already has), not a failure:
        // the assertion that matters is the healthCheck.
        try i % 6 match {
          case 0 => // random bytes under a valid length prefix
            writeFrame(sock, Array.fill(2 + rnd.nextInt(256))(
              rnd.nextInt().toByte))
          case 1 => // a REAL api key, junk version/correlation/body
            val (key, _, _, _) =
              Broker.WireApis(rnd.nextInt(Broker.WireApis.length))
            val junk = Array.fill(rnd.nextInt(64))(rnd.nextInt().toByte)
            writeFrame(sock, Array[Byte]((key >>> 8).toByte, key.toByte,
              (rnd.nextInt(40) - 5).toByte, rnd.nextInt(127).toByte) ++ junk)
          case 2 => // truncated frame: declare more than we send
            val out = sock.getOutputStream
            out.write(Array[Byte](0, 0, 4, 0))
            out.write(Array.fill(16)(0x5a.toByte))
            out.flush()
          case 3 => // absurd declared size (over the 64 MiB cap)
            sock.getOutputStream.write(
              Array[Byte](0x7f, -1, -1, -1))
            sock.getOutputStream.flush()
          case 4 => // zero-length and one-byte frames
            writeFrame(sock, Array.emptyByteArray)
            writeFrame(sock, Array[Byte](18))
          case 5 => // unknown api key entirely
            writeFrame(sock, Array[Byte](0x6e, 0x42, 0, 0, 0, 0, 0, 7,
              -1, -1, 0))
        } catch { case _: SocketException => () }
        drain(sock)
      } finally sock.close()
      if (i % 50 == 49) healthCheck(i)
    }
    // after the storm: the data path end to end — produce, then read
    // the record back through Fetch v12
    healthCheck(999)
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val rec = WireRecordV2(1700000000000L, "k".getBytes, "alive".getBytes)
      val (_, offs) = decodeProduceResponse(9, WireTestClient.exchange(sock,
        encodeProduceRequestBatches(9, 998, "health", null, 1, 30000,
          Seq(("health", Seq((0, ProducedBatch(-1L, -1, -1, Seq(rec)))))))))
      assert(offs.head._2.head._2 === 0, "produce must ack after the storm")
      val (_, topics) = decodeFetchResponse(12, WireTestClient.exchange(sock,
        encodeFetchRequest(12, 1000, "health", 100, 1, 1 << 20,
          Seq(("health", Seq((0, 0L, 1 << 20)))))))
      assert(topics.head._2.head._4.map(r =>
        new String(r._2.value, "UTF-8")) === Seq("alive"))
    } finally { sock.close(); server.close() }
  }
}
