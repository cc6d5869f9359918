package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fetch v13 — KIP-516 topic-id keying, the last version gap a 3.x
  * consumer can observe: topics are addressed by 16-byte topic_id in
  * BOTH directions (graft's ids are the deterministic topicUuid
  * digests Metadata has served at v10+ since round 5), and an id no
  * hosted topic hashes to answers UNKNOWN_TOPIC_ID (100) per
  * partition with the original id echoed back. */
class FetchV13Spec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def rec(s: String) =
    WireRecordV2(1700000000000L, s"k-$s".getBytes("UTF-8"), s.getBytes("UTF-8"))

  private def i16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
  private def i32(v: Int) = Array[Byte]((v >>> 24).toByte, (v >>> 16).toByte,
    (v >>> 8).toByte, v.toByte)
  private def i64(v: Long) = (56 to 0 by -8).map(s => (v >>> s).toByte).toArray

  test("v13 request framing matches the hand-laid golden bytes") {
    val topicId = topicUuid("t13")
    val body =
      i16(1) ++ i16(13) ++ // api_key Fetch, api_version 13
        i32(42) ++ // correlation_id
        i16(3) ++ "cli".getBytes("UTF-8") ++ // client_id (legacy string)
        Array[Byte](0) ++ // request header v2 tag buffer
        i32(-1) ++ // replica_id (consumer)
        i32(100) ++ // max_wait_ms
        i32(1) ++ // min_bytes
        i32(1 << 20) ++ // max_bytes
        Array[Byte](1) ++ // isolation_level = read_committed
        i32(0) ++ i32(-1) ++ // session_id, session_epoch
        Array[Byte](2) ++ // topics: compact array, 1 entry
        topicId ++ // topic_id: the name is GONE at v13
        Array[Byte](2) ++ // partitions: compact array, 1 entry
        i32(0) ++ // partition
        i32(-1) ++ // current_leader_epoch
        i64(7L) ++ // fetch_offset
        i32(-1) ++ // last_fetched_epoch
        i64(-1L) ++ // log_start_offset
        i32(65536) ++ // partition_max_bytes
        Array[Byte](0) ++ // partition tag buffer
        Array[Byte](0) ++ // topic tag buffer
        Array[Byte](1) ++ // forgotten_topics_data: empty compact array
        Array[Byte](1) ++ // rack_id: compact string ""
        Array[Byte](0) // body tag buffer
    val golden = i32(body.length) ++ body
    val enc = encodeFetchRequest(13, 42, "cli", 100, 1, 1 << 20,
      Seq(("t13", Seq((0, 7L, 65536)))), 0, -1, Seq.empty, 1)
    assert(enc.sameElements(golden),
      s"\n got: ${enc.map("%02x".format(_)).mkString(" ")}" +
        s"\nwant: ${golden.map("%02x".format(_)).mkString(" ")}")
    // decode with a resolver: topic_id in, resolved name out
    val req = decodeFetchRequest(golden, topicIdResolverFor(Seq("t13", "zz")))
    assert(req.version === 13)
    assert(req.topics === Seq(("t13", Seq((0, 7L, 65536)))))
    assert(req.isolationLevel === 1)
    // without the name in its resolver set, the id surfaces as the
    // unknown-id marker carrying the original bytes
    val unresolved = decodeFetchRequest(golden)
    assert(isUnknownIdName(unresolved.topics.head._1))
    assert(unresolved.topics.head._1.endsWith(
      topicId.map("%02x".format(_)).mkString))
  }

  test("v13 codec round-trips, forgotten topics included") {
    val enc = encodeFetchRequest(13, 9, "c", 50, 1, 1 << 20,
      Seq(("alpha", Seq((0, 0L, 1024), (1, 5L, 2048)))),
      77, 3, Seq(("beta", Seq(2))), 0)
    val req = decodeFetchRequest(enc, topicIdResolverFor(Seq("alpha", "beta")))
    assert(req.topics === Seq(("alpha", Seq((0, 0L, 1024), (1, 5L, 2048)))))
    assert(req.forgotten === Seq(("beta", Seq(2))))
    assert(req.sessionId === 77 && req.sessionEpoch === 3)
    val resp = encodeFetchResponse(13, 9,
      Seq(("alpha", Seq((0, 0, 2L, Seq((0L, rec("x"))))))))
    val (_, topics) = decodeFetchResponse(13, resp,
      topicIdResolverFor(Seq("alpha")))
    assert(topics.head._1 === "alpha")
    assert(topics.head._2.head._4.map(r => new String(r._2.value, "UTF-8"))
      === Seq("x"))
  }

  test("v15/v16 drop the replica_id field and still round-trip + serve") {
    // codec: the replica-id-less body survives encode→decode at both
    for (v <- 14 to 16) {
      val req = decodeFetchRequest(
        encodeFetchRequest(v, 9, "c", 50, 1, 1 << 20,
          Seq(("alpha", Seq((0, 7L, 1024)))), 5, 2, Seq(("beta", Seq(0)))),
        topicIdResolverFor(Seq("alpha", "beta")))
      assert(req.topics === Seq(("alpha", Seq((0, 7L, 1024)))), s"v$v")
      assert(req.forgotten === Seq(("beta", Seq(0))), s"v$v")
      assert(req.sessionId === 5 && req.sessionEpoch === 2, s"v$v")
    }
    // a v15 frame is exactly the v13/14 frame minus 4 leading body
    // bytes — structural proof the field is gone, not defaulted
    val v14 = encodeFetchRequest(14, 9, "c", 50, 1, 1 << 20,
      Seq(("alpha", Seq((0, 7L, 1024)))))
    val v15 = encodeFetchRequest(15, 9, "c", 50, 1, 1 << 20,
      Seq(("alpha", Seq((0, 7L, 1024)))))
    assert(v14.length - v15.length === 4)
    // broker: a v16 fetch serves records end-to-end
    val root = Files.createTempDirectory("graft-fetch16").toString
    val broker = new Broker(spark, root)
    broker.createTopic("f16", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 1, "cli", null, 1, 30000,
          Seq(("f16", Seq((0, Seq(rec("a"), rec("b")))))))))
      val (_, topics) = decodeFetchResponse(16, exchange(sock,
        encodeFetchRequest(16, 2, "cli", 100, 1, 1 << 20,
          Seq(("f16", Seq((0, 0L, 1 << 20)))))),
        topicIdResolverFor(Seq("f16")))
      assert(topics.head._1 === "f16")
      assert(topics.head._2.head._4.map(r => new String(r._2.value, "UTF-8"))
        === Seq("a", "b"))
    } finally { sock.close(); server.close() }
  }

  test("v13 over the socket: produce by name, fetch by topic_id; unknown ids answer 100") {
    val root = Files.createTempDirectory("graft-fetch13").toString
    val broker = new Broker(spark, root)
    broker.createTopic("f13", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 1, "cli", null, 1, 30000,
          Seq(("f13", Seq((0, Seq(rec("a"), rec("b")))))))))
      val resolver = topicIdResolverFor(Seq("f13"))
      val (_, topics) = decodeFetchResponse(13, exchange(sock,
        encodeFetchRequest(13, 2, "cli", 100, 1, 1 << 20,
          Seq(("f13", Seq((0, 0L, 1 << 20)))))), resolver)
      assert(topics.head._1 === "f13")
      assert(topics.head._2.head._2 === 0)
      assert(topics.head._2.head._4.map(r => new String(r._2.value, "UTF-8"))
        === Seq("a", "b"))

      // a fabricated topic_id: per-partition 100, original id echoed,
      // connection survives
      val bogusId = Array.tabulate[Byte](16)(i => (i + 1).toByte)
      val (_, unknown) = decodeFetchResponse(13, exchange(sock,
        encodeFetchRequest(13, 3, "cli", 100, 1, 1 << 20,
          Seq(("ghost", Seq((0, 0L, 1 << 20)))),
          idOverrides = Map("ghost" -> bogusId))), resolver)
      assert(unknown.head._2.head._2 === 100)
      assert(isUnknownIdName(unknown.head._1))
      assert(unknown.head._1.endsWith(bogusId.map("%02x".format(_)).mkString))

      // the connection still serves after the unknown-id answer
      val (_, again) = decodeFetchResponse(13, exchange(sock,
        encodeFetchRequest(13, 4, "cli", 100, 1, 1 << 20,
          Seq(("f13", Seq((1, 0L, 1 << 20)))))), resolver)
      assert(again.head._2.head._2 === 0)
    } finally { sock.close(); server.close() }
  }

  test("v13 incremental fetch sessions keep working under id keying") {
    val root = Files.createTempDirectory("graft-fetch13-sess").toString
    val broker = new Broker(spark, root)
    broker.createTopic("s13", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      decodeProduceResponse(9, exchange(sock,
        encodeProduceRequest(9, 1, "cli", null, 1, 30000,
          Seq(("s13", Seq((0, Seq(rec("r0")))))))))
      val resolver = topicIdResolverFor(Seq("s13"))
      // epoch 0 opens a session
      val (_, _, sid, t0) = decodeFetchResponseFull(13, exchange(sock,
        encodeFetchRequest(13, 2, "cli", 100, 1, 1 << 20,
          Seq(("s13", Seq((0, 0L, 1 << 20)))), 0, 0)), resolver)
      assert(sid !== 0)
      assert(t0.head._2.head._4.size === 1)
      // incremental at the advanced offset: nothing new → omitted
      // (the id-keyed request entry merges into the remembered set)
      val (_, _, _, t1) = decodeFetchResponseFull(13, exchange(sock,
        encodeFetchRequest(13, 3, "cli", 100, 1, 1 << 20,
          Seq(("s13", Seq((0, 1L, 1 << 20)))), sid, 1)), resolver)
      assert(t1.flatMap(_._2).isEmpty)
    } finally { sock.close(); server.close() }
  }
}
