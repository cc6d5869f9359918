package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** KIP-714 client telemetry (GetTelemetrySubscriptions 71,
  * PushTelemetry 72, ListClientMetricsResources 74) and the
  * cursor-paginated DescribeTopicPartitions (75, AK 3.8+): the two
  * surfaces a 2026-era client/AdminClient touches on first contact
  * that the classic Metadata path doesn't cover. Codecs pinned by
  * hand-laid golden frames; semantics exercised over real sockets
  * (the reference roadmaps the broker surface, ref README.md:47–50).
  */
class TelemetryDtpSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  test("GetTelemetrySubscriptions request matches the hand-laid golden frame") {
    // header v2: api_key 71, version 0, corr 5, client "c", tags;
    // body: all-zero client_instance_id UUID (assign me one), tags
    val golden = (Array[Int](
      0x00, 0x00, 0x00, 0x1d, // frame size 29
      0x00, 0x47, // api_key 71
      0x00, 0x00, // version 0
      0x00, 0x00, 0x00, 0x05, // correlation id 5
      0x00, 0x01, 0x63, // client id "c" (legacy nullable string)
      0x00 // header tags
    ) ++ Array.fill(16)(0x00) ++ Array[Int](0x00)).map(_.toByte)
    assert(encodeGetTelemetrySubscriptionsRequest(5, "c",
      new Array[Byte](16)) === golden)
  }

  test("DescribeTopicPartitions request matches the hand-laid golden frame") {
    // body: topics [compact string "t"], limit 100, null cursor (one
    // 0xff byte — the nullable-struct marker this API introduced)
    val golden = Array[Int](
      0x00, 0x00, 0x00, 0x16, // frame size 22
      0x00, 0x4b, // api_key 75
      0x00, 0x00, // version 0
      0x00, 0x00, 0x00, 0x07, // correlation id 7
      0x00, 0x01, 0x63, // client id "c"
      0x00, // header tags
      0x02, // topics: compact array length 1 (+1)
      0x02, 0x74, // compact string "t"
      0x00, // topic tags
      0x00, 0x00, 0x00, 0x64, // response_partition_limit 100
      0xff, // cursor: null
      0x00 // body tags
    ).map(_.toByte)
    assert(encodeDescribeTopicPartitionsRequest(7, "c", Seq("t"), 100, None)
      === golden)
  }

  test("codec round-trips for all four new keys") {
    val iid = Array.tabulate[Byte](16)(i => (i + 1).toByte)
    val (c1, i1) = decodeGetTelemetrySubscriptionsRequest(
      encodeGetTelemetrySubscriptionsRequest(3, "cli", iid))
    assert(c1 === 3 && i1 === iid)
    val (c2, e2, i2, s2, comp, ivl, maxB, delta, metrics) =
      decodeGetTelemetrySubscriptionsResponse(
        encodeGetTelemetrySubscriptionsResponse(4, 0, iid, 99,
          Seq(1, 2, 3), 300000, 1048576, deltaTemporality = true,
          Seq("org.apache.kafka.consumer.")))
    assert(c2 === 4 && e2 === 0 && i2 === iid && s2 === 99)
    assert(comp === Seq(1, 2, 3) && ivl === 300000 && maxB === 1048576)
    assert(delta && metrics === Seq("org.apache.kafka.consumer."))

    val payload = Array[Byte](1, 2, 3, 4)
    val (c3, i3, s3, term, ct, m3) = decodePushTelemetryRequest(
      encodePushTelemetryRequest(5, "cli", iid, 99, terminating = true,
        compressionType = 0, payload))
    assert(c3 === 5 && i3 === iid && s3 === 99 && term && ct === 0)
    assert(m3 === payload)
    assert(decodePushTelemetryResponse(
      encodePushTelemetryResponse(6, 117)) === ((6, 117)))

    assert(decodeListClientMetricsResourcesRequest(
      encodeListClientMetricsResourcesRequest(7, "cli")) === 7)
    assert(decodeListClientMetricsResourcesResponse(
      encodeListClientMetricsResourcesResponse(8, 0, Seq("m1", "m2")))
      === ((8, 0, Seq("m1", "m2"))))

    val cursor = Some(DtpCursor("beta", 4))
    val (c4, t4, l4, cur4) = decodeDescribeTopicPartitionsRequest(
      encodeDescribeTopicPartitionsRequest(9, "cli", Seq("a", "b"), 50,
        cursor))
    assert(c4 === 9 && t4 === Seq("a", "b") && l4 === 50 && cur4 === cursor)
    val topics = Seq(
      DtpTopic(0, "a", topicUuid("a"), isInternal = false,
        Seq(DtpPartition(0, 0, 0, 0, Seq(0), Seq(0), None, None,
          Seq.empty),
          DtpPartition(0, 1, 0, 0, Seq(0), Seq(0), Some(Seq(1, 2)),
            Some(Seq.empty), Seq(3))),
        Int.MinValue),
      DtpTopic(3, "ghost", new Array[Byte](16), isInternal = false,
        Seq.empty, Int.MinValue))
    val (c5, t5, cur5) = decodeDescribeTopicPartitionsResponse(
      encodeDescribeTopicPartitionsResponse(10, topics, None))
    assert(c5 === 10 && cur5 === None)
    assert(t5.map(_.name) === Seq("a", "ghost"))
    assert(t5.head.partitions(1).eligibleLeaderReplicas === Some(Seq(1, 2)))
    assert(t5.head.partitions(1).lastKnownElr === Some(Seq.empty))
    assert(t5.head.partitions(1).offline === Seq(3))
    assert(t5(1).errorCode === 3)
    assert(t5.head.topicId === topicUuid("a"))
  }

  test("telemetry handshake + push lifecycle over a socket") {
    val root = Files.createTempDirectory("graft-telemetry").toString
    val broker = new Broker(spark, root)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // first contact with a zero instance id: broker assigns one
      val (_, err, iid, subId, comp, interval, maxBytes, _, metrics) =
        decodeGetTelemetrySubscriptionsResponse(exchange(sock,
          encodeGetTelemetrySubscriptionsRequest(1, "cli",
            new Array[Byte](16))))
      assert(err === 0)
      assert(!iid.forall(_ == 0), "broker must assign an instance id")
      assert(metrics === Seq.empty, "no subscription configured")
      assert(comp === Seq.empty)
      assert(interval === broker.TelemetryPushIntervalMs)
      assert(maxBytes === broker.TelemetryMaxBytes)

      // re-subscribing with the assigned id is stable
      val (_, _, iid2, subId2, _, _, _, _, _) =
        decodeGetTelemetrySubscriptionsResponse(exchange(sock,
          encodeGetTelemetrySubscriptionsRequest(2, "cli", iid)))
      assert(iid2 === iid && subId2 === subId)

      // push with the issued subscription id: accepted (and dropped)
      val (_, pe) = decodePushTelemetryResponse(exchange(sock,
        encodePushTelemetryRequest(3, "cli", iid, subId,
          terminating = false, compressionType = 0,
          Array[Byte](1, 2, 3))))
      assert(pe === 0)

      // wrong subscription id: UNKNOWN_SUBSCRIPTION_ID in-band
      val (_, pe2) = decodePushTelemetryResponse(exchange(sock,
        encodePushTelemetryRequest(4, "cli", iid, subId + 1,
          terminating = false, compressionType = 0, Array.empty)))
      assert(pe2 === 117)

      // oversize payload: TELEMETRY_TOO_LARGE, connection survives
      val (_, pe3) = decodePushTelemetryResponse(exchange(sock,
        encodePushTelemetryRequest(5, "cli", iid, subId,
          terminating = false, compressionType = 0,
          new Array[Byte](broker.TelemetryMaxBytes + 1))))
      assert(pe3 === 118)

      // no client-metrics resources configured
      val (_, le, names) = decodeListClientMetricsResourcesResponse(
        exchange(sock, encodeListClientMetricsResourcesRequest(6, "cli")))
      assert(le === 0 && names === Seq.empty)

      // distinct zero-id clients get distinct instance ids
      val (_, _, iid3, _, _, _, _, _, _) =
        decodeGetTelemetrySubscriptionsResponse(exchange(sock,
          encodeGetTelemetrySubscriptionsRequest(7, "cli",
            new Array[Byte](16))))
      assert(!(iid3 sameElements iid))
    } finally { sock.close(); server.close() }
  }

  test("DescribeTopicPartitions paginates every partition exactly once") {
    val root = Files.createTempDirectory("graft-dtp").toString
    val broker = new Broker(spark, root)
    broker.createTopic("alpha", 3)
    broker.createTopic("beta", 2)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // full describe-all in one page
      val (_, all, next0) = decodeDescribeTopicPartitionsResponse(
        exchange(sock, encodeDescribeTopicPartitionsRequest(1, "cli",
          Seq.empty, 100, None)))
      assert(next0 === None)
      assert(all.map(_.name) === Seq("alpha", "beta"), "name order")
      assert(all.head.partitions.map(_.index) === Seq(0, 1, 2))
      assert(all.head.topicId === topicUuid("alpha"))
      assert(all(1).partitions.map(_.index) === Seq(0, 1))

      // limit-2 pagination: walk the cursor, collect each partition once
      var cursor: Option[DtpCursor] = None
      var pages = 0
      val seen = Seq.newBuilder[(String, Int)]
      var done = false
      while (!done) {
        val (_, topics, next) = decodeDescribeTopicPartitionsResponse(
          exchange(sock, encodeDescribeTopicPartitionsRequest(10 + pages,
            "cli", Seq.empty, 2, cursor)))
        topics.foreach(t => t.partitions.foreach(p => seen += t.name -> p.index))
        pages += 1
        assert(pages <= 5, "cursor walk must terminate")
        if (next.isEmpty) done = true else cursor = next
      }
      assert(seen.result() === Seq("alpha" -> 0, "alpha" -> 1, "alpha" -> 2,
        "beta" -> 0, "beta" -> 1))
      assert(pages === 3, "5 partitions at limit 2 = 3 pages")

      // explicit list: unknown names answer 3 with a zero id and
      // consume no budget; known names still serve in full
      val (_, mixed, _) = decodeDescribeTopicPartitionsResponse(
        exchange(sock, encodeDescribeTopicPartitionsRequest(20, "cli",
          Seq("ghost", "beta"), 100, None)))
      assert(mixed.map(_.name) === Seq("beta", "ghost"))
      assert(mixed.head.errorCode === 0)
      assert(mixed.head.partitions.length === 2)
      assert(mixed(1).errorCode === 3)
      assert(mixed(1).topicId === new Array[Byte](16))
    } finally { sock.close(); server.close() }
  }
}
