package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Client quotas (DescribeClientQuotas 48 / AlterClientQuotas 49,
  * KIP-546) with real enforcement: the sliding-window rate meter's
  * throttle math, Kafka's 8-level entity resolution precedence,
  * durable `_quotas` CAS snapshots, codec round-trips at v0/v1, and
  * the wire lifecycle — alter → describe → a produce/fetch that
  * exceeds its byte rate answers a positive throttle_time_ms (and is
  * held, bounded), with the quota surviving a broker restart. */
class QuotaSpec extends AnyFunSuite {
  import KafkaWire._
  import Quotas._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  private def named(u: String): Option[Option[String]] = Some(Some(u))
  private val dflt: Option[Option[String]] = Some(None)

  test("rate meter: throttle is the delay that restores the quota") {
    val m = new RateMeter(windowSec = 10)
    val t0 = 1000000000L
    m.record(500, t0)
    assert(m.throttleMs(100.0, t0) === 0L) // 500 <= 100*10 allowed
    m.record(700, t0 + 100)
    // 1200 observed vs 1000 allowed at 100 B/s -> 2000 ms to repay
    assert(m.throttleMs(100.0, t0 + 100) === 2000L)
    // buckets age out of the window
    assert(m.throttleMs(100.0, t0 + 11000) === 0L)
    // no quota -> never throttles
    assert(m.throttleMs(0.0, t0) === 0L)
  }

  test("entity resolution follows Kafka's precedence order") {
    val dir = Files.createTempDirectory("graft-quota-res")
    val mgr = new Manager(dir)
    val levels = Seq(
      Entity(named("u"), Some(Some("c"))), Entity(named("u"), dflt),
      Entity(named("u"), None), Entity(dflt, Some(Some("c"))),
      Entity(dflt, dflt), Entity(dflt, None),
      Entity(None, Some(Some("c"))), Entity(None, dflt))
    // install them most-specific LAST so each step's winner is the
    // newly-added more-specific entry
    levels.reverse.zipWithIndex.foreach { case (e, i) =>
      mgr.alter(e, Seq((ProducerByteRate, (i + 1) * 100.0)), Seq.empty)
      assert(mgr.resolve("u", "c", ProducerByteRate).map(_._1)
        === Some(e), s"after adding $e")
    }
    // a different user with the same client falls to /users/def/clients/c
    assert(mgr.resolve("other", "c", ProducerByteRate).map(_._1)
      === Some(Entity(dflt, Some(Some("c")))))
    // unrelated key resolves nothing
    assert(mgr.resolve("u", "c", ConsumerByteRate) === None)
  }

  test("quota store round-trips and reloads, snapshots pruned") {
    val dir = Files.createTempDirectory("graft-quota-store")
    val m1 = new Manager(dir)
    m1.alter(Entity(named("u \"x\""), None),
      Seq((ProducerByteRate, 1234.5), (RequestPercentage, 55.0)), Seq.empty)
    m1.alter(Entity(None, dflt), Seq((ConsumerByteRate, 9.25)), Seq.empty)
    val m2 = new Manager(dir)
    assert(m2.current === m1.current)
    assert(m2.current(Entity(named("u \"x\""), None))(ProducerByteRate) === 1234.5)
    // removes persist too; removing the last key drops the entity
    m2.alter(Entity(None, dflt), Seq.empty, Seq(ConsumerByteRate))
    val m3 = new Manager(dir)
    assert(!m3.current.contains(Entity(None, dflt)))
    // prune keeps a bounded tail (v-2..v), never the whole history
    val files = TopicLog.listDir(dir).map(_.getFileName.toString)
      .filter(_.endsWith(".json"))
    assert(files.size <= 3)
  }

  test("codec round-trips at v0 and v1") {
    val e = Entity(named("alice"), Some(Some("cli-1")))
    val ed = Entity(dflt, None)
    (0 to 1).foreach { v =>
      val (dv, corr, comps, strict) = decodeDescribeClientQuotasRequest(
        encodeDescribeClientQuotasRequest(v, 5, "c",
          Seq((EntityUser, 0, "alice"), (EntityClientId, 2, null)),
          strict = true))
      assert(dv === v && corr === 5 && strict)
      assert(comps === Seq((EntityUser, 0, "alice"), (EntityClientId, 2, null)))
      val (_, err, msg, entries) = decodeDescribeClientQuotasResponse(
        encodeDescribeClientQuotasResponse(v, 6, 0, null, Seq(
          (e, Seq((ProducerByteRate, 1024.0))),
          (ed, Seq((ConsumerByteRate, 2048.5), (RequestPercentage, 50.0))))), v)
      assert(err === 0 && msg === null)
      assert(entries === Seq(
        (e, Seq((ProducerByteRate, 1024.0))),
        (ed, Seq((ConsumerByteRate, 2048.5), (RequestPercentage, 50.0)))))
      val (av, acorr, aentries, vo) = decodeAlterClientQuotasRequest(
        encodeAlterClientQuotasRequest(v, 7, "c", Seq(
          (e, Seq((ProducerByteRate, 512.0, false),
            (ConsumerByteRate, 0.0, true)))), validateOnly = false))
      assert(av === v && acorr === 7 && !vo)
      assert(aentries === Seq((e, Seq((ProducerByteRate, 512.0, false),
        (ConsumerByteRate, 0.0, true)))))
      val (_, results) = decodeAlterClientQuotasResponse(
        encodeAlterClientQuotasResponse(v, 8,
          Seq((0, null, e), (42, "bad", ed))), v)
      assert(results === Seq((0, null, e), (42, "bad", ed)))
    }
  }

  test("wire lifecycle: alter, describe, throttled produce/fetch, restart") {
    val root = Files.createTempDirectory("graft-quota-wire").toString
    val broker = new Broker(spark, root)
    broker.createTopic("qt", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // 1. validation: unknown key, empty entity, non-positive value
      val slowE = Entity(None, Some(Some("slow-cli")))
      val (_, bad) = decodeAlterClientQuotasResponse(exchange(sock,
        encodeAlterClientQuotasRequest(1, 1, "cli", Seq(
          (slowE, Seq(("bogus_rate", 1.0, false))),
          (Entity(None, None), Seq((ProducerByteRate, 1.0, false))),
          (slowE, Seq((ProducerByteRate, -5.0, false)))),
          validateOnly = false)), 1)
      assert(bad.map(_._1) === Seq(42, 42, 42))

      // 2. set a tight producer quota for slow-cli + a consumer quota
      val (_, made) = decodeAlterClientQuotasResponse(exchange(sock,
        encodeAlterClientQuotasRequest(1, 2, "cli", Seq(
          (slowE, Seq((ProducerByteRate, 100.0, false),
            (ConsumerByteRate, 100.0, false)))),
          validateOnly = false)), 1)
      assert(made === Seq((0, null, slowE)))

      // 3. describe finds it (exact and any-specified matches)
      val (_, derr, _, entries) = decodeDescribeClientQuotasResponse(
        exchange(sock, encodeDescribeClientQuotasRequest(1, 3, "cli",
          Seq((EntityClientId, 0, "slow-cli")), strict = false)), 1)
      assert(derr === 0)
      assert(entries === Seq((slowE,
        Seq((ConsumerByteRate, 100.0), (ProducerByteRate, 100.0)))))

      // 4. an unquota'd client produces with throttle 0
      val recs = (0 until 40).map(i => WireRecordV2(1700000000000L + i,
        null, ("v" * 50 + i).getBytes))
      val (_, okParts, t0) = decodeProduceResponseFull(3, exchange(sock,
        encodeProduceRequest(3, 4, "free-cli", null, 1, 30000,
          Seq(("qt", Seq((0, recs)))))))
      assert(okParts.head._2.head._2 === 0 && t0 === 0)

      // 5. slow-cli blows its 100 B/s budget in one request -> a
      // positive throttle rides the response and the response is held
      val before = System.nanoTime()
      val (_, sParts, t1) = decodeProduceResponseFull(3, exchange(sock,
        encodeProduceRequest(3, 5, "slow-cli", null, 1, 30000,
          Seq(("qt", Seq((0, recs)))))))
      val heldMs = (System.nanoTime() - before) / 1000000
      assert(sParts.head._2.head._2 === 0) // throttled, not rejected
      assert(t1 > 0)
      assert(heldMs >= 900, s"expected the bounded hold, got ${heldMs}ms")

      // 6. fetch under the consumer quota: first fetch meters enough
      // bytes that the next one throttles
      def fetchThrottle(corr: Int): Int = {
        val resp = exchange(sock, encodeFetchRequest(4, corr, "slow-cli",
          0, 1, 1 << 20, Seq(("qt", Seq((0, 0L, 1 << 20))))))
        // v4 non-flexible: size(4) + corr(4), then throttle_time_ms
        java.nio.ByteBuffer.wrap(resp, 8, 4).getInt
      }
      val ft1 = fetchThrottle(6)
      val ft2 = fetchThrottle(7)
      assert(ft2 > 0, s"second fetch should throttle (first=$ft1)")
    } finally { sock.close(); server.close() }

    // 7. quotas survive restart (durable _quotas)
    val broker2 = new Broker(spark, root)
    val server2 = new WireServer(broker2).start()
    val sock2 = new Socket("127.0.0.1", server2.boundPort)
    try {
      val (_, _, _, entries2) = decodeDescribeClientQuotasResponse(
        exchange(sock2, encodeDescribeClientQuotasRequest(1, 10, "cli",
          Seq((EntityClientId, 2, null)), strict = false)), 1)
      assert(entries2.map(_._1) === Seq(Entity(None, Some(Some("slow-cli")))))
    } finally { sock2.close(); server2.close() }
  }

  test("request_percentage meters handler time and holds the response") {
    val root = Files.createTempDirectory("graft-quota-req").toString
    val broker = new Broker(spark, root)
    broker.createTopic("rp", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // percentage 0.1 → 1 ms of handler time per second: a couple of
      // real requests overrun the budget and the next response is held
      val e = Entity(None, Some(Some("busy-cli")))
      val (_, made) = decodeAlterClientQuotasResponse(exchange(sock,
        encodeAlterClientQuotasRequest(1, 1, "cli",
          Seq((e, Seq((RequestPercentage, 0.1, false)))),
          validateOnly = false)), 1)
      assert(made === Seq((0, null, e)))

      def produce(corr: Int): Long = {
        val t0 = System.nanoTime()
        exchange(sock, encodeProduceRequest(3, corr, "busy-cli", null, 1,
          30000, Seq(("rp", Seq((0, Seq(WireRecordV2(-1L, "k".getBytes,
            ("v" * 2048).getBytes))))))))
        (System.nanoTime() - t0) / 1000000L
      }
      // burn handler time until the meter overruns, then observe the
      // bounded hold on a subsequent request
      (0 until 5).foreach(i => produce(10 + i))
      val held = produce(20)
      assert(held >= 500,
        s"expected the request_percentage hold, got ${held}ms")
      // a different client id is not governed: no hold
      val t0 = System.nanoTime()
      exchange(sock, encodeProduceRequest(3, 21, "free-cli", null, 1,
        30000, Seq(("rp", Seq((0, Seq(WireRecordV2(-1L, "k".getBytes,
          "v".getBytes))))))))
      val free = (System.nanoTime() - t0) / 1000000L
      assert(free < 500, s"ungoverned client held ${free}ms")

      // long-poll park time is NOT handler time: a caught-up consumer
      // waiting max_wait_ms under the same tight quota must not
      // throttle itself by waiting (KIP-74 purgatory exclusion)
      // 5% = 50 ms/s: empty-fetch handler time stays far below, but
      // the ~1.8 s of PARK below would blow it ~4× if it were metered
      val lpE = Entity(None, Some(Some("lp-cli")))
      decodeAlterClientQuotasResponse(exchange(sock,
        encodeAlterClientQuotasRequest(1, 30, "cli",
          Seq((lpE, Seq((RequestPercentage, 5.0, false)))),
          validateOnly = false)), 1)
      def parkedFetch(corr: Int): Long = {
        val t = System.nanoTime()
        // fetch past the log end with min_bytes 1, max_wait 600 ms:
        // parks the full window, serves nothing
        exchange(sock, encodeFetchRequest(4, corr, "lp-cli", 600, 1,
          1 << 20, Seq(("rp", Seq((0, 1000000L, 1 << 20))))))
        (System.nanoTime() - t) / 1000000L
      }
      (0 until 3).foreach(i => parkedFetch(40 + i)) // ~1.8 s parked
      // were park time metered, the 50 ms/s budget would be ~4× over
      // and this response would hit the bounded 1 s hold
      val after = parkedFetch(50)
      assert(after < 1400,
        s"parked fetch throttled (${after}ms) — park time was metered")
    } finally { sock.close(); server.close() }
  }

  test("byte-rate holds are not handler time; concurrent quotas mute for max, not sum") {
    val root = Files.createTempDirectory("graft-quota-maxhold").toString
    val broker = new Broker(spark, root)
    broker.createTopic("mh", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // BOTH a tight byte quota and a request quota on one entity:
      // each over-budget produce sleeps ~1 s in the byte-rate hold.
      // Were that sleep metered as handler time, one held response
      // would record ~100% of a thread-second against the 500 ms/s
      // request budget and the two holds would stack — every
      // subsequent response would take ~2 s (byte hold + request
      // hold), a self-amplifying over-throttle. The contract is
      // Kafka's: mute for max(byteThrottle, requestThrottle).
      val e = Entity(None, Some(Some("both-cli")))
      val (_, made) = decodeAlterClientQuotasResponse(exchange(sock,
        encodeAlterClientQuotasRequest(1, 1, "cli",
          Seq((e, Seq((ProducerByteRate, 100.0, false),
            (RequestPercentage, 50.0, false)))),
          validateOnly = false)), 1)
      assert(made === Seq((0, null, e)))
      val recs = (0 until 40).map(i => WireRecordV2(1700000000000L + i,
        null, ("v" * 50 + i).getBytes))
      def produce(corr: Int): Long = {
        val t0 = System.nanoTime()
        exchange(sock, encodeProduceRequest(3, corr, "both-cli", null, 1,
          30000, Seq(("mh", Seq((0, recs))))))
        (System.nanoTime() - t0) / 1000000L
      }
      produce(10) // meters the first burst of bytes
      val times = (0 until 3).map(i => produce(11 + i))
      assert(times.forall(_ >= 900),
        s"byte quota should hold each over-budget produce, got $times")
      assert(times.forall(_ < 1700),
        s"holds stacked (byte + request ≈ 2 s) — expected max(), got $times")
    } finally { sock.close(); server.close() }
  }

  test("quota admin sits behind the cluster config ACLs") {
    val root = Files.createTempDirectory("graft-quota-acl").toString
    val broker = new Broker(spark, root)
    broker.enableAuthorizer(superUsers = Set("User:admin"))
    val server = new WireServer(broker,
      credentials = Map("bob" -> "pw")).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      val (_, herr, _) = decodeSaslHandshakeResponse(
        exchange(sock, encodeSaslHandshakeRequest(1, 1, "cli", "PLAIN")))
      assert(herr === 0)
      val NUL = Array[Byte](0)
      val (_, aerr, _, _) = decodeSaslAuthenticateResponse(1, exchange(sock,
        encodeSaslAuthenticateRequest(1, 2, "cli",
          NUL ++ "bob".getBytes ++ NUL ++ "pw".getBytes)))
      assert(aerr === 0)
      val e = Entity(None, Some(Some("c")))
      val (_, denied) = decodeAlterClientQuotasResponse(exchange(sock,
        encodeAlterClientQuotasRequest(1, 3, "cli",
          Seq((e, Seq((ProducerByteRate, 10.0, false)))),
          validateOnly = false)), 1)
      assert(denied.map(_._1) === Seq(31))
      val (_, derr2, _, _) = decodeDescribeClientQuotasResponse(exchange(sock,
        encodeDescribeClientQuotasRequest(1, 4, "cli", Seq.empty,
          strict = false)), 1)
      assert(derr2 === 31)
    } finally { sock.close(); server.close() }
  }
}
