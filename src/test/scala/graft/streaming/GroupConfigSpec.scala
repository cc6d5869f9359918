package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Per-group dynamic config — ConfigResource type GROUP (32), the
  * AK 4.0 surface `kafka-configs --entity-type groups` drives
  * (KIP-848/932 group configs): alterations land through key 44 with
  * the shared validator discipline, DescribeConfigs echoes overrides
  * as dynamic, and every served key has a REAL enforcement hook —
  * the share pair binds at ShareGroup instantiation, the timing pair
  * is re-read by the coordinator on every access. */
class GroupConfigSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  private def exchange(sock: Socket, request: Array[Byte]): Array[Byte] =
    WireTestClient.exchange(sock, request)

  test("group configs alter, describe, validate, and persist by name") {
    val root = Files.createTempDirectory("graft-groupcfg").toString
    val broker = new Broker(spark, root)
    broker.createTopic("t", 1)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // SET two keys through key 44 at resource type 32
      val (_, res) = decodeIncrementalAlterConfigsResponse(1,
        exchange(sock, encodeIncrementalAlterConfigsRequest(1, 1, "cli",
          Seq((ConfigResourceGroup, "jobs", Seq(
            ("share.delivery.attempt.limit", 0, "2"),
            ("share.record.lock.duration.ms", 0, "5000")))))))
      assert(res === Seq((0, null, ConfigResourceGroup, "jobs")))

      // describe echoes the overrides as DYNAMIC, defaults otherwise
      val (_, desc) = decodeDescribeConfigsResponse(4, exchange(sock,
        encodeDescribeConfigsRequest(4, 2, "cli",
          Seq((ConfigResourceGroup, "jobs", None)))))
      assert(desc.head._1 === 0)
      val confs = desc.head._5.map(c => c._1 -> ((c._2, c._3))).toMap
      assert(confs("share.delivery.attempt.limit") === (("2", true)))
      assert(confs("share.record.lock.duration.ms") === (("5000", true)))
      assert(confs("share.session.timeout.ms") === (("45000", false)))
      assert(confs("share.heartbeat.interval.ms") === (("3000", false)))

      // the shared-validator discipline: unknown keys and bogus
      // values answer INVALID_CONFIG 40, nothing is applied
      val (_, bad) = decodeIncrementalAlterConfigsResponse(1,
        exchange(sock, encodeIncrementalAlterConfigsRequest(1, 3, "cli",
          Seq((ConfigResourceGroup, "jobs", Seq(("nope", 0, "1")))))))
      assert(bad.head._1 === 40)
      val (_, bad2) = decodeIncrementalAlterConfigsResponse(1,
        exchange(sock, encodeIncrementalAlterConfigsRequest(1, 4, "cli",
          Seq((ConfigResourceGroup, "jobs", Seq(
            ("share.session.timeout.ms", 0, "soon")))))))
      assert(bad2.head._1 === 40)

      // ENFORCEMENT: the ShareGroup the broker instantiates for this
      // group carries the altered budget and lock duration
      val sg = broker.shareGroup("t", "jobs")
      assert(sg.maxDeliveryAttempts === 2)
      assert(sg.acquisitionLockMs === 5000L)
      // ... and the heartbeat response serves the configured interval
      decodeIncrementalAlterConfigsResponse(1,
        exchange(sock, encodeIncrementalAlterConfigsRequest(1, 5, "cli",
          Seq((ConfigResourceGroup, "jobs", Seq(
            ("share.heartbeat.interval.ms", 0, "750")))))))
      val (_, hbErr, _, _, _, interval, _) =
        decodeShareGroupHeartbeatResponse(exchange(sock,
          encodeShareGroupHeartbeatRequest(6, "cli", "jobs", "", 0,
            Seq("t"))))
      assert(hbErr === 0 && interval === 750)

      // DELETE one key: the default returns; the config survives a
      // cold broker (by-name persistence, no group liveness needed)
      decodeIncrementalAlterConfigsResponse(1,
        exchange(sock, encodeIncrementalAlterConfigsRequest(1, 7, "cli",
          Seq((ConfigResourceGroup, "jobs", Seq(
            ("share.record.lock.duration.ms", 1, null)))))))
      val cold = new Broker(spark, root)
      assert(cold.groupConfigOverrides("jobs")
        === Map("share.delivery.attempt.limit" -> "2",
          "share.heartbeat.interval.ms" -> "750"))
    } finally {
      sock.close()
      server.close()
    }
  }

  test("share.auto.offset.reset=latest starts a fresh group at the log end, durably") {
    val root = Files.createTempDirectory("graft-reset").toString
    val broker = new Broker(spark, root)
    val log = broker.createTopic("r", 1)
    import spark.implicits._
    def produce(tag: String, n: Int): Unit =
      log.produce((0 until n).toDF("i").select(col("i"),
        lit(null).cast("binary").as("key"),
        concat(lit(tag), col("i").cast("string")).cast("binary").as("value")),
        Partitioners.byLongKey(1, lit(0L)))
    produce("old", 4)
    val server = new WireServer(broker).start()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      // the policy lands over the wire, validated as an enum
      val (_, ok) = decodeIncrementalAlterConfigsResponse(1,
        exchange(sock, encodeIncrementalAlterConfigsRequest(1, 1, "cli",
          Seq((ConfigResourceGroup, "tail", Seq(
            ("share.auto.offset.reset", 0, "latest")))))))
      assert(ok === Seq((0, null, ConfigResourceGroup, "tail")))
      val (_, bad) = decodeIncrementalAlterConfigsResponse(1,
        exchange(sock, encodeIncrementalAlterConfigsRequest(1, 2, "cli",
          Seq((ConfigResourceGroup, "tail", Seq(
            ("share.auto.offset.reset", 0, "newest")))))))
      assert(bad.head._1 === 40)

      // a FRESH group under the policy starts past the old records...
      val sg = broker.shareGroup("r", "tail")
      assert(sg.startOffset(0) === 4L)
      assert(sg.acquire(0, 10, 1000L, "c").isEmpty, "nothing old delivers")
      // ... sees only records produced after its creation ...
      produce("new", 2)
      val got = sg.acquire(0, 10, 2000L, "c")
      assert(got.map(_.offset) === Seq(4L, 5L))
      // ... and the reset is DURABLE: a reopen does not re-run it
      // over data that arrived since (the SPSO snapshot is the truth)
      val cold = new Broker(spark, root)
      assert(cold.shareGroup("r", "tail").startOffset(0) === 4L)
      // the default policy is unchanged: a fresh group drains from 0
      assert(broker.shareGroup("r", "scratch").startOffset(0) === 0L)
    } finally {
      sock.close()
      server.close()
    }
  }

  test("the configured session timeout drives coordinator expiry") {
    val c = new ShareCoordinator(_ => Some(1),
      groupConfig = g =>
        if (g == "fast") Map("share.session.timeout.ms" -> "100")
        else Map.empty)
    val j = c.heartbeat("fast", "", 0, null, Seq("t"), "x", 1000L)
    assert(j.error === 0)
    // past the CONFIGURED timeout (100 ms), far under the 45 s default
    assert(c.describe("fast", 1000L + 101).map(_._4.length) === Some(0))
    val jd = c.heartbeat("slow", "", 0, null, Seq("t"), "x", 1000L)
    assert(c.describe("slow", 1000L + 101)
      .map(_._4.map(_._1)) === Some(Seq(jd.memberId)))
  }
}
