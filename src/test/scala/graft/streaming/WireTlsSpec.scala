package graft.streaming

import java.net.Socket
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Transport encryption for the wire listener (round 15 — the
  * reference README roadmap's "Encryption and Authentication" line):
  * a `WireServer` built with an `SSLContext` serves the IDENTICAL
  * framing/dispatch/SASL stack through JDK TLS. Covered here:
  * golden frames over the encrypted channel (metadata + produce/
  * consume round-trip), the full SCRAM challenge-response over TLS
  * (SASL_SSL — credentials AND challenge tokens encrypted in
  * transit), a plaintext client being rejected by the handshake,
  * and an untrusting client refusing the self-signed cert. The
  * keystore is generated per-run by the JDK's own keytool — no
  * checked-in key material. */
class WireTlsSpec extends AnyFunSuite {
  import KafkaWire._
  lazy val spark = TestSpark.spark

  /** One self-signed PKCS12 keystore per suite run. */
  private lazy val keystore: String = {
    val dir = Files.createTempDirectory("graft-tls").toString
    val ks = s"$dir/server.p12"
    val keytool = s"${System.getProperty("java.home")}/bin/keytool"
    val cmd = Seq(keytool, "-genkeypair", "-alias", "graft",
      "-keyalg", "RSA", "-keysize", "2048", "-validity", "2",
      "-storetype", "PKCS12", "-keystore", ks,
      "-storepass", "graft-test", "-dname", "CN=127.0.0.1")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val outText = new String(p.getInputStream.readAllBytes())
    assert(p.waitFor() == 0, s"keytool failed: $outText")
    ks
  }

  private def tlsServer(credentials: Map[String, String] = Map.empty)
      : (Broker, WireServer) = {
    val root = Files.createTempDirectory("graft-tls-srv").toString
    val broker = new Broker(spark, root)
    val server = new WireServer(broker, credentials = credentials,
      tls = Some(WireServer.serverSslContext(keystore, "graft-test"))).start()
    (broker, server)
  }

  private def tlsSocket(port: Int): Socket =
    WireServer.clientSslContext(keystore, "graft-test")
      .getSocketFactory.createSocket("127.0.0.1", port)

  test("golden frames over TLS: metadata and produce/fetch round-trip") {
    val (broker, server) = tlsServer()
    broker.createTopic("enc", 1)
    val sock = tlsSocket(server.boundPort)
    try {
      val md = decodeMetadataResponse(12, WireTestClient.exchange(sock,
        encodeMetadataRequest(12, 1, "cli", None)))
      assert(md.topics.map(_.name) === Seq("enc"))
      // a real produce lands through the encrypted channel...
      def rec(s: String) = WireRecordV2(1000L, null, s.getBytes("UTF-8"))
      val (_, prod) = decodeProduceResponse(9, WireTestClient.exchange(sock,
        encodeProduceRequest(9, 2, "cli", null, 1, 30000,
          Seq(("enc", Seq((0, Seq(rec("v1"), rec("v2")))))))))
      assert(prod === Seq(("enc", Seq((0, 0, 0L)))))
      // ...and fetches back byte-identical
      val (_, topics) = decodeFetchResponse(13, WireTestClient.exchange(sock,
        encodeFetchRequest(13, 3, "cli", 100, 1, 1 << 20,
          Seq(("enc", Seq((0, 0L, 1 << 20)))))),
        topicIdResolverFor(Seq("enc")))
      assert(topics.head._1 === "enc")
      assert(topics.head._2.head._4.map(r => new String(r._2.value, "UTF-8"))
        === Seq("v1", "v2"))
    } finally { sock.close(); server.close() }
  }

  test("SCRAM-over-TLS: the full challenge-response rides the encrypted channel") {
    val (broker, server) = tlsServer(Map("alice" -> "wonderland"))
    broker.createTopic("sec", 1)
    val sock = tlsSocket(server.boundPort)
    try {
      val (_, herr, mechs) = decodeSaslHandshakeResponse(
        WireTestClient.exchange(sock,
          encodeSaslHandshakeRequest(1, 1, "cli", "SCRAM-SHA-256")))
      assert(herr === 0)
      assert(mechs === WireServer.Mechanisms)
      val (err, mutual) = WireTestClient.scramLogin(sock, "alice", "wonderland")
      assert(err === 0)
      assert(mutual, "mutual authentication holds over TLS")
      val md = decodeMetadataResponse(12, WireTestClient.exchange(sock,
        encodeMetadataRequest(12, 5, "cli", None)))
      assert(md.topics.map(_.name) === Seq("sec"))
    } finally { sock.close(); server.close() }
  }

  test("a plaintext client cannot speak to a TLS listener") {
    val (_, server) = tlsServer()
    val sock = new Socket("127.0.0.1", server.boundPort)
    try {
      intercept[java.io.IOException] {
        // raw Kafka frame into a TLS handshake: the server rejects
        // the record layer; the client sees reset/EOF, never a frame
        WireTestClient.exchange(sock,
          encodeMetadataRequest(12, 1, "cli", None))
      }
    } finally { sock.close(); server.close() }
  }

  test("a client that does not trust the cert refuses the connection") {
    val (_, server) = tlsServer()
    // default JDK trust store does not contain the self-signed cert
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, null, null)
    val sock = ctx.getSocketFactory.createSocket("127.0.0.1", server.boundPort)
    try {
      intercept[javax.net.ssl.SSLHandshakeException] {
        WireTestClient.exchange(sock,
          encodeMetadataRequest(12, 1, "cli", None))
      }
    } finally { sock.close(); server.close() }
  }
}
