package graft.streaming

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.UTF_8

/** Kafka wire-protocol codec for the ApiVersions exchange — the one
  * API the reference broker actually implements (ref:
  * pkg/kafka/kafka_api.go:99 HandleApiVersions, framing in
  * pkg/kafka/kafka_connectian_handler.go). Byte layout follows the
  * PUBLIC Kafka protocol spec (flexible versions, KIP-482):
  *
  *  - frame: INT32 big-endian size prefix (size excludes itself);
  *  - request header v2: api_key INT16, api_version INT16,
  *    correlation_id INT32, client_id NULLABLE_STRING (INT16-length),
  *    tagged-field count UVARINT;
  *  - ApiVersions v3 request body: client_software_name and
  *    client_software_version as COMPACT_STRINGs (UVARINT length+1),
  *    tagged fields;
  *  - ApiVersions v3 response: header v0 (correlation_id only — the
  *    protocol special-cases ApiVersions responses so old clients can
  *    parse errors), then error_code INT16, api_keys COMPACT_ARRAY of
  *    (api_key INT16, min INT16, max INT16, tags), throttle_time_ms
  *    INT32, tags.
  */
object KafkaWire {

  val ApiVersionsApiKey = 18

  case class ApiVersionsRequest(apiVersion: Int, correlationId: Int,
      clientId: String, softwareName: String, softwareVersion: String)

  case class ApiVersionsResponse(correlationId: Int, errorCode: Int,
      apiKeys: Seq[(Int, Int, Int)], throttleTimeMs: Int)

  // --- primitives ---

  private def writeUVarInt(out: ByteArrayOutputStream, value: Int): Unit = {
    var v = value
    while ((v & ~0x7f) != 0) {
      out.write((v & 0x7f) | 0x80)
      v >>>= 7
    }
    out.write(v)
  }

  private def readUVarInt(buf: ByteBuffer): Int = {
    var value = 0
    var shift = 0
    var b = 0
    do {
      b = buf.get() & 0xff
      value |= (b & 0x7f) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    value
  }

  private def writeInt16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def writeInt32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  /** INT16-length-prefixed string (-1 = null) — request-header form. */
  private def writeNullableString(out: ByteArrayOutputStream, s: String): Unit =
    if (s == null) writeInt16(out, -1)
    else {
      val b = s.getBytes(UTF_8)
      writeInt16(out, b.length); out.write(b, 0, b.length)
    }

  private def readNullableString(buf: ByteBuffer): String = {
    val n = buf.getShort.toInt
    if (n < 0) null
    else {
      val b = new Array[Byte](n); buf.get(b); new String(b, UTF_8)
    }
  }

  /** UVARINT(length+1)-prefixed string — flexible-version form. */
  private def writeCompactString(out: ByteArrayOutputStream, s: String): Unit = {
    val b = s.getBytes(UTF_8)
    writeUVarInt(out, b.length + 1); out.write(b, 0, b.length)
  }

  private def readCompactString(buf: ByteBuffer): String = {
    val n = readUVarInt(buf) - 1
    val b = new Array[Byte](n); buf.get(b); new String(b, UTF_8)
  }

  /** Skip a tagged-fields block (we emit none; tolerate any). */
  private def readTags(buf: ByteBuffer): Unit = {
    val n = readUVarInt(buf)
    var i = 0
    while (i < n) {
      readUVarInt(buf) // tag
      val size = readUVarInt(buf)
      buf.position(buf.position() + size)
      i += 1
    }
  }

  private def frame(payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 4)
    writeInt32(out, payload.length)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private def unframe(bytes: Array[Byte]): ByteBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val size = buf.getInt
    require(size == bytes.length - 4,
      s"bad frame: size prefix $size vs ${bytes.length - 4} payload bytes")
    buf
  }

  // --- ApiVersions v3 ---

  /** Client-side encode (what a Kafka client puts on the wire). */
  def encodeApiVersionsRequestV3(correlationId: Int, clientId: String,
      softwareName: String, softwareVersion: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeInt16(out, ApiVersionsApiKey) // header v2
    writeInt16(out, 3)
    writeInt32(out, correlationId)
    writeNullableString(out, clientId)
    writeUVarInt(out, 0) // header tags
    writeCompactString(out, softwareName) // body
    writeCompactString(out, softwareVersion)
    writeUVarInt(out, 0) // body tags
    frame(out.toByteArray)
  }

  /** Server-side decode of a framed ApiVersions v3 request. */
  def decodeApiVersionsRequestV3(bytes: Array[Byte]): ApiVersionsRequest = {
    val buf = unframe(bytes)
    val apiKey = buf.getShort.toInt
    require(apiKey == ApiVersionsApiKey, s"api key $apiKey is not ApiVersions")
    val apiVersion = buf.getShort.toInt
    val correlationId = buf.getInt
    val clientId = readNullableString(buf)
    readTags(buf)
    val name = readCompactString(buf)
    val version = readCompactString(buf)
    readTags(buf)
    ApiVersionsRequest(apiVersion, correlationId, clientId, name, version)
  }

  /** Server-side encode of the framed ApiVersions v3 response. */
  def encodeApiVersionsResponseV3(correlationId: Int,
      apiKeys: Seq[(Int, Int, Int)], errorCode: Int = 0,
      throttleTimeMs: Int = 0): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    writeInt32(out, correlationId) // response header v0 (special case)
    writeInt16(out, errorCode)
    writeUVarInt(out, apiKeys.length + 1) // compact array
    apiKeys.foreach { case (key, min, max) =>
      writeInt16(out, key); writeInt16(out, min); writeInt16(out, max)
      writeUVarInt(out, 0) // entry tags
    }
    writeInt32(out, throttleTimeMs)
    writeUVarInt(out, 0) // body tags
    frame(out.toByteArray)
  }

  /** Client-side decode (round-trip check). */
  def decodeApiVersionsResponseV3(bytes: Array[Byte]): ApiVersionsResponse = {
    val buf = unframe(bytes)
    val correlationId = buf.getInt
    val errorCode = buf.getShort.toInt
    val n = readUVarInt(buf) - 1
    val keys = (0 until n).map { _ =>
      val k = (buf.getShort.toInt, buf.getShort.toInt, buf.getShort.toInt)
      readTags(buf)
      k
    }
    val throttle = buf.getInt
    readTags(buf)
    ApiVersionsResponse(correlationId, errorCode, keys, throttle)
  }

  /** The full server exchange: framed request bytes in, framed
    * response bytes (for the given catalog) out — the Spark-native
    * analog of the reference's connection handler dispatch. */
  def handleApiVersions(requestBytes: Array[Byte],
      catalog: Seq[(Int, String, Int, Int)]): Array[Byte] = {
    val req = decodeApiVersionsRequestV3(requestBytes)
    encodeApiVersionsResponseV3(req.correlationId,
      catalog.map(t => (t._1, t._3, t._4)))
  }
}
