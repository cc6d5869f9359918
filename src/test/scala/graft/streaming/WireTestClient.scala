package graft.streaming

import java.io.DataInputStream
import java.net.Socket

/** Shared raw-socket RPC helper for the wire specs: write one framed
  * request, read back one framed response — re-framed with its size
  * prefix so the `KafkaWire.decode*` helpers can unframe it. Every
  * wire spec used to carry its own copy of this 13-line loop; a
  * framing change now lands in exactly one place. */
object WireTestClient {
  def readFrame(sock: Socket): Array[Byte] = {
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

  def exchange(sock: Socket, request: Array[Byte]): Array[Byte] = {
    sock.getOutputStream.write(request)
    sock.getOutputStream.flush()
    readFrame(sock)
  }
}
