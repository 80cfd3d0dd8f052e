package graft.sources.mqtt

import java.net.{Socket, URI}
import scala.util.control.NonFatal
import MqttCodec._

/** Publish-side MQTT connection: CONNECT → stream of PUBLISH → DISCONNECT.
  * The outbound counterpart of [[MqttClient]] (which subscribes), used by
  * the routing sink's network publisher — the reference publishes each
  * routed record to its remote stream per message
  * (bin/mqtt-streamr.js:191-198). QoS 0, same delivery guarantee as the
  * reference's fire-and-forget publish.
  *
  * One instance per task/partition; not thread-safe.
  */
class MqttPublishConnection(
    url: String,
    clientId: String = s"graft-pub-${java.util.UUID.randomUUID()}",
    timeoutMs: Int = 10000)
    extends AutoCloseable {

  private val uri = new URI(url)
  require(uri.getScheme == "tcp", s"only tcp:// URLs supported, got $url")

  // Bounded connect AND read: a broker that accepts TCP but never sends
  // CONNACK (or stalls mid-stream) must surface as SocketTimeoutException
  // — which the publisher's NonFatal handler converts to a counted error —
  // rather than wedge the micro-batch; connect-refused alone isn't enough
  // to keep a dead broker from stalling a 1000-executor job.
  private val socket = new Socket()
  socket.connect(new java.net.InetSocketAddress(uri.getHost, uri.getPort), timeoutMs)
  socket.setSoTimeout(timeoutMs)
  private val out = socket.getOutputStream
  write(out, Connect(clientId))
  read(socket.getInputStream) match {
    case ConnAck(0) => ()
    case other => throw new java.io.IOException(s"connect refused: $other")
  }

  def publish(topic: String, payload: Array[Byte]): Unit =
    write(out, Publish(topic, payload))

  override def close(): Unit = {
    try { write(out, Disconnect); socket.close() }
    catch { case NonFatal(_) => () }
  }
}
