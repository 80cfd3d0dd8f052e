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
    clientId: String = s"graft-pub-${java.util.UUID.randomUUID()}")
    extends AutoCloseable {

  private val uri = new URI(url)
  require(uri.getScheme == "tcp", s"only tcp:// URLs supported, got $url")

  private val socket = new Socket(uri.getHost, uri.getPort)
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
