package graft

import java.net.{ServerSocket, Socket}
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicBoolean
import scala.util.control.NonFatal
import graft.sources.mqtt.MqttCodec
import graft.sources.mqtt.MqttCodec._

/** Tiny in-JVM MQTT 3.1.1 broker for connector tests: accepts CONNECT and
  * SUBSCRIBE, fans PUBLISHed messages out to matching subscribers (`+`/`#`
  * wildcards). QoS 0 only.
  */
class MqttTestBroker(port0: Int = 0) extends AutoCloseable {
  private val server = new ServerSocket(port0)
  val port: Int = server.getLocalPort
  val url = s"tcp://127.0.0.1:$port"
  private val running = new AtomicBoolean(true)

  private case class Sub(socket: Socket, filters: Seq[String])
  private val subs = new CopyOnWriteArrayList[Sub]()

  private val acceptThread = new Thread(() => {
    while (running.get()) {
      try {
        val s = server.accept()
        new Thread(() => handle(s), "mqtt-broker-conn").start()
      } catch { case NonFatal(_) => () }
    }
  }, "mqtt-broker-accept")
  acceptThread.setDaemon(true)
  acceptThread.start()

  private def handle(s: Socket): Unit = {
    try {
      var connected = true
      while (connected && running.get()) {
        MqttCodec.read(s.getInputStream) match {
          case Connect(_, _) => MqttCodec.write(s.getOutputStream, ConnAck(0))
          case Subscribe(pid, topics) =>
            subs.add(Sub(s, topics))
            MqttCodec.write(s.getOutputStream, SubAck(pid, topics.map(_ => 0)))
          case Publish(topic, payload) => fanout(topic, payload)
          case PingReq => MqttCodec.write(s.getOutputStream, PingResp)
          case Disconnect => connected = false
          case _ => ()
        }
      }
    } catch { case NonFatal(_) => () }
    finally {
      subs.removeIf(_.socket eq s)
      try s.close() catch { case NonFatal(_) => () }
    }
  }

  /** Broker-side publish (what an external producer would do). */
  def publish(topic: String, payload: String): Unit =
    fanout(topic, payload.getBytes("UTF-8"))

  /** Raw-bytes publish, e.g. payloads that are not valid UTF-8. */
  def publishBytes(topic: String, payload: Array[Byte]): Unit =
    fanout(topic, payload)

  private def fanout(topic: String, payload: Array[Byte]): Unit =
    subs.forEach { sub =>
      if (sub.filters.exists(MqttCodec.topicMatches(_, topic)))
        try MqttCodec.write(sub.socket.getOutputStream, Publish(topic, payload))
        catch { case NonFatal(_) => subs.remove(sub) }
    }

  def subscriberCount: Int = subs.size()

  override def close(): Unit = {
    running.set(false)
    try server.close() catch { case NonFatal(_) => () }
  }
}
