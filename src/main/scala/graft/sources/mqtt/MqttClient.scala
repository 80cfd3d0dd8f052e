package graft.sources.mqtt

import java.net.{Socket, URI}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}
import scala.util.control.NonFatal
import MqttCodec._

/** Received message envelope (the reference's `message` event payload,
  * bin/mqtt-streamr.js:144, plus arrival time).
  */
case class MqttMessage(topic: String, payload: Array[Byte], arrivalMillis: Long)

/** Driver-side MQTT subscriber with the reference's connection behavior:
  * connect → subscribe N topic filters (wildcards allowed) → push received
  * messages to an in-memory queue; a resettable inactivity watchdog
  * force-reconnects after `dataTimeoutMillis` of silence
  * (src/DataTimeoutUtil.js:1-18, wiring bin/mqtt-streamr.js:86-97), and a
  * broken socket triggers reconnect with backoff. At-most-once (QoS 0) —
  * the same guarantee the reference has.
  */
class MqttClient(
    url: String,
    topics: Seq[String],
    clientId: String = s"graft-${java.util.UUID.randomUUID()}",
    dataTimeoutMillis: Long = 900000L,
    reconnectBackoffMillis: Long = 200L) extends AutoCloseable {

  private val queue = new ConcurrentLinkedQueue[MqttMessage]()
  private val running = new AtomicBoolean(true)
  private val lastData = new AtomicLong(System.currentTimeMillis())
  private val connected = new CountDownLatch(1)
  @volatile private var socket: Socket = _
  /** reconnect counter (tests/metrics) */
  val reconnects = new AtomicLong(0)

  private val uri = new URI(url) // tcp://host:port
  require(uri.getScheme == "tcp", s"only tcp:// URLs supported, got $url")

  private val readerThread = new Thread(() => runLoop(), s"mqtt-reader-$clientId")
  readerThread.setDaemon(true)

  private val watchdogThread = new Thread(() => watchdogLoop(), s"mqtt-watchdog-$clientId")
  watchdogThread.setDaemon(true)

  def start(): MqttClient = {
    readerThread.start()
    if (dataTimeoutMillis > 0) watchdogThread.start()
    this
  }

  /** Blocks until the first CONNACK (or timeout). */
  def awaitConnected(timeoutMillis: Long = 10000): Boolean =
    connected.await(timeoutMillis, TimeUnit.MILLISECONDS)

  /** Drain up to `max` buffered messages. */
  def poll(max: Int = Int.MaxValue): Seq[MqttMessage] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[MqttMessage]
    var m = queue.poll()
    while (m != null && out.length < max) {
      out += m
      m = if (out.length < max) queue.poll() else null
    }
    out.toSeq
  }

  private def runLoop(): Unit = {
    while (running.get()) {
      try {
        val s = new Socket(uri.getHost, uri.getPort)
        socket = s
        val out = s.getOutputStream
        write(out, Connect(clientId))
        read(s.getInputStream) match {
          case ConnAck(0) => ()
          case other => throw new java.io.IOException(s"connect refused: $other")
        }
        write(out, Subscribe(1, topics))
        connected.countDown()
        lastData.set(System.currentTimeMillis())
        while (running.get() && !s.isClosed) {
          read(s.getInputStream) match {
            case Publish(topic, payload) =>
              lastData.set(System.currentTimeMillis()) // watchdog reset (js:145-147)
              queue.add(MqttMessage(topic, payload, System.currentTimeMillis()))
            case PingReq => write(out, PingResp)
            case _ => () // SubAck, PingResp, ...
          }
        }
      } catch {
        case NonFatal(_) if running.get() =>
          reconnects.incrementAndGet()
          Thread.sleep(reconnectBackoffMillis)
      }
    }
  }

  private def watchdogLoop(): Unit = {
    while (running.get()) {
      Thread.sleep(math.min(dataTimeoutMillis / 4 + 1, 1000))
      if (System.currentTimeMillis() - lastData.get() >= dataTimeoutMillis) {
        // force-close; the reader loop reconnects (mqttClient.end(true) +
        // connectMqttClient() at bin/mqtt-streamr.js:88-96)
        lastData.set(System.currentTimeMillis())
        try if (socket != null) socket.close() catch { case NonFatal(_) => () }
      }
    }
  }

  override def close(): Unit = {
    running.set(false)
    try if (socket != null) { write(socket.getOutputStream, Disconnect); socket.close() }
    catch { case NonFatal(_) => () }
  }
}
