package graft

import java.nio.file.Files
import graft.sources.mqtt.{MqttClient, MqttInputPartition, MqttMicroBatchStream, MqttOffset}

/** S1 at-least-once upgrade (r13, SURVEY §7.4#3 — beyond the reference's
  * fire-and-forget): QoS 1 subscribe with ack-after-persist into the
  * source's write-ahead segments. Pins the three contract points:
  *
  *  1. PUBACK happens only after the WAL write, and a restart BEFORE the
  *     checkpoint commit replays the same rows at the same offsets from
  *     the WAL — the exact batch the crashed incarnation lost from
  *     memory (QoS 0's re-base drops it, asserted as the contrast);
  *  2. commit() prunes fully-committed segments, so the WAL is bounded
  *     by the uncommitted horizon and a post-commit restart serves
  *     nothing stale;
  *  3. unacked QoS 1 messages are redelivered with DUP — duplicates,
  *     never loss, which downstream dedup owns.
  */
class MqttAtLeastOnceSpec extends SparkTestBase {

  private def awaitSubscribed(broker: MqttTestBroker): Unit = {
    var tries = 0
    while (broker.subscriberCount == 0 && tries < 200) { Thread.sleep(20); tries += 1 }
    assert(broker.subscriberCount > 0, "client never subscribed")
  }

  /** Drive latestOffset until the source has admitted `n` messages. */
  private def drainTo(st: MqttMicroBatchStream, n: Long): Unit = {
    var tries = 0
    while (st.latestOffset().asInstanceOf[MqttOffset].count < n && tries < 200) {
      Thread.sleep(20); tries += 1
    }
    assert(st.latestOffset().asInstanceOf[MqttOffset].count >= n,
      s"source never reached offset $n")
  }

  private def rows(st: MqttMicroBatchStream, from: Long, to: Long): Seq[(String, String)] =
    st.planInputPartitions(MqttOffset(from), MqttOffset(to)).toSeq
      .flatMap(_.asInstanceOf[MqttInputPartition].rows)
      .map { case (t, p, _) => (t, new String(p, "UTF-8")) }

  test("qos=1 + waldir: ack-after-persist; crash before commit replays " +
      "the same rows; commit prunes the WAL") {
    val broker = new MqttTestBroker()
    val wal = Files.createTempDirectory("graft_wal").toString
    try {
      val opts = Map("url" -> broker.url, "topics" -> "alo/#",
        "qos" -> "1", "waldir" -> wal)
      val s1 = new MqttMicroBatchStream(opts)
      assert(s1.latestOffset() == MqttOffset(0)) // connects + subscribes
      awaitSubscribed(broker)
      broker.publish("alo/a", "m0")
      broker.publish("alo/b", "m1")
      broker.publish("alo/a", "m2")
      drainTo(s1, 3)
      // ack-after-persist: by the time offsets were exposed, the WAL has
      // the messages AND the broker has seen the PUBACKs
      assert(new java.io.File(wal).listFiles().exists(_.getName.startsWith("wal-")))
      var tries = 0
      while (broker.unackedCount > 0 && tries < 100) { Thread.sleep(10); tries += 1 }
      assert(broker.unackedCount == 0)
      val batch1 = rows(s1, 0, 3)
      assert(batch1.map(_._2) == Seq("m0", "m1", "m2"))
      s1.stop() // crash before commit: offsets 0..3 never committed

      // restart: construction-time recovery must serve the SAME batch
      val s2 = new MqttMicroBatchStream(opts)
      s2.deserializeOffset("0")
      assert(rows(s2, 0, 3) == batch1)
      s2.commit(MqttOffset(3))
      // segments fully below the committed line are gone
      assert(!new java.io.File(wal).listFiles().exists(_.getName.startsWith("wal-")))
      s2.stop()

      // post-commit restart: nothing stale is replayed
      val s3 = new MqttMicroBatchStream(opts)
      s3.deserializeOffset("3")
      assert(rows(s3, 0, 3).isEmpty && rows(s3, 3, 3).isEmpty)
      s3.stop()
    } finally broker.close()
  }

  test("contrast: qos=0 without wal re-bases past uncommitted messages " +
      "(the reference's at-most-once, unchanged)") {
    val broker = new MqttTestBroker()
    try {
      val opts = Map("url" -> broker.url, "topics" -> "amo/#")
      val s1 = new MqttMicroBatchStream(opts)
      s1.latestOffset()
      awaitSubscribed(broker)
      broker.publish("amo/x", "gone")
      drainTo(s1, 1)
      s1.stop() // crash before commit — at QoS 0 the message is lost

      val s2 = new MqttMicroBatchStream(opts)
      s2.deserializeOffset("1") // checkpoint is ahead of the fresh instance
      assert(rows(s2, 0, 1).isEmpty) // re-based: nothing to replay
      s2.stop()
    } finally broker.close()
  }

  test("unacked qos=1 messages redeliver with DUP: duplicates, never loss") {
    val broker = new MqttTestBroker()
    try {
      val client = new MqttClient(broker.url, Seq("dup/#"),
        subscribeQos = 1, autoAck = false).start()
      assert(client.awaitConnected())
      awaitSubscribed(broker)
      broker.publish("dup/t", "once")
      var tries = 0
      var got = client.poll()
      while (got.isEmpty && tries < 100) { Thread.sleep(20); got = client.poll(); tries += 1 }
      assert(got.map(m => new String(m.payload, "UTF-8")) == Seq("once"))
      assert(broker.unackedCount == 1) // not acked yet (manual-ack mode)

      broker.redeliverUnacked() // what a broker does on session resume
      tries = 0
      var again = client.poll()
      while (again.isEmpty && tries < 100) { Thread.sleep(20); again = client.poll(); tries += 1 }
      assert(again.map(m => new String(m.payload, "UTF-8")) == Seq("once")) // duplicate

      client.ack(got.map(_.packetId))
      tries = 0
      while (broker.unackedCount > 0 && tries < 100) { Thread.sleep(10); tries += 1 }
      assert(broker.unackedCount == 0)
      client.close()
    } finally broker.close()
  }
}
