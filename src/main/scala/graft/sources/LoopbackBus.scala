package graft.sources

import scala.collection.mutable.ArrayBuffer

/** In-memory message transport backing the loopback connector — the
  * test/dev stand-in for an external broker (refs: esp_mqtt_subscribe.erl:
  * 47-70 topic subscription + qos acks, esp_mqtt_publish.erl:46-78
  * publish with retained/qos, esp_amqp_consume.erl:68-103 ack-after-
  * deliver). Per-topic append-only logs with monotonically increasing
  * offsets; consumer-group commit marks mirror the reference's
  * ack≈offset-commit semantics (an un-acked delivery is re-delivered —
  * here: an uncommitted offset range is re-read after restart).
  *
  * Single-JVM by design: on a cluster the connector binds to a real
  * broker client instead (README connector boundary) — the DSv2 surface
  * (offsets, partitions, commits) is identical.
  */
object LoopbackBus {

  final case class Msg(offset: Long, tsMs: Long, key: String, payload: String)

  private val topics =
    new java.util.concurrent.ConcurrentHashMap[String, ArrayBuffer[Msg]]()
  private val commits =
    new java.util.concurrent.ConcurrentHashMap[(String, String), Long]()

  private def log(topic: String): ArrayBuffer[Msg] =
    topics.computeIfAbsent(topic, _ => ArrayBuffer.empty[Msg])

  /** Append one message; returns its offset (0-based, per topic). */
  def publish(topic: String, key: String, payload: String,
      tsMs: Long = System.currentTimeMillis()): Long = {
    val l = log(topic)
    l.synchronized {
      val off = l.size.toLong
      l += Msg(off, tsMs, key, payload)
      off
    }
  }

  /** Messages with offset in (fromExclusive, untilInclusive]. */
  def read(topic: String, fromExclusive: Long, untilInclusive: Long): Seq[Msg] = {
    val l = log(topic)
    l.synchronized {
      l.slice((fromExclusive + 1).toInt,
        math.min(untilInclusive + 1, l.size.toLong).toInt).toSeq
    }
  }

  /** Highest offset in the topic, -1 if empty. */
  def latest(topic: String): Long = {
    val l = log(topic)
    l.synchronized(l.size.toLong - 1)
  }

  /** Ack: mark offsets up to `offset` consumed by `group`. */
  def commit(topic: String, group: String, offset: Long): Unit =
    commits.synchronized {
      val prev = commits.getOrDefault((topic, group), -1L)
      commits.put((topic, group), math.max(prev, offset))
    }

  /** Last committed offset for `group`, -1 if none (deliver-from-start). */
  def committed(topic: String, group: String): Long =
    commits.getOrDefault((topic, group), -1L)

  def clear(): Unit = { topics.clear(); commits.clear() }

  // ---- subscription recorder --------------------------------------------
  // Loopback.subscribe/subscribeStream note their topic here, so sweep
  // tooling (RunSweep, the DfsSpec coverage floor) can SEED the endpoints
  // a script listens on without re-deriving them — topic construction
  // lives in the planner (def-resolved options) and is not repeatable
  // from the outside.
  private val subs = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())

  def noteSubscribe(topic: String): Unit = { subs.add(topic); () }

  /** Topics subscribed since the last [[resetSubscribed]]. */
  def subscribed(): Set[String] = {
    import scala.jdk.CollectionConverters._
    subs.asScala.toSet
  }

  def resetSubscribed(): Unit = subs.clear()
}
