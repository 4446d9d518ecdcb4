package graft.metrics

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

/** MetricsClient — the component-instrumentation interface.
  * reference: metrics_client.go (Gauge/RawCount/DeltaCount/Histogram/
  * Duration, each with a WithTags variant, plus Close).
  *
  * Driver-side by design: topology-level counters (records read/written/
  * filtered, validation errors) are aggregated by Spark (observe/
  * accumulators) and published once per action or micro-batch — executors
  * never emit per-record datagrams, which is the only shape that survives a
  * 1000-executor cluster without melting the statsd host.
  */
trait MetricsClient extends AutoCloseable {
  def gauge(name: String, value: Double, tags: Seq[String] = Nil): Unit
  def rawCount(name: String, value: Long, tags: Seq[String] = Nil): Unit
  def deltaCount(name: String, delta: Long, tags: Seq[String] = Nil): Unit
  def histogram(name: String, value: Double, tags: Seq[String] = Nil): Unit
  def duration(name: String, millis: Long, tags: Seq[String] = Nil): Unit
  def close(): Unit = ()
}

/** Default no-op client (reference: NopMetrics, metrics.go). */
object NopMetrics extends MetricsClient {
  def gauge(name: String, value: Double, tags: Seq[String]): Unit = ()
  def rawCount(name: String, value: Long, tags: Seq[String]): Unit = ()
  def deltaCount(name: String, delta: Long, tags: Seq[String]): Unit = ()
  def histogram(name: String, value: Double, tags: Seq[String]): Unit = ()
  def duration(name: String, millis: Long, tags: Seq[String]): Unit = ()
}

/** In-memory client for tests and for the StatsDumper's error breakdown. */
final class RecordingMetrics extends MetricsClient {
  val gauges = new ConcurrentHashMap[String, Double]()
  val counters = new ConcurrentHashMap[String, AtomicLong]()
  val samples = new ConcurrentHashMap[String, java.util.List[Double]]()
  private def key(name: String, tags: Seq[String]) =
    if (tags.isEmpty) name else s"$name[${tags.sorted.mkString(",")}]"
  def gauge(name: String, value: Double, tags: Seq[String]): Unit =
    gauges.put(key(name, tags), value)
  def rawCount(name: String, value: Long, tags: Seq[String]): Unit =
    counters.computeIfAbsent(key(name, tags), _ => new AtomicLong()).set(value)
  def deltaCount(name: String, delta: Long, tags: Seq[String]): Unit =
    counters.computeIfAbsent(key(name, tags), _ => new AtomicLong()).addAndGet(delta)
  def histogram(name: String, value: Double, tags: Seq[String]): Unit =
    samples.computeIfAbsent(key(name, tags),
      _ => java.util.Collections.synchronizedList(new java.util.ArrayList[Double]())).add(value)
  def duration(name: String, millis: Long, tags: Seq[String]): Unit =
    histogram(name, millis.toDouble, tags)
}

/** Datadog — dogstatsd exporter. reference: metrics/datadog/client.go:17-60
  * (config: Prefix default "baker.", Host default 127.0.0.1:8125, Tags).
  *
  * Emits the plain-text dogstatsd datagram format over UDP:
  * `prefix.name:value|type|#tag1,tag2`. RawCount keeps a local
  * last-value so it can emit cumulative counters as deltas, exactly like
  * the reference's counters map.
  */
final class DatadogMetrics(
    host: String = "127.0.0.1:8125",
    prefix: String = "baker.",
    globalTags: Seq[String] = Nil,
) extends MetricsClient {
  private val (addr, port) = host.split(":", 2) match {
    case Array(h, p) => (InetAddress.getByName(h), p.toInt)
    case _           => (InetAddress.getByName(host), 8125)
  }
  private val socket = new DatagramSocket()
  private val lastRaw = new ConcurrentHashMap[String, Long]()

  private def send(name: String, value: String, kind: String, tags: Seq[String]): Unit = {
    val all = globalTags ++ tags
    val tagPart = if (all.isEmpty) "" else s"|#${all.mkString(",")}"
    val payload = s"$prefix$name:$value|$kind$tagPart".getBytes(UTF_8)
    socket.send(new DatagramPacket(payload, payload.length, addr, port))
  }

  def gauge(name: String, value: Double, tags: Seq[String]): Unit =
    send(name, value.toString, "g", tags)
  def rawCount(name: String, value: Long, tags: Seq[String]): Unit = {
    // last-value keyed by name AND tags: interleaved tagged series (e.g.
    // per-shard counters) must not compute deltas against each other
    val key = name + "|" + tags.sorted.mkString(",")
    val prev = Option(lastRaw.put(key, value)).getOrElse(0L)
    if (value > prev) send(name, (value - prev).toString, "c", tags)
  }
  def deltaCount(name: String, delta: Long, tags: Seq[String]): Unit =
    send(name, delta.toString, "c", tags)
  def histogram(name: String, value: Double, tags: Seq[String]): Unit =
    send(name, value.toString, "h", tags)
  def duration(name: String, millis: Long, tags: Seq[String]): Unit =
    send(name, millis.toString, "ms", tags)
  override def close(): Unit = socket.close()
}
