package graft

import java.net.{DatagramPacket, DatagramSocket}
import java.nio.file.Files

import graft.metrics.{DatadogMetrics, RecordingMetrics}
import graft.topology.Topology

/** MetricsClient surface + dogstatsd exporter (reference: metrics_client.go,
  * metrics/datadog/client.go) and the [metrics] topology section.
  */
class MetricsSpec extends SparkSpec {

  /** Local UDP listener collecting dogstatsd datagrams. */
  private def withUdpListener[T](f: (Int, () => Seq[String]) => T): T = {
    val sock = new DatagramSocket(0)
    sock.setSoTimeout(200)
    // full-suite runs saturate all cores; a default-sized buffer can drop
    // datagrams before the listener thread gets scheduled
    sock.setReceiveBufferSize(1 << 20)
    val received = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    @volatile var running = true
    val t = new Thread(() => {
      val buf = new Array[Byte](65536)
      while (running) {
        try {
          val p = new DatagramPacket(buf, buf.length)
          sock.receive(p)
          received.add(new String(p.getData, p.getOffset, p.getLength, "UTF-8"))
        } catch { case _: java.net.SocketTimeoutException => () }
      }
    })
    t.setDaemon(true); t.start()
    try f(sock.getLocalPort, () => {
      import scala.jdk.CollectionConverters._
      // synchronizedList still requires manual locking around ITERATION —
      // copying while the listener thread appends throws CME otherwise
      received.synchronized(received.asScala.toList)
    })
    finally { running = false; sock.close() }
  }

  /** UDP is fire-and-forget: under a fully-saturated suite run the kernel
    * can drop loopback datagrams no buffer size prevents. Retrying the
    * whole scenario (fresh socket each time) keeps the assertions strict
    * without making the suite flaky.
    */
  private def retryingUdp[T](attempts: Int)(body: => T): T =
    try body catch {
      case e: org.scalatest.exceptions.TestFailedException if attempts > 1 =>
        retryingUdp(attempts - 1)(body)
    }

  test("DatadogMetrics emits dogstatsd datagrams with prefix, types and tags") {
    retryingUdp(3) { withUdpListener { (port, drain) =>
      val m = new DatadogMetrics(s"127.0.0.1:$port", "graft.", Seq("env:test"))
      m.gauge("queue_depth", 7.5)
      m.deltaCount("records", 42, Seq("kind:a"))
      m.rawCount("cumulative", 10)
      m.rawCount("cumulative", 25) // raw counters emit as deltas (client.go counters map)
      m.histogram("size", 123.0)
      m.duration("elapsed", 250)
      m.close()
      val deadline = System.nanoTime() + 30000000000L  // generous: suite runs CPU-starved
      while (drain().size < 6 && System.nanoTime() < deadline) Thread.sleep(20)
      val got = drain().toSet
      assert(got.contains("graft.queue_depth:7.5|g|#env:test"))
      assert(got.contains("graft.records:42|c|#env:test,kind:a"))
      assert(got.contains("graft.cumulative:10|c|#env:test"))
      assert(got.contains("graft.cumulative:15|c|#env:test"))
      assert(got.contains("graft.size:123.0|h|#env:test"))
      assert(got.contains("graft.elapsed:250|ms|#env:test"))
    } }
  }

  test("topology [metrics] section publishes read/written/filtered counters") {
    retryingUdp(3) { withUdpListener { (port, drain) =>
      val dir = Files.createTempDirectory("graft-metrics").toFile
      Files.writeString(new java.io.File(dir, "in.csv").toPath, "1,a\n2,\n3,c\n")
      val toml =
        s"""[fields]
           |names = ["id", "name"]
           |[input]
           |name = "List"
           |  [input.config]
           |  Files = ["$dir/in.csv"]
           |[[filter]]
           |name = "NotNull"
           |  [filter.config]
           |  Fields = ["name"]
           |[output]
           |name = "Nop"
           |[metrics]
           |name = "Datadog"
           |  [metrics.config]
           |  Host = "127.0.0.1:$port"
           |  Prefix = "graft."
           |""".stripMargin
      val (result, _) = Topology.compileToml(spark, toml).run()
      assert(result.rows == 2L)
      val deadline = System.nanoTime() + 30000000000L  // generous: suite runs CPU-starved
      while (drain().size < 4 && System.nanoTime() < deadline) Thread.sleep(20)
      val got = drain()
      assert(got.contains("graft.records_read:3|c"))
      assert(got.contains("graft.records_written:2|c"))
      assert(got.contains("graft.records_filtered:1|c"))
      assert(got.exists(_.startsWith("graft.topology_run:")))
    } }
  }

  test("RecordingMetrics aggregates for assertions") {
    val m = new RecordingMetrics
    m.deltaCount("n", 1); m.deltaCount("n", 2)
    m.gauge("g", 3.5)
    m.histogram("h", 1.0); m.histogram("h", 2.0)
    assert(m.counters.get("n").get() == 3)
    assert(m.gauges.get("g") == 3.5)
    assert(m.samples.get("h").size() == 2)
  }
}
