package graft.metrics

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener

/** Metrics/stats parity with the reference's StatsDumper (stats.go:14-218,
  * line format :131-139):
  *
  *   Stats: 1s[w:N,r:N] total[w:N,r:N] speed[N rec/s] errors[...]
  *
  * Batch topologies report once per completed action from the topology's
  * Observations (graft_input/graft_output); daemon topologies report once
  * per micro-batch from StreamingQueryProgress. Attach once per session.
  */
final class StatsDumper(quiet: Boolean = false) {

  val totalRead = new AtomicLong(0)
  val totalWritten = new AtomicLong(0)
  @volatile var lines: Vector[String] = Vector.empty

  private def emit(read: Long, written: Long, secs: Double,
      invalid: Long = 0, perFilter: Seq[(String, Long)] = Nil): Unit = {
    totalRead.addAndGet(read)
    totalWritten.addAndGet(written)
    val speed = if (secs > 0) (written / secs).toLong else 0L
    val filtered = perFilter.map(_._2).sum
    // error classes mirror stats.go:131-139 — p(arse) o(utput) u(pload)
    // have no batch equivalent; i = validation drops, f = filter drops
    val errs = s"errors[p:0 i:$invalid f:$filtered o:0 u:0]"
    val breakdown =
      if (perFilter.isEmpty) ""
      else perFilter.map { case (n, d) => s"$n:$d" }.mkString(" filtered[", " ", "]")
    val line = s"Stats: 1s[w:$written,r:$read] " +
      s"total[w:${totalWritten.get},r:${totalRead.get}] speed[$speed rec/s] $errs$breakdown"
    lines = (lines :+ line).takeRight(100)
    if (!quiet) println(line)
  }

  private val batchListener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
      val m = qe.observedMetrics
      val read = m.get("graft_input").map(_.getAs[Long]("input_records")).getOrElse(0L)
      val written = m.get("graft_output").map(_.getAs[Long]("output_records")).getOrElse(0L)
      // optional per-stage counts ([general] track_filter_drops): one
      // observation per validation/filter stage, in chain order; each
      // stage's drop = previous stage's surviving count minus its own
      val stages = m.keys.filter(_.startsWith("graft_stage_")).toSeq.sortBy {
        k => if (k == "graft_stage_validation") -1 else
          k.stripPrefix("graft_stage_").takeWhile(_.isDigit).toIntOption.getOrElse(Int.MaxValue)
      }
      var prev = read
      var invalid = 0L
      val perFilter = Seq.newBuilder[(String, Long)]
      for (k <- stages) {
        val cnt = m(k).getLong(0)
        val drop = math.max(0L, prev - cnt)
        if (k == "graft_stage_validation") invalid = drop
        else perFilter += (k.stripPrefix("graft_stage_").dropWhile(_ != '_').drop(1) -> drop)
        prev = cnt
      }
      if (read > 0 || written > 0)
        emit(read, written, durationNs / 1e9, invalid, perFilter.result())
    }
    override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  private val streamListener = new StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = e.progress
      if (p.numInputRows > 0)
        emit(p.numInputRows, p.sink.numOutputRows max 0L,
          p.batchDuration / 1000.0)
    }
  }

  def attach(spark: SparkSession): this.type = {
    spark.listenerManager.register(batchListener)
    spark.streams.addListener(streamListener)
    this
  }

  def detach(spark: SparkSession): Unit = {
    spark.listenerManager.unregister(batchListener)
    spark.streams.removeListener(streamListener)
  }
}
