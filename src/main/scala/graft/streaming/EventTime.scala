package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time primitives for daemon topologies.
  *
  * The reference's only event-time notion is the TimestampRange gate
  * (filter/timestamp_range.go); everything else is processing-time. These
  * are the Structured-Streaming-native extensions a large-scale pipeline
  * needs on top: watermarked windowed aggregation (late data bounded, state
  * evicted by the engine) and a TTL-bounded streaming dedup — the scale
  * answer to baker's Dedup filter, whose in-memory set grows without bound
  * (filter/dedup.go:13-21 warns about exactly this).
  */
object EventTime {

  /** Watermarked event-time windowed counts per key.
    *
    * Append-mode semantics: a window row is emitted exactly once, when the
    * watermark (max event time − `watermarkDelay`) passes the window end —
    * so state is bounded and late events beyond the delay are dropped, the
    * contract a 100 TB stream needs.
    */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
      windowDur: String, slideDur: Option[String] = None,
      watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(
        window(col(tsCol), windowDur, slideDur.getOrElse(windowDur)).as("win"),
        col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("window_start"), col("win.end").as("window_end"),
        col(keyCol), col("cnt"))

  /** Watermarked session windows per key: events closer than `gap` merge
    * into one session; a session closes (and is emitted, append-mode) when
    * the watermark passes its end, so state per key is bounded by the gap
    * plus the watermark delay. Session end = last event + gap; an event at
    * EXACTLY start+gap still MERGES (adjacent windows coalesce) — a new
    * session requires a gap strictly greater than `gap`.
    * Batch frames compute the same result with the watermark a no-op.
    */
  def sessionize(df: DataFrame, tsCol: String, keyCol: String,
      gap: String = "30 minutes", watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gap).as("win"), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("win.start").as("session_start"), col("win.end").as("session_end"),
        col(keyCol), col("cnt"))

  /** Streaming dedup on a key tuple with per-key state TTL, via
    * `flatMapGroupsWithState` — each key's "seen" bit lives in the state
    * store and is dropped `ttlMs` after last update, so memory is bounded
    * (unlike `dropDuplicates` without watermark, and unlike the reference's
    * global in-memory set). First record per key within a TTL window
    * passes; later ones are discarded. Works identically on batch frames
    * (state starts empty per run).
    */
  def dedupWithTTL(df: DataFrame, keyCols: Seq[String], ttlMs: Long = 600000L): DataFrame = {
    val schema = df.schema
    val keyIdx = keyCols.map(schema.fieldIndex)
    implicit val rowEnc: Encoder[Row] = Encoders.row(schema)
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    implicit val stateEnc: Encoder[Boolean] = Encoders.scalaBoolean
    df.groupByKey { r: Row =>
      // \x1e-joined key, the reference Dedup's key encoding (dedup.go:91-97)
      keyIdx.map(i => String.valueOf(r.get(i))).mkString("\u001e")
    }.flatMapGroupsWithState[Boolean, Row](
      OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
      (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) Iterator.empty
        else {
          state.update(true)
          state.setTimeoutDuration(ttlMs)
          // in-batch dedup too: only the first record of the group passes
          rows.take(1)
        }
    }
  }
}
