package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventTime

/** Event-time streaming primitives: watermarked windows (append-mode
  * finalization, late-data drop) and TTL-bounded stateful dedup.
  */
class EventTimeSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("windowedCounts finalizes windows when the watermark passes them") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val out = EventTime.windowedCounts(
      input.toDF().toDF("ts", "kind"), "ts", "kind",
      windowDur = "5 minutes", watermarkDelay = "2 minutes")
    val q = out.writeStream.format("memory").queryName("win_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "a"), (ts(1), "a"), (ts(2), "b"))
      q.processAllAvailable()
      // watermark still inside [10:00,10:05) — nothing finalized
      assert(spark.table("win_out").count() == 0)
      // an event at 10:10 advances the watermark to 10:08 > 10:05
      input.addData((ts(10), "a"))
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .select(date_format(col("window_start"), "HH:mm").as("w"), col("kind"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows == Set(("10:00", "a", 2L), ("10:00", "b", 1L)))
      // a late event behind the watermark is dropped, not re-emitted
      input.addData((ts(1), "a"))
      q.processAllAvailable()
      assert(spark.table("win_out").count() == 2)
    } finally q.stop()
  }

  test("sessionize merges within-gap and exact-gap events; breaks past the gap") {
    import spark.implicits._
    val df = Seq(
      (ts(0), "u1"), (ts(3), "u1"), (ts(7), "u1"),  // chained: gaps < 5m
      (ts(12), "u1"),                               // exactly 7+5 → adjacent, MERGES
      (ts(18), "u1"),                               // 12+5=17 < 18 → new session
      (ts(0), "u2"),                                // other key isolated
    ).toDF("ts", "user")
    val out = EventTime.sessionize(df, "ts", "user", gap = "5 minutes")
      .select(date_format(col("session_start"), "HH:mm").as("s"),
        date_format(col("session_end"), "HH:mm").as("e"), col("user"), col("cnt"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      ("10:00", "10:17", "u1", 4L), // end = last event 10:12 + 5m
      ("10:18", "10:23", "u1", 1L),
      ("10:00", "10:05", "u2", 1L)))
  }

  test("sessionize streams append-mode: session emitted when watermark passes") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String)]
    val out = EventTime.sessionize(input.toDF().toDF("ts", "user"), "ts", "user",
      gap = "5 minutes", watermarkDelay = "1 minute")
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), "u1"), (ts(2), "u1"))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open
      input.addData((ts(20), "u1")) // watermark 10:19 > session end 10:07
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select(date_format(col("session_start"), "HH:mm"), col("cnt"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows == Set(("10:00", 2L)))
    } finally q.stop()
  }

  test("dedupWithTTL keeps first per key across and within micro-batches") {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    // ProcessingTimeTimeout makes the engine re-trigger batches to fire
    // timeouts, so processAllAvailable never sees a quiescent stream: poll
    // the sink table for the expected state instead.
    def pollUntil(expect: Set[(String, String)]): Set[(String, String)] = {
      val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
      var got = Set.empty[(String, String)]
      while (got != expect && System.nanoTime() < deadline) {
        Thread.sleep(200)
        got = spark.table("dedup_ttl_out").collect()
          .map(r => (r.getString(0), r.getString(1))).toSet
      }
      got
    }
    val input = MemoryStream[(String, String)]
    val out = EventTime.dedupWithTTL(input.toDF().toDF("k", "v"), Seq("k"))
    val q = out.writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("200 milliseconds"))
      .start()
    try {
      input.addData(("a", "1"), ("a", "2"), ("b", "3"))
      // in-batch dedup keeps the first record per key
      assert(pollUntil(Set(("a", "1"), ("b", "3"))) == Set(("a", "1"), ("b", "3")))
      input.addData(("a", "4"), ("c", "5"))
      // 'a' still deduped across batches; 'c' is new
      val want = Set(("a", "1"), ("b", "3"), ("c", "5"))
      assert(pollUntil(want) == want)
    } finally q.stop()
  }

  test("HLL distinct sketches aggregate across streaming micro-batches") {
    // the 100 TB streaming-ingest story: per-(window, key) sketches build
    // incrementally in the state store — values seen in EARLIER batches
    // must not recount when the window's sketch updates in later ones
    implicit val sql = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Timestamp, String, Long)]
    val out = input.toDF().toDF("ts", "k", "v")
      .withWatermark("ts", "2 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("k"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("v"), lit(12))).as("est"))
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("k"), col("est"))
    val q = out.writeStream.format("memory").queryName("sk_stream")
      .outputMode("update").start()
    try {
      input.addData((ts(0), "a", 1L), (ts(1), "a", 2L), (ts(2), "b", 1L))
      q.processAllAvailable()
      input.addData((ts(3), "a", 2L), (ts(3), "a", 3L), (ts(4), "b", 9L))
      q.processAllAvailable()
      // latest update per (window, key): a → {1,2,3}, b → {1,9}; HLL is
      // exact at these cardinalities
      val last = spark.table("sk_stream")
        .groupBy("w", "k").agg(max("est").as("est"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(last == Set(("10:00", "a", 3L), ("10:00", "b", 2L)))
    } finally q.stop()
  }

  test("dedupWithTTL works on batch frames (state empty per run)") {
    val df = strDf(Seq("k", "v"), Seq(Seq("x", "1"), Seq("x", "2"), Seq("y", "3")))
    val out = EventTime.dedupWithTTL(df, Seq("k")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("x", "1"), ("y", "3")))
  }
}
