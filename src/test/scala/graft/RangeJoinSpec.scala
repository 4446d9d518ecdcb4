package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  test("numeric point-in-interval: bounds [start, end), multi-bucket intervals") {
    import spark.implicits._
    val points = Seq( // (id, k, ts)
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 25L), (4L, "b", 5L), (5L, "a", 30L),
    ).toDF("id", "k", "ts")
    val intervals = Seq( // (k, start, end, tag) — widths 5..25, bucket width 10
      ("a", 0L, 10L, "i1"),   // spans buckets 0..0
      ("a", 10L, 30L, "i2"),  // spans buckets 1..2 (multi-bucket)
      ("b", 0L, 4L, "i3"),    // b's point at 5 is outside
    ).toDF("k", "start", "end", "tag")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "ts", "start", "end", bucketWidthMicros = 10L)
      .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (1L, "i1"),  // 5 ∈ [0,10)
      (2L, "i2"),  // 10 ∉ [0,10) (exclusive end) but ∈ [10,30) (inclusive start)
      (3L, "i2"))) // 25 ∈ [10,30) across the bucket boundary
    // 30 ∉ [10,30); b@5 ∉ [0,4) — no rows for ids 4,5
  }

  test("overlapping intervals yield one row per (point, interval) match") {
    import spark.implicits._
    val points = Seq((1L, "a", 7L)).toDF("id", "k", "ts")
    val intervals = Seq(("a", 0L, 10L, "x"), ("a", 5L, 9L, "y")).toDF("k", "start", "end", "tag")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "ts", "start", "end", bucketWidthMicros = 10L)
      .select("tag").collect().map(_.getString(0)).toSet
    assert(out == Set("x", "y"))
  }

  test("bucket math is exact beyond 2^53 (epoch-nanosecond magnitudes)") {
    import spark.implicits._
    // 1.7e18 ≈ 2026 in epoch nanos; double-precision floor(x/w) misplaces
    // these near bucket boundaries — integral div must not
    val base = 1700000000000000000L
    val w = 3600000000000L // 1h in nanos
    val points = Seq((1L, "a", base + w - 1), (2L, "a", base + w)).toDF("id", "k", "ts")
    val intervals = Seq(("a", base, base + w, "first-hour")).toDF("k", "start", "end", "tag")
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "ts", "start", "end", bucketWidthMicros = w)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L)) // last nano of the hour in; first nano of next hour out
  }

  test("TIMESTAMP_NTZ point/bound columns bucketize (parquet timestamp[us] reads as NTZ)") {
    // the r7 testdata regeneration turned events.ts into TIMESTAMP_NTZ and
    // q_range_join silently fell out of the correctness run — pin the type
    import spark.implicits._
    val points = Seq((1L, "a", "2024-01-01 01:30:00"), (2L, "a", "2024-01-01 07:00:00"))
      .toDF("id", "k", "tss")
      .select(col("id"), col("k"), col("tss").cast("timestamp_ntz").as("ts"))
    assert(points.schema("ts").dataType == org.apache.spark.sql.types.TimestampNTZType)
    val intervals = Seq(("a", "2024-01-01 00:00:00", "2024-01-01 06:00:00", "s1"))
      .toDF("k", "s", "e", "tag")
      .select(col("k"), col("s").cast("timestamp_ntz").as("start"),
        col("e").cast("timestamp_ntz").as("end"), col("tag"))
    val out = RangeJoin.pointInInterval(points, intervals, Seq("k"),
        "ts", "start", "end", bucketWidthMicros = 6L * 3600 * 1000000)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L)) // 01:30 in [00:00, 06:00); 07:00 out
  }

  test("plan: equi-join on (key, bucket), no cartesian / nested-loop") {
    import spark.implicits._
    val points = Seq((1L, "a", 7L)).toDF("id", "k", "ts")
    val intervals = Seq(("a", 0L, 10L, "x")).toDF("k", "start", "end", "tag")
    val plan = RangeJoin.pointInInterval(points, intervals, Seq("k"),
      "ts", "start", "end", 10L).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }

  test("intervalOverlap equals the naive inequality join, each pair once") {
    import spark.implicits._
    // deterministic pseudo-random intervals, several per key, lengths from
    // sub-bucket to many-bucket so pairs share 0..N buckets
    def mk(seed: Int, n: Int) = (0 until n).map { i =>
      val h = i * 2654435761L + seed
      val k = (math.abs(h) % 3).toString
      val s = math.abs(h / 7) % 1000
      val len = math.abs(h / 13) % 120 // up to 12 buckets at width 10
      (s"$seed-$i", k, s, s + len)     // len 0 → empty interval sometimes
    }
    val l = mk(1, 80).toDF("l_id", "k", "ls", "le")
    val r = mk(2, 80).toDF("r_id", "k", "rs", "re")
    val got = RangeJoin.intervalOverlap(l, r, Seq("k"), "ls", "le", "rs", "re", 10L)
      .select("l_id", "r_id").collect().map(x => (x.getString(0), x.getString(1))).toSeq
    // each overlapping pair appears EXACTLY once (no distinct in the plan)
    assert(got.distinct.size == got.size, "duplicate pairs emitted")
    val naive = for {
      (li, lk, ls, le) <- mk(1, 80) if le > ls
      (ri, rk, rs, re) <- mk(2, 80) if re > rs
      if lk == rk && ls < re && rs < le
    } yield (li, ri)
    assert(got.toSet == naive.toSet)
    assert(naive.nonEmpty, "fixture produced no overlaps — pick new constants")
  }

  test("intervalOverlap rejects colliding non-key columns; plan stays an equi hash join") {
    import spark.implicits._
    val l = Seq(("a", "k", 0L, 5L)).toDF("id", "k", "s", "e")
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, l, Seq("k"), "s", "e", "s", "e", 10L)
    }
    val r = Seq(("b", "k", 1L, 6L)).toDF("rid", "k", "rs", "re")
    val plan = RangeJoin.intervalOverlap(l, r, Seq("k"), "s", "e", "rs", "re", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
  }
}
