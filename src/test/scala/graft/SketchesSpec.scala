package graft

import org.apache.spark.sql.functions._

import graft.llm.Sketches

class SketchesSpec extends SparkSpec {

  test("HLL estimate within 3% of exact; fine→coarse rollup matches direct") {
    import spark.implicits._
    // 3 groups × overlapping user sets across 10 "days"
    val rows = for {
      day <- 0 until 10
      u <- 0 until 500
      if (u + day) % 3 != 0
    } yield (s"type${u % 3}", day, (u * 7 + day * 13) % 1200)
    val df = rows.toDF("event_type", "day", "user_id")

    val exact = df.groupBy("event_type").agg(countDistinct("user_id").as("exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // direct estimate
    val direct = Sketches.approxDistinct(df, Seq("event_type"), "user_id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // persisted-per-day sketches, rolled up later without raw data
    val daily = Sketches.distinctSketch(df, Seq("event_type", "day"), "user_id")
    val rolled = Sketches.rollup(daily, Seq("event_type"))
      .select(col("event_type"), Sketches.estimate(col("sketch")).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    for ((k, ex) <- exact) {
      assert(math.abs(direct(k) - ex).toDouble / ex < 0.03, s"$k direct ${direct(k)} vs $ex")
      // dense-mode register merges are max-based, but DataSketches'
      // sparse→dense promotion can differ by a hair between the direct and
      // union paths — assert near-identity, not equality
      assert(math.abs(rolled(k) - direct(k)).toDouble / ex < 0.01,
        s"$k rollup ${rolled(k)} != direct ${direct(k)}")
    }
  }

  test("sketch bytes are bounded and group count is exact") {
    import spark.implicits._
    val df = (0 until 10000).map(i => ("g", i)).toDF("g", "v")
    val sk = Sketches.distinctSketch(df, Seq("g"), "v", lgK = 12)
    val bytes = sk.select(length(col("sketch"))).head().getInt(0)
    assert(bytes <= (1 << 12) * 2, s"sketch unexpectedly large: $bytes B")
    assert(sk.count() == 1)
  }
}
