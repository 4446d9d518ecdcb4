package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew salting for HOLISTIC aggregates.
  *
  * Algebraic aggregates (sum/count/min/max, min_by, the HLL sketches) are
  * already skew-proof here: partial aggregation reduces map-side, so a hot
  * key ships one row per input partition regardless of its row count. The
  * gap is holistic aggregates — collect_list/collect_set have a "partial"
  * mode in name only (the buffer holds every value, nothing shrinks), so
  * every row of a hot key crosses the wire into ONE reducer: the classic
  * 100 TB straggler, and the one shape AQE's skew handling cannot fix
  * (skewJoin splits join partitions, not aggregation groups).
  *
  * [[saltedCollect]] makes the group size bounded instead: each key is
  * split across `parts` salt buckets (first shuffle on (key, salt) — a hot
  * key becomes `parts` groups of ~1/parts the size), collected per bucket,
  * then merged in a second shuffle of exactly one array row per
  * (key, salt) — bounded by construction. Two exchanges instead of one,
  * both bounded; the unsalted plan has one exchange with an unbounded
  * reducer. Element order is bucket-interleaved — carry a sort key inside
  * the collected values when order matters (as dedupSpans does with its
  * (pos, span) structs).
  */
object Salt {

  /** collect_list (or collect_set with `distinct = true`) of `valueCol`
    * per `keys`, with per-reducer group size bounded via two-phase
    * salting. Output: keys :+ `values` (array).
    *
    * The salt is `spark_partition_id % parts`: free to compute,
    * deterministic given the scan layout, and it spreads a hot key over
    * however many input partitions actually hold it — a key confined to
    * one input partition is by definition not a reducer hot spot.
    */
  def saltedCollect(df: DataFrame, keys: Seq[String], valueCol: Column,
      parts: Int = 64, distinct: Boolean = false): DataFrame = {
    require(parts > 0, s"parts must be positive: $parts")
    val perBucket = df
      .withColumn("__salt", pmod(spark_partition_id(), lit(parts)))
      .groupBy(keys.map(col) :+ col("__salt"): _*)
      .agg((if (distinct) collect_set(valueCol) else collect_list(valueCol))
        .as("__chunk"))
    val merged = perBucket
      .groupBy(keys.map(col): _*)
      .agg(flatten(collect_list(col("__chunk"))).as("values"))
    // per-bucket sets can still overlap across buckets — dedup after merge
    if (distinct) merged.withColumn("values", array_distinct(col("values")))
    else merged
  }
}
