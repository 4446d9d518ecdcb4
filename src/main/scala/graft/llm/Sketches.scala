package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable cardinality sketches over grouped data — the re-aggregatable
  * path for distinct counts at 100 TB. Exact `count(distinct x)` shuffles
  * every distinct value; an HLL sketch is a fixed ~`2^lgK` bytes per group
  * that combines map-side, crosses the exchange once, and — crucially —
  * can be persisted per fine partition (e.g. per day) and UNIONED later
  * into any coarser rollup without touching the raw data again. Dense-mode
  * register merges are max-based (order-independent); DataSketches' sparse
  * low-cardinality mode can make the union path differ from a direct
  * aggregation by a sub-percent hair. Backed by Spark's DataSketches HLL
  * functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`).
  */
object Sketches {

  /** One HLL sketch (binary) per group: `groupCols :+ sketch`. */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("sketch"))

  /** Re-aggregate persisted sketches to a coarser grouping (e.g. per-day →
    * per-type) without rescanning raw data.
    */
  def rollup(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col(sketchCol)).as("sketch"))

  /** Cardinality estimate of a sketch column. */
  def estimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Convenience: estimated distinct `valueCol` per group, via the sketch
    * path (same plan shape the persisted-sketch rollup would use).
    */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    distinctSketch(df, groupCols, valueCol, lgK)
      .select(groupCols.map(col) :+ estimate(col("sketch")).as("approx_distinct"): _*)
}
