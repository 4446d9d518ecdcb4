package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: place documents into fixed-size training sequences the
  * way a pretraining pipeline does — concatenate documents in a
  * deterministic order, then cut every `budget` units; a document belongs
  * to the sequence its first unit lands in (concat-then-chunk, the
  * GPT-style packing scheme).
  *
  * Scale contract: packing is per-SHARD, not global. A global running total
  * would serialize the corpus through one partition; instead the caller
  * supplies a uniform `shard` expression (hash of the id), each shard packs
  * independently with a window cumsum, and the plan is exactly one shuffle
  * (the window partition) + one per-partition sort. Real pipelines pack per
  * output shard anyway — sequences never span shard files.
  */
object Pack {

  /** Assign each row a (shard, seq_id, seq_offset): `seq_id` is the
    * `budget`-sized chunk where the row's content starts when rows are
    * concatenated within `shard` in `orderCol` order; `seq_offset` its
    * start position inside that chunk. `sizeCol` is the row's size in
    * whatever unit the budget is in (tokens, chars, bytes).
    *
    * `orderCol` MUST be unique within a shard (a doc id, a content digest):
    * packing concatenates in a total order, so ties would make the layout
    * undefined. The window uses an explicit ROWS frame, so even with ties
    * each row gets a distinct running position rather than the peer-group
    * sum — but which tied row comes first is partition-order-dependent, so
    * uniqueness is still the caller's contract.
    */
  def concatChunk(df: DataFrame, orderCol: Column, sizeCol: Column, budget: Long,
      shard: Column): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    val w = Window.partitionBy("__shard").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__shard", shard)
      .withColumn("__start", sum(sizeCol).over(w) - sizeCol)
      .withColumn("shard", col("__shard"))
      .withColumn("seq_id", floor(col("__start") / budget))
      .withColumn("seq_offset", col("__start") % budget)
      .drop("__shard", "__start")
  }
}
