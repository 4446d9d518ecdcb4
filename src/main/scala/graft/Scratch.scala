package graft

import graft.core.Graft
import org.apache.spark.sql.functions._

/** Ad-hoc timing scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("scratch")
    import org.apache.spark.sql.GraftShims
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
    val df = spark.range(100).select(
      (col("id") % 3).as("k"),
      col("id").as("v"),
      (col("id") * 7 % 100).cast("double").as("score"))
    val child = GraftShims.toExpression(struct(-col("score"), col("v")))
    val agg = GraftShims.toColumn(new CollectTopK(child, 4, true).toAggregateExpression())
    val out = df.groupBy("k").agg(agg.as("topk"))
    out.show(false)
    out.select(col("k"), posexplode(col("topk"))).show(20, false)
    spark.stop()
  }
}
