package graft

import graft.core.Graft
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Probe: where q_budget_select's time goes — the totals collect (and its
  * TakeOrdered cap), the selection job, or the scoring expression.
  */
object ProfBudget {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("budget-prof")
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Graft.table(spark, d, "documents")
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val scored = docs.withColumn("__score",
      TextFunctions.qualityScore(col("text")).cast("double"))
      .withColumn("__size", col("n_chars").cast("long"))
    val totals = scored.groupBy("__score").agg(sum("__size").as("__tot"))
    // warm
    totals.count()
    for (cap <- Seq(1 << 20, 1 << 14, 1 << 10)) {
      val t = time(totals.orderBy(desc("__score")).limit(cap + 1).collect())
      println(f"totals collect with limit ${cap + 1}%8d: $t%5.2fs")
    }
    println(f"totals collect NO limit: ${time(totals.orderBy(desc("__score")).collect())}%5.2fs")
    for (i <- 1 to 2)
      println(f"full budgetSelect pass $i: ${
        time(graft.llm.Mix.budgetSelect(docs, TextFunctions.qualityScore(col("text")),
          col("n_chars"), 30000, col("doc_id")).count())}%5.2fs")
  }
}
