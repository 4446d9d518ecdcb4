package graft

import graft.core.Graft
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Probe 3: steady-state timing of the full q_dedup_simhash path and the
  * physical join/exchange inventory of the candidate plan.
  */
object ProfSimhash3 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("simhash-prof3")
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Graft.table(spark, d, "documents")
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def full(): Long = Dedup.simhashPairsVerified(docs, "doc_id", "text",
      threshold = 0.7, maxHamming = 4).orderBy("idA", "idB").count()
    for (i <- 1 to 3) println(f"full pass $i: ${time(full())}%5.2fs")
    val candOnly = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4,
      minSizeRatio = 0.7)
    println(s"gated candidates = ${candOnly.count()}")
    for (i <- 1 to 2) println(f"cand pass $i: ${time(candOnly.count())}%5.2fs")
    val plan = candOnly.queryExecution.executedPlan.toString
    println("cand plan ops: " +
      "(?i)(broadcasthashjoin|sortmergejoin|shuffledhashjoin|exchange|aqeshuffleread)".r
        .findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
  }
}
