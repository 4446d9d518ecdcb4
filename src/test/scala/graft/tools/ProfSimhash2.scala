package graft

import graft.core.Graft
import graft.llm.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Probe 2: how selective is an exact size-ratio gate on the simhash
  * candidate set, and does the verify join broadcast?
  */
object ProfSimhash2 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("simhash-prof2")
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Graft.table(spark, d, "documents").cache()
    docs.count()

    val cand = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4)
      .select("idA", "idB").cache()
    println(s"candidates=${cand.count()}")

    // per-doc distinct-shingle-set size (scalar)
    val sizes = docs.select(col("doc_id").as("__vid"),
      size(array_distinct(transform(TextFunctions.shingles(col("text"), 3),
        g => xxhash64(g)))).cast("double").as("__n")).cache()
    sizes.count()

    val withSizes = cand
      .join(sizes.withColumnRenamed("__vid", "idA").withColumnRenamed("__n", "nA"), Seq("idA"))
      .join(sizes.withColumnRenamed("__vid", "idB").withColumnRenamed("__n", "nB"), Seq("idB"))
    val surviving = withSizes
      .filter(col("nA") >= col("nB") * 0.7 && col("nB") >= col("nA") * 0.7).count()
    println(s"size-gate survivors at 0.7 = $surviving")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // current verify cost on the cached candidates (isolates verify)
    for (i <- 1 to 2) {
      val (n, t) = time(Dedup.verifyJaccard(cand, docs, "doc_id", "text",
        3, minJaccard = 0.7).filter(col("jaccard") >= 0.7).count())
      println(f"verify pass $i: out=$n t=$t%5.2fs")
    }
    // the verify plan: broadcast or sort-merge?
    val plan = Dedup.verifyJaccard(cand, docs, "doc_id", "text", 3, minJaccard = 0.7)
      .queryExecution.executedPlan.toString
    println("plan joins: " + "(?i)(broadcasthashjoin|sortmergejoin|shuffledhashjoin)".r
      .findAllIn(plan).toSeq.groupBy(identity).view.mapValues(_.size).toMap)
  }
}
