package graft

import graft.core.Graft
import graft.llm.Dedup
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** Probe 4: decompose the verify leg — shingle scan vs pair join vs
  * intersect compute — plus shingle-set size stats.
  */
object ProfSimhash4 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("simhash-prof4")
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Graft.table(spark, d, "documents")
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val sh = docs.select(col("doc_id").as("__vid"),
      array_distinct(transform(TextFunctions.shingles(col("text"), 3),
        g => xxhash64(g))).as("__sh"))
    sh.count()
    for (i <- 1 to 2) println(f"sh scan: ${time(sh.count())}%5.2fs")
    println(sh.select(min(size(col("__sh"))), avg(size(col("__sh"))),
      max(size(col("__sh")))).head())

    val cand = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 4,
      minSizeRatio = 0.7).select("idA", "idB").cache()
    println(s"cand=${cand.count()}")

    val joined = cand
      .join(sh.withColumnRenamed("__vid", "idA").withColumnRenamed("__sh", "__shA"), Seq("idA"))
      .join(sh.withColumnRenamed("__vid", "idB").withColumnRenamed("__sh", "__shB"), Seq("idB"))
    for (i <- 1 to 2)
      println(f"join only (arrays attached, no intersect): ${time(joined.count())}%5.2fs")
    val withJ = joined.withColumn("j",
      size(array_intersect(col("__shA"), col("__shB"))))
    for (i <- 1 to 2)
      println(f"join + intersect: ${time(withJ.agg(sum("j")).head())}%5.2fs")
    for (i <- 1 to 2)
      println(f"verifyJaccard on cached cand: ${
        time(Dedup.verifyJaccard(cand, docs, "doc_id", "text", 3, minJaccard = 0.7)
          .filter(col("jaccard") >= 0.7).count())}%5.2fs")
  }
}
