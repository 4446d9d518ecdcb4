package graft.tools
import org.apache.spark.sql.functions._
object ProfBpePairs {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("prof-bpe-pairs")
    val docs = graft.core.Graft.table(spark, "/root/testdata/sf0.1", "documents")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.llm.Bpe.pairCounts(docs, col("text"))
        .orderBy(col("cnt").desc, col("pair")).limit(20).collect().length
      println(f"PROF_PAIRS run$i n=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
