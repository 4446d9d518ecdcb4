package graft
import graft.core.Graft
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Probe: simhash recall vs exact jaccard>=0.7 pairs per hamming radius,
  * per SF, on the r7-regenerated corpus; plus wall time per radius.
  */
object ProfSimhashR8 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("simhash-probe")
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Graft.table(spark, sf, "documents")
      for (h <- Seq(4, 5, 6)) {
        val t0 = System.nanoTime()
        val n = Dedup.simhashPairsVerified(docs, "doc_id", "text",
          threshold = 0.7, maxHamming = h).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[probe] sf=$sf h=$h pairs=$n time=$secs%.2f s")
      }
    }
    spark.stop()
  }
}
