package graft
import graft.core.Graft
import graft.llm.Dedup

object ProfSimhashR8b {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("simhash-probe-sf01")
    spark.sparkContext.setLogLevel("WARN")
    val docs = Graft.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count() // warm the scan
    for (h <- Seq(4, 6, 4, 6)) {
      val t0 = System.nanoTime()
      val n = Dedup.simhashPairsVerified(docs, "doc_id", "text",
        threshold = 0.7, maxHamming = h).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[probe] sf0.1 h=$h pairs=$n time=$secs%.2f s")
    }
    spark.stop()
  }
}
