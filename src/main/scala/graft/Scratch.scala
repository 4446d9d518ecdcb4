package graft

import graft.core.Graft

/** Ad-hoc timing scratchpad (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("scratch")
    val sf = "/root/testdata/sf0.1"
    for (q <- Seq("q_ann_lsh", "q_embed_neardup", "q_embed_topk", "q_dedup_minhash");
         i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sf).count()
      println(s"SCRATCH $q run$i: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
    }
    spark.stop()
  }
}
