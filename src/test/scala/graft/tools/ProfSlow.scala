package graft.tools
object ProfSlow {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("prof-slow")
    val sf = "/root/testdata/sf0.1"
    val qs = Seq("q_curation", "q_decontaminate_fuzzy", "q_keywords",
      "q_dedup_cdc", "q_dedup_minhash", "q_ann_ivf", "q_bpe_train", "q_bpe_pairs")
    for (q <- qs; i <- 1 to 2) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, sf).collect().length
      println(f"PROF_SLOW $q%-22s run$i rows=$n%6d wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
