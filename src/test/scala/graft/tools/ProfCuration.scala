package graft.tools
object ProfCuration {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("prof-curation")
    for (i <- 1 to 5) {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("q_curation")(spark, "/root/testdata/sf0.1").collect().length
      println(f"PROF_CUR run$i rows=$n wall=${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
