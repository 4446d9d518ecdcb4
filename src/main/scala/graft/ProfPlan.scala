package graft
import graft.core.Graft
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("profplan")
    val d = "/root/testdata/sf0.1"
    val df = SparkEntry.queries("q_ann_lsh")(spark, d)
    df.explain("formatted")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries("q_ann_lsh")(spark, d).count()
      println(s"PROF run$i: ${(System.nanoTime()-t0)/1e9}s")
    }
    spark.stop()
  }
}
