package graft
import graft.core.Graft

/** Ad-hoc plan inspector: `runMain graft.ProfPlan <query> [sfDir]` prints
  * the formatted physical plan and three timed runs.
  */
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val q = if (args.nonEmpty) args(0) else "q_ann_lsh"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Graft.localSession("profplan")
    val df = SparkEntry.queries(q)(spark, d)
    df.explain("formatted")
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, d).count()
      println(s"PROF run$i: ${(System.nanoTime() - t0) / 1e9}s")
    }
    spark.stop()
  }
}
