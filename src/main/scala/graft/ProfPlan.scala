package graft
import graft.core.Graft
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("profplan")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q1_agg", "q_projection", "q_join_agg", "q_clause_filter", "q_timestamp_range")) {
      println(s"===== $q =====")
      SparkEntry.queries(q)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
