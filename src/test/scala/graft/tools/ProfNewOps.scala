package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: which of the round-5 queries trips a codegen fallback? */
object ProfNewOps {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("prof-new-ops").getOrCreate()
    graft.core.Graft.tune(spark)
    val d = "/root/testdata/sf0.001"
    for (q <- Seq("q_semdedup", "q_ccnet_buckets", "q_dsir_stats")) {
      println(s"=== $q ===")
      graft.SparkEntry.queries(q)(spark, d).collect()
      println(s"=== done $q ===")
    }
    spark.stop()
  }
}
