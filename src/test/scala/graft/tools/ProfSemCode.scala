package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Ivf, Semantic}

/** Dev probe: dump the generated Java around the q_semdedup codegen failure. */
object ProfSemCode {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("prof-sem-code").getOrCreate()
    graft.core.Graft.tune(spark)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.DEBUG)
    val emb = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val planted = emb.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 100000)
    val all = emb.unionByName(planted)
    val cents = Ivf.train(all, "embedding", 64, 16, 2)
    Semantic.semDedupPairs(all, "vec_id", "embedding", 64, 0.9,
      codebook = Some(cents)).collect()
    spark.stop()
  }
}
