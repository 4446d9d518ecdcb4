package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.llm.{Ivf, Semantic}

/** Dev probe: which stage of q_semdedup trips the codegen fallback? */
object ProfSemStages {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .appName("prof-sem-stages").getOrCreate()
    graft.core.Graft.tune(spark)
    val emb = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val planted = emb.filter(col("vec_id") < 20)
      .withColumn("vec_id", col("vec_id") + 100000)
    val all = emb.unionByName(planted)
    println("=== stage: train ===")
    val cents = Ivf.train(all, "embedding", 64, 16, 2)
    println("=== stage: pairs ===")
    Semantic.semDedupPairs(all, "vec_id", "embedding", 64, 0.9,
      codebook = Some(cents)).collect()
    println("=== stage: dropped ===")
    Semantic.semDedupDropped(all, "vec_id", "embedding", 64, 0.9,
      codebook = Some(cents)).collect()
    println("=== all done ===")
    spark.stop()
  }
}
// (debug variant lives in ProfSemCode.scala)
