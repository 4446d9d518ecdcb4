package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Dedup

/** Variant attribution for q_dedup_incremental_embed: persist on/off ×
  * hot-bucket cap on/off, wall + stage count each, to separate the two
  * round-10 changes. Usage: Test/runMain graft.ProfEmbedDedup [sfDir]
  */
object ProfEmbedDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Graft.localSession("embed-dedup-probe")
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    def variant(persist: Boolean, cap: Int): DataFrame = {
      val raw = graft.core.Graft.table(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val emb = if (persist)
        raw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else raw
      val copies = emb.filter(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 100000)
      val negs = emb.filter(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 300000)
        .withColumn("embedding", transform(col("embedding"), x => -x))
      Dedup.incrementalEmbeddingDedup(copies.unionByName(negs), "vec_id", "embedding",
        atRestSigs = Dedup.embeddingSignatures(emb, "vec_id", "embedding", 64),
        atRestVecs = emb, dim = 64, threshold = 0.9, maxBucketSize = cap)
    }

    for ((p, c) <- Seq((false, 0), (false, 4096), (true, 0), (true, 4096))) {
      for (round <- Seq("cold", "steady")) {
        val t0 = System.nanoTime()
        val n = variant(p, c).count()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"[probe] persist=$p cap=$c%-5d $round%-6s rows=$n wall=$wall%6.2f s")
      }
      spark.sharedState.cacheManager.clearCache()
    }
    val _ = sc
    spark.stop()
  }
}
