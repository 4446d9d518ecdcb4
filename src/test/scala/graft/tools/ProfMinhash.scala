package graft
import graft.core.Graft
import graft.llm.{Dedup, Similarity}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
object ProfMinhash {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("prof")
    val d = "/root/testdata/sf0.1"
    val emb = Graft.table(spark, d, "embeddings")
    spark.range(1000000).selectExpr("sum(id)").collect() // warm
    println("emb rows: " + emb.count())
    time("sig-only") {
      emb.select(VectorFunctions.hyperplaneSignature(col("embedding"), 64, 8, 42L).as("s"))
        .write.mode("overwrite").format("noop").save()
    }
    time("sig-x3-explode") {
      emb.select(col("vec_id"), explode(array(Seq(42L,1042L,2042L).zipWithIndex.map { case (s,i) =>
        struct(lit(i).as("s"), VectorFunctions.hyperplaneSignature(col("embedding"), 64, 8, s).as("sig"))
      }: _*)).as("bk")).write.mode("overwrite").format("noop").save()
    }
    time("ann-full") {
      println(Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", dim = 64, k = 5).count())
    }
    time("ann-full-again") {
      println(Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", dim = 64, k = 5).count())
    }
    time("neardup") {
      val planted = emb.filter(col("vec_id") < 20).withColumn("vec_id", col("vec_id") + 100000)
      println(Dedup.embeddingPairs(emb.unionByName(planted), "vec_id", "embedding", dim = 64, threshold = 0.9).count())
    }
    time("simhash-full") {
      println(Dedup.simhashPairs(Graft.table(spark, d, "documents"), "doc_id", "text", maxHamming = 3).count())
    }
    spark.stop()
  }
}
