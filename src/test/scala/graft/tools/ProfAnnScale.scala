package graft
import graft.core.Graft
import graft.llm.{IvfPq, Pq, Quantize}
import org.apache.spark.sql.functions._

/** Scale-curve probe for the round-8 ANN family: 1x/2x/4x copies of the
  * sf0.1 embeddings with shifted ids — every copy is an exact duplicate
  * of the base, so each query's true-neighbor set grows linearly with
  * the multiple (the adversarial shape for candidate generation).
  * Measures IVF-PQ (cell-pruned ADC), two-stage int8, and flat PQ.
  */
object ProfAnnScale {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("ann-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    val base = Graft.table(spark, "/root/testdata/sf0.1", "embeddings")
    val coarse = IvfPq.deterministicCoarse(nlist = 8, dim = 64, seed = 11L, scale = 0.125)
    val model = Pq.deterministicModel(m = 4, ksub = 8, dsub = 16, seed = 7L, scale = 0.125)
    val (mins, maxs) = Quantize.int8Stats(base, "embedding", 64)
    for (mult <- Seq(1, 2, 4)) {
      val corpus = (0 until mult).map(m =>
        base.withColumn("vec_id", col("vec_id") + lit(m * 1000000L))).reduce(_ unionByName _)
      val n = corpus.count()
      val q = base.filter(col("vec_id") < 8)
      def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val rows = df.count()
        println(f"[probe] mult=$mult n=$n $tag rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("ivfpq")(IvfPq.adcTopK(corpus, q, "vec_id", "embedding", coarse, model,
        nprobe = 2, k = 5))
      time("int8")(Quantize.int8TopK(corpus, q, "vec_id", "embedding", mins, maxs,
        k = 5, rerank = 50))
      time("pq")(Pq.adcTopK(corpus, q, "vec_id", "embedding", model, k = 5))
    }
    spark.stop()
  }
}
