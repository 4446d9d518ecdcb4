package graft
import graft.core.Graft
import graft.llm.{Opq, Pq}
import graft.functions.{PqExpressions, RotateVector}
import org.apache.spark.sql.functions._

object ProfOpq {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("opq-probe")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
    val t0 = System.nanoTime()
    val (mean, cov) = Opq.covariance(emb, "embedding", 64)
    println(f"[probe] covariance time=${(System.nanoTime() - t0) / 1e9}%.2f s mean0=${mean(0)}%.4f c00=${cov(0)(0)}%.5f c01=${cov(0)(1)}%.5f")
    val t1 = System.nanoTime()
    val r = Opq.trainRotation(emb, "embedding", 64, m = 4)
    println(f"[probe] trainRotation total=${(System.nanoTime() - t1) / 1e9}%.2f s")
    // orthonormality check
    val maxErr = (for (i <- 0 until 64; j <- 0 until 64) yield {
      var s = 0.0; for (k <- 0 until 64) s += r(i)(k) * r(j)(k)
      math.abs(s - (if (i == j) 1.0 else 0.0))
    }).max
    println(f"[probe] orthonormality max err=$maxErr%.2e")
    def distortion(df: org.apache.spark.sql.DataFrame, vc: String, mo: Pq.PqModel): Double = {
      val rows = df.select(col(vc).cast("array<double>").as("v"),
          PqExpressions.encode(col(vc), mo.codebooks, mo.m, mo.ksub, mo.dsub).as("codes"))
        .collect()
      rows.map { row =>
        val v = row.getSeq[Double](0); val codes = row.getSeq[Int](1)
        var s = 0.0
        for (j <- 0 until mo.m; d <- 0 until mo.dsub) {
          val diff = v(j * mo.dsub + d) - mo.codebooks((j * mo.ksub + codes(j)) * mo.dsub + d)
          s += diff * diff
        }
        s
      }.sum / rows.length
    }
    val flat = Pq.train(emb, "embedding", dim = 64, m = 4, ksub = 8, iters = 2)
    val dFlat = distortion(emb.select(col("embedding").cast("array<double>").as("v")), "v", flat)
    val (rot, opqModel) = Opq.train(emb, "embedding", dim = 64, m = 4, ksub = 8, iters = 2)
    val dOpq = distortion(emb.select(RotateVector(col("embedding"), rot).as("v")), "v", opqModel)
    println(f"[probe] distortion flat=$dFlat%.5f opq=$dOpq%.5f ratio=${dOpq / dFlat}%.3f")
    spark.stop()
  }
}
