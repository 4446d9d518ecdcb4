package graft
import graft.core.Graft
import graft.llm.{Opq, Pq}
import graft.functions.{PqExpressions, RotateVector}
import org.apache.spark.sql.functions._

object ProfOpq2 {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("opq-probe2")
    spark.sparkContext.setLogLevel("WARN")
    val emb = Graft.table(spark, "/root/testdata/sf0.001", "embeddings")
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
    for ((m, ksub) <- Seq((8, 16), (8, 32), (16, 16))) {
      val flat = Pq.train(emb, "embedding", dim = 64, m = m, ksub = ksub, iters = 3)
      val dFlat = distortion(emb.select(col("embedding").cast("array<double>").as("v")), "v", flat)
      val (rot, opqModel) = Opq.train(emb, "embedding", dim = 64, m = m, ksub = ksub, iters = 3)
      val dOpq = distortion(emb.select(RotateVector(col("embedding"), rot).as("v")), "v", opqModel)
      println(f"[probe] m=$m ksub=$ksub flat=$dFlat%.5f opq=$dOpq%.5f ratio=${dOpq / dFlat}%.3f")
    }
    spark.stop()
  }
}
