package graft
import graft.core.Graft
import graft.llm.Dedup
import org.apache.spark.sql.functions._
object ProfMinhash2 {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("prof2")
    val docs = Graft.table(spark, "/root/testdata/sf0.1", "documents")
    spark.range(1000000).selectExpr("sum(id)").collect()
    docs.count()
    time("signatures") {
      Dedup.minhashSignatures(docs, "doc_id", "text").write.mode("overwrite").format("noop").save()
    }
    time("dedup-full") {
      println(Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.7).count())
    }
    time("dedup-full-again") {
      println(Dedup.minhashDedup(docs, "doc_id", "text", threshold = 0.7).count())
    }
    spark.stop()
  }
}
