package graft
import graft.core.Graft
import graft.llm.{Bpe, Decontaminate}
import org.apache.spark.sql.functions._

/** Scale-curve probe for the round's new operators: BPE encode and fuzzy
  * decontamination over 1×/2×/4× copies of the sf0.1 documents corpus
  * (ids shifted per copy — every copy is an exact near-dup of the base,
  * the adversarial shape for the fuzzy candidate join: each corpus doc
  * collides with its benchmark twin in every band).
  */
object ProfBpeFuzzy {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("profbpefuzzy")
    val docs = Graft.table(spark, "/root/testdata/sf0.1", "documents")
    spark.range(1000000).selectExpr("sum(id)").collect()
    docs.count()
    val merges = Seq("t" -> "h", "th" -> "e", "t" -> "a", "l" -> "e",
      "ta" -> "b", "tab" -> "le", "s" -> "c", "o" -> "r", "e" -> "r",
      "a" -> "n", "s" -> "t", "r" -> "o")
    for (mult <- Seq(1, 2, 4)) {
      val corpus = (0 until mult).map(i =>
        docs.select((col("doc_id") + i * 1000000).as("doc_id"), col("text")))
        .reduce(_ unionByName _)
      val bench = docs.filter(col("doc_id") % 50 === 0)
        .select((col("doc_id") + 100000000L).as("bench_id"), col("text"))
      time(s"bpe-encode-${mult}x") {
        corpus.select(Bpe.symbolCount(Bpe.encodeText(col("text"), merges))
            .as("n_bpe"))
          .agg(sum(col("n_bpe"))).collect()
      }
      time(s"fuzzy-decon-${mult}x") {
        println(Decontaminate.flaggedFuzzy(corpus, "doc_id", "text",
          bench, "bench_id", "text", threshold = 0.7).count())
      }
    }
    spark.stop()
  }
}
