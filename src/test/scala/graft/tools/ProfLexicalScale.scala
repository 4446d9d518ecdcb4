package graft
import graft.core.Graft
import graft.llm.Lexical
import org.apache.spark.sql.functions._

/** Scale-curve probe for the lexical retrieval family: 1x/2x/4x copies of
  * the sf0.1 documents with shifted ids — every copy duplicates the base
  * corpus, so query-term posting lists (the only thing search touches)
  * grow linearly with the multiple. Measures index build (the one
  * postings shuffle), one-shot bm25TopK, search over a pre-built index,
  * and the Jaccard retrieval scorer.
  */
object ProfLexicalScale {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("lexical-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val base = Graft.table(spark, "/root/testdata/sf0.1", "documents")
    val queries = Seq(
      1L -> "spark window agg", 2L -> "fast scan filter table",
      3L -> "customer query join stream", 4L -> "merge batch sort",
      5L -> "vector data column").toDF("query_id", "qtext")
    for (mult <- Seq(1, 2, 4)) {
      val corpus = (0 until mult).map(m =>
        base.withColumn("doc_id", col("doc_id") + lit(m * 10000000L))).reduce(_ unionByName _)
      val n = corpus.count()
      def time(tag: String)(body: => Long): Unit = {
        val t0 = System.nanoTime()
        val rows = body
        println(f"[probe] mult=$mult n=$n $tag rows=$rows time=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("build+count") {
        val idx = Lexical.buildIndex(corpus, "doc_id", "text")
        idx.postings.count()
      }
      time("bm25_oneshot") {
        Lexical.bm25TopK(corpus, queries, "doc_id", "text", "query_id", "qtext", k = 10).count()
      }
      val built = Lexical.buildIndex(corpus, "doc_id", "text")
      built.postings.persist().count() // the at-rest analogue: postings materialized
      time("bm25_prebuilt") {
        Lexical.bm25Search(built, queries, "query_id", "qtext", k = 10).count()
      }
      built.postings.unpersist()
      time("jaccard") {
        Lexical.jaccardTopK(corpus, queries, "doc_id", "text", "query_id", "qtext",
          k = 10, shingleK = 2).count()
      }
    }
    spark.stop()
  }
}
