package graft
import graft.core.Graft
import org.apache.spark.sql.functions._

/** Scale-curve probe: time minhashDedup on 1×/2×/4× copies of the sf0.1
  * documents corpus (ids shifted per copy so copies are exact near-dups of
  * each other — the adversarial case for LSH banding). Near-linear growth
  * means no hidden quadratic term; superlinear flags a bucket blowup.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("scale-curve")
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Graft.table(spark, d, "documents").select("doc_id", "text")
    for (mult <- Seq(1, 2, 4)) {
      val corpus = (0 until mult).map(i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 10000000L)))
        .reduce(_ unionByName _)
      corpus.count() // materialize read path outside the timing
      val t0 = System.nanoTime()
      val survivors = graft.llm.Dedup.minhashDedup(
        corpus, "doc_id", "text", threshold = 0.7).count()
      println(f"SCALE mult=$mult docs=${66000L * mult} survivors=$survivors " +
        f"secs=${(System.nanoTime() - t0) / 1e9}%.2f")
      // span dedup on the same copies: every span of every copy collides
      // with the base corpus — the maximally hot shape for the content-hash
      // key; map-side partial min_by must absorb it (kept count invariant
      // across multiples: only first occurrences survive)
      val t1 = System.nanoTime()
      val kept = graft.llm.Dedup.firstSpanOccurrence(
        graft.llm.Dedup.tokenChunks(corpus, "doc_id", "text", 8), "doc_id").count()
      println(f"SCALE-SPANS mult=$mult kept=$kept " +
        f"secs=${(System.nanoTime() - t1) / 1e9}%.2f")
    }
    spark.stop()
  }
}
