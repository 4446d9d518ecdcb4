package graft.tools
import org.apache.spark.sql.functions._
object ProfClassifier {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("prof-classifier")
    val docs = graft.core.Graft.table(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text", "lang")
    val w = Map("join" -> 0.5, "slow" -> -0.5, "hash" -> 0.25,
      "batch" -> -0.125, "scan" -> 0.0625, "hash join" -> 0.25)
    def time(tag: String)(f: => Long): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime(); val n = f
        println(f"PROF $tag%-12s run$i n=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    time("native") {
      graft.llm.Classifier.qualityFilter(docs, "doc_id", "text", w, wordNgrams = 2).count()
    }
    // the pre-round-5 shape: explode + broadcast join + agg + semi-join
    import spark.implicits._
    time("semijoin") {
      val feats = concat(graft.functions.TextFunctions.tokens(col("text")),
        graft.functions.TextFunctions.shingles(col("text"), 2))
      val kept = docs.select(col("doc_id"), explode(feats).as("__f"))
        .join(broadcast(w.toSeq.toDF("token", "weight")), col("__f") === col("token"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n"), sum(coalesce(col("weight"), lit(0.0))).as("sw"))
        .filter(col("sw") / col("n") > 0).select(col("doc_id").as("__k"))
      docs.join(kept, col("doc_id") === col("__k"), "left_semi").count()
    }
    time("score_only") {
      graft.llm.Classifier.scoreLinear(docs, "doc_id", "text", w, wordNgrams = 2)
        .filter(col("keep")).count()
    }
    spark.stop()
  }
}
