package graft
import graft.core.Graft
import graft.llm.{Dedup, Similarity}
import org.apache.spark.sql.functions._

/** Probe: are the LSH-candidate paths exact on the driver's test corpus?
  * (a) lshTopK vs bruteForceTopK at sf0.01 — equal iff every true top-5
  *     neighbor shares a hyperplane bucket with its query.
  * (b) minhash candidate recall over the exact shingle-Jaccard≥0.7 pairs.
  * (c) simhash (hamming≤3) candidate recall over the same exact pairs.
  * Deterministic for fixed data + seeds, so "exact here" is stable.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("lsh-exactness-probe")
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val docs = Graft.table(spark, d, "documents")
    val emb = Graft.table(spark, d, "embeddings")

    val bf = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", k = 5, dim = 64)
    val lsh = Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8),
      "vec_id", "embedding", dim = 64, k = 5)
    val diff = bf.exceptAll(lsh).count() + lsh.exceptAll(bf).count()
    println(s"ANN: brute=${bf.count()} lsh=${lsh.count()} symdiff=$diff")

    // exact shingle-Jaccard pairs >= 0.7
    val exact = Dedup.verifyJaccard(
      docs.select(col("doc_id").as("idA")).crossJoin(
        docs.select(col("doc_id").as("idB"))).filter(col("idA") < col("idB")),
      docs, "doc_id", "text", ngram = 3)
      .filter(col("jaccard") >= 0.7).select("idA", "idB").cache()
    val nExact = exact.count()

    val mh = Dedup.minhashPairs(docs, "doc_id", "text")
      .filter(col("est_jaccard") >= 0.35).select("idA", "idB")
    val mhMiss = exact.exceptAll(mh).count()
    println(s"minhash: exactPairs=$nExact candMissed=$mhMiss")

    val sh = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .select("idA", "idB")
    val shMiss = exact.exceptAll(sh).count()
    println(s"simhash: exactPairs=$nExact candMissed=$shMiss")
    spark.stop()
  }
}
