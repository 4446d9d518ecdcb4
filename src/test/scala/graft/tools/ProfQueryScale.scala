package graft
import graft.core.Graft
import org.apache.spark.sql.functions._

/** sf0.1 → sf1 scale-proof for the BENCH top-10 heaviest queries: builds
  * a 10× derivative of the sf0.1 documents/embeddings tables under
  * `target/sf1` (MEASUREMENT corpus only — never an oracle input) and
  * times each query at both scales with the Bench protocol (steady run
  * after a warm run, `.count()` action, local[32]).
  *
  * The derivative is built for honest scaling, not copy-paste inflation:
  * each extra copy's tokens carry a copy-specific prefix, so no shingle,
  * minhash band, simhash bucket, or BPE pair is shared ACROSS copies —
  * a 10× corpus behaves like 10× more documents, not like a corpus where
  * every document suddenly has 9 near-duplicates (which would measure a
  * quadratic workload no real 10× scale-up has). Embedding copies shift
  * ids and nudge component 0 by k·10⁻³ (distinct vectors, same geometry).
  */
object ProfQueryScale {

  val top10: Seq[String] = Seq(
    "q_dedup_incremental_video", "q_dedup_incremental_embed", "q_hybrid_rrf",
    "q_sidecar_recipe", "q_curation", "q_bm25", "q_keywords", "q_dedup_cdc",
    "q_ann_ivf", "q_bpe_train")

  def buildScaled(spark: org.apache.spark.sql.SparkSession, srcDir: String,
      dstDir: String, mult: Int): Unit = {
    new java.io.File(dstDir).mkdirs()
    val docs = Graft.table(spark, srcDir, "documents")
    val scaledDocs = (0 until mult).map { k =>
      if (k == 0) docs
      else docs.select(
        (col("doc_id") + k * 10000000L).as("doc_id"),
        array_join(transform(graft.functions.TextFunctions.tokens(col("text")),
          t => concat(lit("c" + k), t)), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    scaledDocs.repartition(8).write.mode("overwrite")
      .parquet(s"$dstDir/documents.parquet")
    val emb = Graft.table(spark, srcDir, "embeddings")
    val scaledEmb = (0 until mult).map { k =>
      if (k == 0) emb
      else emb.select((col("vec_id") + k * 10000000L).as("vec_id"),
        transform(col("embedding"),
          (x, i) => when(i === 0, (x + lit(k * 0.001f)).cast("float"))
            .otherwise(x)).as("embedding"),
        col("label"))
    }.reduce(_ unionByName _)
    scaledEmb.repartition(4).write.mode("overwrite")
      .parquet(s"$dstDir/embeddings.parquet")
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events")) {
      val link = java.nio.file.Paths.get(s"$dstDir/$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$srcDir/$t.parquet"))
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("query-scale-probe")
    val src = "/root/testdata/sf0.1"
    val dst = "target/sf1"
    val mult = 10
    if (!new java.io.File(s"$dst/documents.parquet").exists()) {
      println(s"[scale] building ${mult}x derivative at $dst")
      buildScaled(spark, src, dst, mult)
    }
    val only = if (args.nonEmpty) args.toSeq else top10
    def time(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, dir).count()
      catch { case e: Throwable => println(s"[scale] $name@$dir ERR: $e") }
      (System.nanoTime() - t0) / 1e9
    }
    for (name <- only) {
      time(name, src) // warm: codegen/compile amortized, Bench protocol
      val t01 = time(name, src)
      time(name, dst)
      val t1 = time(name, dst)
      val ratio = t1 / t01
      val exponent = math.log(ratio) / math.log(mult.toDouble)
      println(f"""[scale] {"query":"$name","sf01_sec":$t01%.2f,""" +
        f""""sf1_sec":$t1%.2f,"ratio":$ratio%.2f,"exponent":$exponent%.2f}""")
    }
    spark.stop()
  }
}
