package graft.tools

import org.apache.spark.sql.functions._

/** Dev probe: attribute the q_tokenize_hf_import row's single-task encode
  * cost across its pipeline pieces (normalize regex, GPT-2 pretokenizer
  * regex, byte-level map, merge loop, vocab-id map). Each step is timed
  * as a count over the step's output length so the whole chain
  * materializes; steps nest, so step N's cost is wall(N) - wall(N-1).
  * Run: sbt "Test/runMain graft.tools.ProfHfKernel [sfDir] [reps]"
  */
object ProfHfKernel {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = graft.core.Graft.localSession("prof-hf-kernel")
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Graft.table(spark, sfDir, "documents")
      .select("text").cache()
    docs.count()

    val merges = Seq(
      ("t", "a"), ("ta", "b"), ("Ġ", "tab"), ("l", "e"), ("Ġtab", "le"),
      ("Ġ", "s"), ("Ġ", "a"), ("r", "o"), ("ro", "w"), ("Ġ", "row"))
    val vocab = ("Ġ" +: ('a' to 'z').map(_.toString) :+
      "ta" :+ "tab" :+ "Ġtab" :+ "le" :+ "Ġtable" :+ "Ġs" :+ "Ġa" :+
      "ro" :+ "row" :+ "Ġrow").zipWithIndex.map { case (p, i) => (p, 3 * i + 7) }

    val norm = concat(lit("q9 "),
      regexp_replace(trim(coalesce(col("text"), lit(""))), "\\s+", " "))
    val pieces = graft.llm.Bpe.byteLevelPieces(norm)
    val mapped = graft.llm.Bpe.byteLevelMapped(norm)
    val encoded = graft.llm.Bpe.encodeWordsNative(mapped, merges)
    val ids = graft.llm.HfEncode.bpeIds(
      graft.llm.Bpe.docSymbols(array_join(encoded, "|")),
      vocab, unk = 0, byteFallback = false, fuseUnk = false)

    def time(tag: String, c: org.apache.spark.sql.Column): Unit = {
      for (r <- 1 to reps) {
        val t0 = System.nanoTime()
        docs.select(c.as("x")).selectExpr("sum(length(cast(x as string)))").collect()
        println(f"PROF_HF $tag%-12s rep=$r wall=${(System.nanoTime() - t0) / 1e9}%6.3f s")
      }
    }
    val idsFused = graft.llm.HfEncode.bpeIdsOfWords(
      encoded, vocab, unk = 0, byteFallback = false, fuseUnk = false)
    time("base", col("text"))
    time("norm", norm)
    time("pieces", pieces)
    time("mapped", mapped)
    time("encoded", encoded)
    time("ids", ids)
    time("ids_fused", idsFused)
    spark.stop()
  }
}
