package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking for retrieval / context-window pipelines: cut each
  * document into fixed-width overlapping token windows — the "document →
  * chunks" step that feeds an embedding model or a BM25 index
  * ([[Lexical]]), as distinct from [[Dedup.tokenChunks]] (non-overlapping
  * spans whose purpose is dedup keys) and [[Pack.concatChunk]] (packing
  * many docs into one sequence).
  *
  * Entirely map-only: the token array, the start offsets (an arithmetic
  * `sequence`), the slice, and the re-join all run inside whole-stage
  * codegen in the scan stage — zero shuffles at any corpus size, and
  * chunking composes with partition pruning and pushed filters.
  *
  * Chunks start at 0, stride = width − overlap apart. A trailing start
  * whose tokens are ALL already covered by the previous chunk (i.e.
  * `start + overlap ≥ n` for `start > 0`) is dropped — the last emitted
  * chunk may be shorter than `width` but never redundant. Blank docs
  * produce no chunks.
  */
object Chunk {

  private def termsOf(c: Column): Column = graft.functions.TextFunctions.tokens(c)

  private def explodeStarts(df: DataFrame, textCol: String, width: Int,
      overlap: Int): DataFrame = {
    require(width > 0, s"width must be positive: $width")
    require(overlap >= 0 && overlap < width,
      s"overlap must be in [0, width): $overlap vs width $width")
    // chunkField rides over ARBITRARY record schemas: a user field named
    // like a helper would be silently clobbered by withColumn (and emitted
    // under the user's name by the final select) — refuse loudly instead,
    // the same stance intervalOverlap takes on colliding columns
    Seq("__t", "__n", "start_tok").foreach { h =>
      require(!df.columns.contains(h),
        s"chunking reserves helper column '$h'; rename the input column")
    }
    val stride = width - overlap
    df.filter(trim(col(textCol)) =!= "")
      .withColumn("__t", termsOf(col(textCol)))
      .withColumn("__n", size(col("__t")))
      .withColumn("start_tok",
        explode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .filter(col("start_tok") === 0 || col("__n") > col("start_tok") + lit(overlap))
  }

  /** (idCol, chunk_id, start_tok, n_tokens, chunk_text) — `chunk_id` is
    * the 0-based window index (`start_tok / stride`, dense by
    * construction).
    */
  def fixedTokenChunks(df: DataFrame, idCol: String, textCol: String,
      width: Int, overlap: Int = 0): DataFrame = {
    val stride = width - overlap
    explodeStarts(df.select(col(idCol), col(textCol)), textCol, width, overlap)
      .select(
        col(idCol),
        (col("start_tok") / stride).cast("int").as("chunk_id"),
        col("start_tok"),
        least(lit(width), col("__n") - col("start_tok")).as("n_tokens"),
        array_join(slice(col("__t"), col("start_tok") + 1, lit(width)), " ")
          .as("chunk_text"))
  }

  /** Row-preserving variant: every other column rides along unchanged,
    * the text column is REPLACED by the chunk, and `ixCol` carries the
    * 0-based window index — the shape a record-pipeline (TOML `ChunkText`
    * filter) wants. Still map-only.
    */
  def chunkField(df: DataFrame, textCol: String, width: Int, overlap: Int = 0,
      ixCol: String = "chunk_ix"): DataFrame = {
    val stride = width - overlap
    val out = df.columns
    explodeStarts(df, textCol, width, overlap)
      .withColumn(textCol,
        array_join(slice(col("__t"), col("start_tok") + 1, lit(width)), " "))
      .withColumn(ixCol, (col("start_tok") / stride).cast("int"))
      .select((out.filterNot(_ == ixCol) :+ ixCol).map(col): _*)
  }
}
