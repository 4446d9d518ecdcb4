package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{NearestCells, VectorFunctions}

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): cluster document embeddings with k-means, then within
  * each cluster drop every member that has a semantic-duplicate partner
  * (cosine ≥ threshold) of higher keep-priority. The cluster step localizes
  * the quadratic comparison — the all-pairs term is per-CELL, never
  * corpus-wide — which is the published method's point and exactly the
  * partition-pruning stance [[Ivf]] takes for ANN.
  *
  * Complements [[Dedup.embeddingPairs]] (hyperplane-LSH near-dup): LSH
  * buckets by random projections and needs signature agreement; k-means
  * cells follow the embedding distribution, so SemDeDup catches looser
  * "same meaning" duplicates inside a dense topic cluster at lower
  * thresholds.
  *
  * Scale shape (the 100 TB contract):
  *  - cell assignment is the codegen'd map-only [[NearestCells]] scan —
  *    the centroid codebook rides in the generated code, no join;
  *  - the only corpus shuffle is the self-join keyed on the cell id;
  *    `maxCellSize` (via [[Dedup.pruneHotBuckets]]) bounds a degenerate
  *    cell the way every LSH path here bounds a hot bucket;
  *  - pair rows carry only (idA, idB, cosine) scalars past the join —
  *    vectors never cross the pair shuffle;
  *  - driver state is the `nlist × dim` codebook (KB), nothing else.
  */
object Semantic {

  /** Corpus with a deterministic `__cell` column appended (map-only).
    * `coalesce → -1` keeps the join key provably non-nullable so join-key
    * IsNotNull inference can't re-evaluate the assignment in a pushed
    * filter (same trap as [[Ivf.ivfTopK]]).
    */
  private def withCell(df: DataFrame, vecCol: String, cents: Array[Array[Double]])
      : DataFrame =
    df.withColumn("__cell",
      coalesce(element_at(NearestCells(col(vecCol), cents, 1), 1), lit(-1)))

  /** Semantic-duplicate pairs: same k-means cell AND cosine ≥ `threshold`.
    * Returns (idA, idB, cosine) with idA < idB. Pass a pre-trained
    * `codebook` to pin the clustering (and make repeated calls reuse one
    * training); otherwise [[Ivf.train]] runs its deterministic Lloyd
    * iterations here.
    */
  def semDedupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, nlist: Int = 16, iters: Int = 2,
      codebook: Option[Array[Array[Double]]] = None, maxCellSize: Int = 0)
      : DataFrame = {
    val cents = codebook.getOrElse(Ivf.train(df, vecCol, dim, nlist, iters))
    val cells = withCell(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")), "__v", cents)
    val pruned = Dedup.pruneHotBuckets(cells, "__cell", maxCellSize)
    val a = pruned.select(col("__cell"), col("__id").as("idA"), col("__v").as("vA"))
    val b = pruned.select(col("__cell").as("__cell2"), col("__id").as("idB"),
      col("__v").as("vB"))
    a.join(b, col("__cell") === col("__cell2") && col("idA") < col("idB"))
      .select(col("idA"), col("idB"),
        VectorFunctions.cosineFast(col("vA"), col("vB")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  /** Rows SemDeDup would drop, with the partner that evicts them:
    * (id, dup_of) where `dup_of` is the smallest-id in-cell partner with
    * cosine ≥ threshold below the dropped id. Keep-priority is ascending
    * id — deterministic and restatable by a SQL oracle; the published
    * keep-farthest-from-centroid policy is [[semDedupCentroid]].
    */
  def semDedupDropped(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, nlist: Int = 16, iters: Int = 2,
      codebook: Option[Array[Array[Double]]] = None, maxCellSize: Int = 0)
      : DataFrame =
    semDedupPairs(df, idCol, vecCol, dim, threshold, nlist, iters, codebook,
        maxCellSize)
      // idA < idB throughout, so idB is always the evicted side; the agg is
      // scalar-only (two longs) — hash-aggregable, map-side combined
      .groupBy(col("idB").as("id"))
      .agg(min("idA").as("dup_of"))

  /** SemDeDup'd corpus: the input minus every row with a lower-id in-cell
    * partner at cosine ≥ threshold. One extra broadcast-able anti-join on
    * the (small) dropped-id set; original columns pass through untouched.
    */
  def semDedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, nlist: Int = 16, iters: Int = 2,
      codebook: Option[Array[Array[Double]]] = None, maxCellSize: Int = 0)
      : DataFrame = {
    val dropped = semDedupDropped(df, idCol, vecCol, dim, threshold, nlist,
      iters, codebook, maxCellSize).select(col("id").as("__dropped"))
    df.join(broadcast(dropped), col(idCol) === col("__dropped"), "left_anti")
  }

  /** SemDeDup with the paper's keep policy: within a duplicate pair, keep
    * the member FARTHER from its cluster centroid (lower centroid cosine;
    * the paper argues boundary examples carry more training signal), ties
    * broken by ascending id. Returns the dropped ids.
    *
    * The priority needs each row's centroid similarity: the codebook is
    * nlist rows, so it broadcast-joins as a tiny (cell, centroid) table and
    * the cosine is one more codegen'd map-only column.
    */
  def semDedupCentroidDropped(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, threshold: Double = 0.95, nlist: Int = 16, iters: Int = 2,
      codebook: Option[Array[Array[Double]]] = None, maxCellSize: Int = 0)
      : DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cents = codebook.getOrElse(Ivf.train(df, vecCol, dim, nlist, iters))
    val cells = withCell(
      df.select(col(idCol).as("__id"), col(vecCol).as("__v")), "__v", cents)
    val centDf = broadcast(
      cents.toSeq.zipWithIndex.map { case (c, i) => (i, c) }
        .toDF("__ccell", "__centroid"))
    val prio = cells.join(centDf, col("__cell") === col("__ccell"))
      .withColumn("__prio",
        VectorFunctions.cosineFast(col("__v"), col("__centroid")))
      .select("__cell", "__id", "__v", "__prio")
    val pruned = Dedup.pruneHotBuckets(prio, "__cell", maxCellSize)
    val a = pruned.select(col("__cell"), col("__id").as("idA"), col("__v").as("vA"),
      col("__prio").as("pA"))
    val b = pruned.select(col("__cell").as("__cell2"), col("__id").as("idB"),
      col("__v").as("vB"), col("__prio").as("pB"))
    // keeper = lower centroid-cosine (farther out), tie → lower id; emit the
    // LOSER of each qualifying pair, then distinct — scalar-only agg
    a.join(b, col("__cell") === col("__cell2") && col("idA") < col("idB"))
      .filter(VectorFunctions.cosineFast(col("vA"), col("vB")) >= threshold)
      .select(when(struct(col("pA"), col("idA")) <= struct(col("pB"), col("idB")),
        col("idB")).otherwise(col("idA")).as("id"))
      .distinct()
  }
}
