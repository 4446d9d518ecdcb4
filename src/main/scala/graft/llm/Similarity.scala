package graft.llm

import org.apache.spark.sql.{Column, DataFrame, GraftShims}
import org.apache.spark.sql.catalyst.expressions.aggregate.CollectTopK
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set so the corpus is scanned once, map-side, with no shuffle of corpus
  *    rows except the final top-k reduction (k rows per partition).
  *  - [[lshTopK]]: hyperplane-LSH bucketed variant — the 100 TB path: only
  *    same-bucket candidates are scored, trading recall for a scan that
  *    touches each corpus row once and shuffles only candidates.
  */
object Similarity {

  /** Rank scored candidates to top-k per query via Spark's CollectTopK — a
    * bounded-priority-queue aggregate with map-side partial combine, so only
    * k rows per (query, partition) cross the shuffle. A window
    * (`row_number().over(partitionBy(query_id))`) would instead shuffle
    * EVERY scored candidate into |queries| partitions — at a 100 TB corpus
    * that exchange is the whole cost, and it's skewed by construction.
    * Sort key: cosine desc, neighbor asc (deterministic ties); `reverse =
    * true` keeps the k smallest `(-cosine, neighbor_id)` structs and emits
    * them ascending, i.e. already in rank order, without constraining the
    * id type to something negatable.
    */
  private[llm] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val key = GraftShims.toExpression(
      struct((-col("cosine")).as("nc"), col("neighbor_id").as("n")))
    val topk = GraftShims.toColumn(
      new CollectTopK(key, k, true).toAggregateExpression())
    // a null score (a zero-norm vector's 0/0 cosine) must never rank — the
    // ascending struct sort would otherwise place NULL FIRST, crowning an
    // unscorable candidate the top neighbor of every query
    scored.filter(col("cosine").isNotNull)
      .groupBy("query_id").agg(topk.as("__topk"))
      .select(col("query_id"), posexplode(col("__topk")))
      .select(col("query_id"),
        (col("pos") + 1).cast("int").as("rank"),
        col("col.n").as("neighbor_id"),
        (-col("col.nc")).as("cosine"))
  }

  /** Exact top-k cosine neighbors for each query row.
    *
    * @param corpus  (idCol, vecCol, ...) — the big side, never shuffled in
    *                full: the window ranks only (corpus × |queries|) rows,
    *                and Catalyst keeps the broadcast join map-side.
    * @param queries (idCol, vecCol) — must be small (broadcast).
    * @param dim     when ≥ 0, rows whose vector length ≠ dim are dropped
    *                up front (same gate as lshTopK/ivfTopK — a truncated
    *                embedding must not enter scoring).
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 10, excludeSelf: Boolean = true, dim: Int = -1): DataFrame = {
    def gate(df: DataFrame): DataFrame =
      if (dim < 0) df else df.filter(size(col(vecCol)) === dim)
    // norms once per row BEFORE the pair blow-up (the corpus norm would
    // otherwise be recomputed |queries| times per corpus row)
    val dot = VectorFunctions.dotFast _
    def norm(a: Column): Column = sqrt(dot(a, a))
    val q = broadcast(gate(queries).select(col(idCol).as("query_id"), col(vecCol).as("__qv"))
      .withColumn("__qn", norm(col("__qv"))))
    val scored = gate(corpus).select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .withColumn("__cn", norm(col("__cv")))
      .crossJoin(q)
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .withColumn("cosine",
        round(dot(col("__qv"), col("__cv")) / (col("__qn") * col("__cn")), 4))
    topKPerQuery(scored, k)
  }

  /** LSH-bucketed ANN: score only corpus rows that share a hyperplane-LSH
    * bucket with the query under any of `seeds` signatures (multi-signature
    * = multi-probe recall boost). Same output shape as [[bruteForceTopK]];
    * a query with no bucket collisions returns fewer than k rows.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, dim: Int,
      k: Int = 10, nBits: Int = 8, seeds: Seq[Long] = Seq(42L, 1042L, 2042L),
      excludeSelf: Boolean = true): DataFrame = {
    // distinct bucket-key names per side: corpus and queries often derive
    // from the same plan, so c("bk")===q("bk") would resolve ambiguously.
    // All seeds' signatures come from ONE codegen'd pass over the vector
    // (native HyperplaneSigs), then posexplode to (seed, sig) bucket keys.
    def bucketed(df: DataFrame, id: String, v: String, bk: String): DataFrame =
      df.select(col(idCol).as(id), col(vecCol).as(v),
        posexplode(VectorFunctions.hyperplaneSignatures(col(vecCol), dim, nBits, seeds)))
        .select(col(id), col(v), struct(col("pos").as("s"), col("col").as("sig")).as(bk))

    val c = bucketed(corpus, "neighbor_id", "__cv", "bk")
    val q = broadcast(bucketed(queries, "query_id", "__qv", "qbk"))
    // cosine per bucket collision (codegen'd; ≤ |seeds| repeats per pair),
    // then scalar-only HashAggregate dedup — no vectors through the shuffle
    val cand = c.join(q, col("bk") === col("qbk"))
      .filter(if (excludeSelf) col("neighbor_id") =!= col("query_id") else lit(true))
      .select(col("query_id"), col("neighbor_id"),
        round(VectorFunctions.cosineFast(col("__qv"), col("__cv")), 4).as("cosine"))
      .groupBy("query_id", "neighbor_id").agg(first("cosine").as("cosine"))
    topKPerQuery(cand, k)
  }

  /** MMR (Maximal Marginal Relevance) diversity re-ranking: fetch
    * `fetch` exact-cosine candidates per query, then greedily re-rank to
    * `k` balancing relevance against similarity to what's already chosen
    * (`λ·rel − (1−λ)·max sim-to-selected`) — the standard redundancy
    * killer between retrieval and a context window.
    *
    * Scale contract: the greedy loop is the bounded per-query native
    * [[graft.functions.MmrRerank]] expression over the collected
    * candidate structs (≤ `fetch` rows each, vectors included via one
    * broadcast join of the tiny candidate table back to the corpus) — no
    * pairwise candidate join ever materializes, and the corpus
    * contributes exactly its top-k scan. Deterministic: ties break on
    * ascending id at every step. Output: (query_id, rank, neighbor_id,
    * mmr) with mmr rounded to 6.
    */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int = 5, fetch: Int = 20, lambda: Double = 0.5, dim: Int = -1,
      excludeSelf: Boolean = true): DataFrame = {
    val base = bruteForceTopK(corpus, queries, idCol, vecCol, k = fetch,
      excludeSelf = excludeSelf, dim = dim)
    val vecsD = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).cast("array<double>").as("__v"))
    val packed = broadcast(base).join(vecsD, "neighbor_id")
      .select(col("query_id"), struct(col("neighbor_id").as("id"),
        col("cosine").as("rel"), col("__v").as("vec")).as("__c"))
      .groupBy("query_id").agg(collect_list(col("__c")).as("__cs"))
    packed
      .select(col("query_id"), explode(GraftShims.toColumn(
        graft.functions.MmrRerank(GraftShims.toExpression(col("__cs")), k, lambda)))
        .as("__m"))
      .select(col("query_id"), col("__m.rank").as("rank"),
        col("__m.id").as("neighbor_id"), round(col("__m.mmr"), 6).as("mmr"))
  }

  /** Per-group embedding centroids (class prototypes, source fingerprints,
    * k-means seeding): mean vector per `labelCol` over rows whose vector
    * has exactly `dim` entries. Dimensions explode to scalar rows so the
    * aggregate is ONE map-side-combined hash agg of (label, dim) — 64·N
    * primitive rows, never whole vectors, cross the exchange — and the
    * result reassembles via `array_agg` sorted by dimension (grouped
    * collect over exactly `dim` pre-aggregated rows per label, bounded by
    * construction). Components round to 6 decimals so the float sum is
    * externally checkable. Output: (labelCol, n_vectors, centroid).
    */
  def centroids(df: DataFrame, labelCol: String, vecCol: String, dim: Int): DataFrame = {
    val gated = df.filter(size(col(vecCol)) === dim)
    val perDim = gated
      .select(col(labelCol), posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .groupBy(labelCol, "__d")
      .agg(round(avg(col("__x").cast("double")), 6).as("__m"),
        count(lit(1)).as("__n"))
    perDim
      .groupBy(labelCol)
      .agg(first(col("__n")).as("n_vectors"),
        array_sort(collect_list(struct(col("__d"), col("__m")))).as("__s"))
      .select(col(labelCol), col("n_vectors"),
        transform(col("__s"), e => e.getField("__m")).as("centroid"))
  }

  /** Evaluation harness for the approximate tiers: per-query recall@k of
    * an ANN result set against the exact one — the number you tune
    * nprobe/nBits/bands against before committing a 100 TB index layout.
    * Inputs are any two (query_id, neighbor_id, ...) result frames (the
    * `*TopK` outputs); rows beyond those two columns are ignored. Output:
    * (query_id, hits, recall) for every query present in `exact` —
    * a query the approximate method returned nothing for scores 0, it
    * does not silently vanish.
    *
    * Scale shape: both inputs are ALREADY top-k reductions (|queries|·k
    * rows), so the intersection join and the per-query count are
    * result-set-sized — nothing here touches the corpus.
    */
  def recallAtK(approx: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k > 0, s"recallAtK: k must be positive: $k")
    // distinct: "any two result frames" includes sets assembled by
    // unioning overlapping probes — a duplicated (query, neighbor) pair
    // must not double-count a hit (recall could exceed 1.0)
    val a = approx.select(col("query_id"), col("neighbor_id")).distinct()
    val e = exact.select(col("query_id"), col("neighbor_id")).distinct()
    val hits = a.join(e, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    e.select("query_id").distinct()
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        (coalesce(col("hits"), lit(0L)) / lit(k.toDouble)).as("recall"))
  }

  /** PCA over an embedding column — the dimensionality-reduction /
    * whitening preprocessor of an embedding pipeline (smaller ANN indexes,
    * decorrelated PQ subspaces). ONE covariance aggregation over the
    * corpus ([[graft.llm.Opq.covariance]]: a single O(dim²) driver row
    * with map-side partial combine), a deterministic driver-side Jacobi
    * eigensolve, top-`k` eigenvectors by descending eigenvalue. Signs are
    * fixed (each component's largest-|coordinate| entry made positive,
    * first index on ties) so training is bit-reproducible — eigenvectors
    * are otherwise only defined up to sign.
    *
    * Returns (mean, components as `k` rows × dim, eigenvalues) — the
    * "model" in the same pinned-codebook sense as PQ/OPQ: train once on a
    * sample, project 100 TB map-only with [[pcaProject]].
    */
  def pcaTrain(df: DataFrame, vecCol: String, dim: Int, k: Int)
      : (Array[Double], Array[Array[Double]], Array[Double]) = {
    require(k >= 1 && k <= dim, s"pcaTrain: need 1 <= k <= dim, got k=$k dim=$dim")
    val (mean, cov) = Opq.covariance(df, vecCol, dim)
    val (values, vectors) = Opq.jacobiEigen(cov)
    val top = values.indices.sortBy(i => -values(i)).take(k)
    val comps = top.map { i =>
      val v = vectors(i)
      var m = 0
      var j = 1
      while (j < v.length) { if (math.abs(v(j)) > math.abs(v(m))) m = j; j += 1 }
      if (v(m) < 0) v.map(-_) else v.clone()
    }.toArray
    (mean, comps, top.map(values).toArray)
  }

  /** Project vectors onto trained PCA components: map-only, fused into
    * the reading scan via the [[graft.functions.AffineProject]] native
    * expression (center + rectangular matrix product in one walk).
    * Output: (idCol, `pca` array<double> of length components.length).
    */
  def pcaProject(df: DataFrame, idCol: String, vecCol: String,
      mean: Array[Double], components: Array[Array[Double]]): DataFrame = {
    require(components.nonEmpty, "pcaProject: no components")
    val dim = mean.length
    require(components.forall(_.length == dim),
      s"pcaProject: component length != dim $dim")
    val flat = components.flatten
    df.select(col(idCol), GraftShims.toColumn(graft.functions.AffineProject(
      GraftShims.toExpression(col(vecCol)), mean, flat, components.length, dim))
      .as("pca"))
  }

  /** PCA-whitening projection matrix: each component scaled by
    * 1/√eigenvalue, so projected coordinates have UNIT variance — the
    * standard decorrelate-and-equalize preprocessor before cosine/L2
    * retrieval or product quantization (every subspace then carries
    * comparable energy). Components at or below `minVariance` are DROPPED
    * rather than amplified: a near-zero-variance direction is numerical
    * noise, and dividing by its √λ would explode it into the dominant
    * coordinate. Feed the result to [[pcaProject]].
    */
  def whiten(components: Array[Array[Double]], eigenvalues: Array[Double],
      minVariance: Double = 1e-9): Array[Array[Double]] = {
    require(components.length == eigenvalues.length,
      s"whiten: ${components.length} components vs ${eigenvalues.length} eigenvalues")
    components.zip(eigenvalues).collect {
      case (c, ev) if ev > minVariance =>
        val s = 1.0 / math.sqrt(ev)
        c.map(_ * s)
    }
  }
}
