package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PqExpressions, RotateVector}

/** OPQ — optimized product quantization (Ge et al. 2013, CVPR;
  * parametric/eigenvalue-allocation variant): rotate the space before PQ
  * so each of the quantizer's `m` INDEPENDENT subspaces receives a
  * balanced share of the corpus variance. Plain PQ quantizes whatever
  * dimension slices the storage order happens to put together; on
  * correlated/anisotropic embeddings (the usual case) some subspaces
  * then carry most of the energy and dominate the distortion. The
  * parametric OPQ fix: PCA-rotate, then deal the principal directions
  * round-robin-by-balance into the subspaces so the PRODUCTS of their
  * eigenvalues equalize (Ge et al. §4: balanced variance products
  * minimize the independence-assumption distortion bound).
  *
  * Scale shape (the 100 TB contract):
  *  - training reads the corpus ONCE: a single aggregate of
  *    `dim + dim·(dim+1)/2` sum expressions (map-side combined — ONE
  *    driver row regardless of corpus size) yields mean + covariance;
  *    the eigensolve is a driver-side Jacobi on the dim×dim matrix
  *    (microseconds at embedding dims, state = dim² doubles);
  *  - encode fuses rotation and code assignment into ONE map-only
  *    whole-stage-codegen'd scan ([[RotateVector]] then
  *    [[graft.functions.PqEncode]], both matrices riding as codegen
  *    reference objects — no matrix join, no shuffle);
  *  - search is [[Pq]]'s broadcast-LUT ADC unchanged — rotation is a
  *    per-row map on either side of it.
  */
object Opq {

  /** Deterministic seeded random orthonormal matrix — Gram-Schmidt over
    * splitmix64 entries ([[Pq.weight]]), the rotation OPQ initializes
    * from and the one the SQL oracle can inline verbatim (the
    * orthogonalization runs in plain Scala at both query- and
    * oracle-build time, so both engines hold the identical matrix).
    */
  def randomRotation(dim: Int, seed: Long = 17L): Array[Array[Double]] = {
    val a = Array.tabulate(dim, dim)((i, j) => Pq.weight(seed, i * dim + j))
    // modified Gram-Schmidt, deterministic order
    for (i <- 0 until dim) {
      for (k <- 0 until i) {
        var d = 0.0
        for (j <- 0 until dim) d += a(i)(j) * a(k)(j)
        for (j <- 0 until dim) a(i)(j) -= d * a(k)(j)
      }
      var n = 0.0
      for (j <- 0 until dim) n += a(i)(j) * a(i)(j)
      val inv = 1.0 / math.sqrt(n)
      for (j <- 0 until dim) a(i)(j) *= inv
    }
    a
  }

  /** Corpus mean and covariance in ONE aggregate job: `dim` sums plus the
    * `dim·(dim+1)/2` upper-triangle product sums — every expression is an
    * algebraic sum with map-side partial combine, so a single row of
    * `O(dim²)` doubles reaches the driver however large the corpus is
    * (the posexplode+groupBy formulation would shuffle |corpus|·dim²
    * rows to produce the same numbers).
    */
  def covariance(df: DataFrame, vecCol: String, dim: Int): (Array[Double], Array[Array[Double]]) = {
    import org.apache.spark.sql.GraftShims
    // ONE TypedImperativeAggregate holding [n, Σx_i, upper-triangle Σx_i·x_j]
    // in a flat buffer: the per-cell sum() formulation is 2 144 separate
    // aggregate expressions at dim 64 — past any JIT-friendly method size
    // (measured 9.0 s at sf0.1); the fused buffer loop is 0.1 s. The
    // aggregate itself enforces the exactly-dim / no-null-element row gate.
    val moments = GraftShims.toColumn(graft.functions.VecMomentsAgg(
      GraftShims.toExpression(col(vecCol).cast("array<double>")), dim)
      .toAggregateExpression())
    val r = df.agg(moments.as("m")).collect()(0).getSeq[Double](0)
    val n = r.head.toLong
    require(n > 1, s"covariance: need ≥2 vectors of dim $dim, got $n")
    val mean = Array.tabulate(dim)(i => r(1 + i) / n)
    val cov = Array.ofDim[Double](dim, dim)
    var off = 1 + dim
    for (i <- 0 until dim; j <- i until dim) {
      val c = r(off) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
      off += 1
    }
    (mean, cov)
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix — deterministic
    * sweep order, so training is bit-reproducible. Returns
    * (eigenvalues, eigenvectors as ROWS), unsorted.
    */
  private[graft] def jacobiEigen(mIn: Array[Array[Double]], sweeps: Int = 16)
      : (Array[Double], Array[Array[Double]]) = {
    val n = mIn.length
    val a = mIn.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (_ <- 0 until sweeps) {
      var offDiag = 0.0
      for (p <- 0 until n; q <- p + 1 until n) offDiag += a(p)(q) * a(p)(q)
      if (offDiag > 1e-22) {
        for (p <- 0 until n; q <- p + 1 until n) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            // NOT math.signum: signum(0) = 0 would zero the rotation whenever
            // two diagonal entries are exactly equal (standardized or
            // duplicated dimensions) and the off-diagonal element would
            // never be eliminated — the Numerical Recipes convention treats
            // theta = 0 as +1
            val sgn = if (theta >= 0.0) 1.0 else -1.0
            val t = sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            for (k <- 0 until n) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
            }
            for (k <- 0 until n) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
            }
            for (k <- 0 until n) {
              val vpk = v(p)(k); val vqk = v(q)(k)
              v(p)(k) = c * vpk - s * vqk
              v(q)(k) = s * vpk + c * vqk
            }
          }
        }
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** Eigenvalue allocation (Ge et al. §4.1): deal eigen-directions, in
    * descending eigenvalue order, to the `m` subspaces, each direction to
    * the open bucket with the smallest current log-eigenvalue product —
    * balancing the products balances the per-subspace quantization
    * difficulty. Returns the rotation whose row block `j·dsub..` holds
    * subspace j's directions.
    */
  private[graft] def allocate(values: Array[Double], vectors: Array[Array[Double]],
      m: Int): Array[Array[Double]] = {
    val dim = values.length
    require(dim % m == 0, s"allocate: dim=$dim not divisible by m=$m")
    val dsub = dim / m
    val order = values.indices.sortBy(i => -values(i))
    val logProd = Array.fill(m)(0.0)
    val buckets = Array.fill(m)(List.empty[Int])
    for (ix <- order) {
      val open = (0 until m).filter(b => buckets(b).length < dsub)
      val best = open.minBy(b => (logProd(b), b))
      buckets(best) ::= ix
      logProd(best) += math.log(math.max(values(ix), 1e-300))
    }
    val rows = buckets.flatMap(_.reverse.map(vectors))
    rows
  }

  /** Train the parametric OPQ rotation: one covariance pass, driver-side
    * eigensolve, eigenvalue allocation. Rows are orthonormal (product of
    * orthonormal eigenvectors and a permutation), so rotated distances
    * equal raw distances and PQ semantics are unchanged.
    */
  def trainRotation(corpus: DataFrame, vecCol: String, dim: Int, m: Int)
      : Array[Array[Double]] = {
    val (_, cov) = covariance(corpus, vecCol, dim)
    val (values, vectors) = jacobiEigen(cov)
    allocate(values, vectors, m)
  }

  /** Rotation + PQ training in two corpus passes total (one for the
    * covariance, then [[Pq.train]]'s bounded-state Lloyd loop over the
    * rotated view — rotation stays inside the scan, never materialized).
    */
  def train(corpus: DataFrame, vecCol: String, dim: Int, m: Int = 8, ksub: Int = 16,
      iters: Int = 2): (Array[Array[Double]], Pq.PqModel) = {
    val r = trainRotation(corpus, vecCol, dim, m)
    val rotated = corpus.select(RotateVector(col(vecCol), r).as("__r"))
    (r, Pq.train(rotated, "__r", dim, m, ksub, iters))
  }

  /** The compressed corpus: (idCol, pq_codes) — rotation and encode fused
    * in ONE map-only codegen'd scan.
    */
  def encode(df: DataFrame, idCol: String, vecCol: String, rotation: Array[Array[Double]],
      model: Pq.PqModel): DataFrame =
    df.select(col(idCol),
      PqExpressions.encode(RotateVector(col(vecCol), rotation),
        model.codebooks, model.m, model.ksub, model.dsub).as("pq_codes"))

  /** ADC top-k in the rotated space — [[Pq.adcTopK]]'s broadcast-LUT
    * shape with the rotation applied per row on both sides (orthonormal
    * R preserves L2, so the ADC approximates the same true distances).
    */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      rotation: Array[Array[Double]], model: Pq.PqModel, k: Int = 10,
      excludeSelf: Boolean = true): DataFrame = {
    def rot(df: DataFrame): DataFrame =
      df.select(col(idCol), RotateVector(col(vecCol), rotation).as("__rv"))
    Pq.adcTopK(rot(corpus), rot(queries), idCol, "__rv", model, k, excludeSelf)
  }

  /** Search a PRE-ENCODED OPQ code table (the [[encode]] output stored at
    * rest): only the broadcast query side rotates and builds LUTs — the
    * stored codes already live in the rotated space, so the scan is
    * [[Pq.adcTopKEncoded]] verbatim. Completes the at-rest symmetry with
    * the PQ/IVF-PQ/int8/binary tiers.
    */
  def adcTopKEncoded(encoded: DataFrame, queries: DataFrame, encIdCol: String,
      idCol: String, vecCol: String, rotation: Array[Array[Double]],
      model: Pq.PqModel, k: Int = 10, excludeSelf: Boolean = true): DataFrame =
    Pq.adcTopKEncoded(encoded,
      queries.select(col(idCol), RotateVector(col(vecCol), rotation).as("__rv")),
      encIdCol, idCol, "__rv", model, k, excludeSelf)
}
