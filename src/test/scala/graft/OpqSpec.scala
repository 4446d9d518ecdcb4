package graft

import org.apache.spark.sql.functions._

import graft.functions.{PqExpressions, RotateVector}
import graft.llm.{Opq, Pq}

/** OPQ: rotation orthonormality and distance preservation, the Jacobi
  * eigensolver and eigenvalue-allocation algorithms on crafted inputs,
  * covariance exactness, fused plan shape, and trained-index behavior.
  * Note the honest scope: on this near-isotropic synthetic corpus OPQ's
  * distortion ≈ flat PQ (±2%, asserted as a sanity band) — the rotation
  * pays on correlated real-world embeddings (Ge et al. 2013 §5); what
  * must ALWAYS hold, and is pinned here, is that rotation never hurts
  * correctness: orthonormal R preserves the geometry PQ quantizes.
  */
class OpqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Graft.table(spark, sf, "embeddings")
  private val dim = 64

  private def orthonormalityErr(r: Array[Array[Double]]): Double =
    (for (i <- r.indices; j <- r.indices) yield {
      var s = 0.0
      for (k <- r.indices) s += r(i)(k) * r(j)(k)
      math.abs(s - (if (i == j) 1.0 else 0.0))
    }).max

  test("randomRotation and trainRotation are orthonormal") {
    assert(orthonormalityErr(Opq.randomRotation(dim)) < 1e-9)
    assert(orthonormalityErr(Opq.trainRotation(emb, "embedding", dim, m = 4)) < 1e-9)
  }

  test("rotation preserves pairwise L2 distances (the property PQ quantizes)") {
    val r = Opq.trainRotation(emb, "embedding", dim, m = 4)
    val rows = emb.limit(20).select(col("embedding").cast("array<double>").as("v"),
        RotateVector(col("embedding"), r).as("rv"))
      .collect().map(x => (x.getSeq[Double](0), x.getSeq[Double](1)))
    for (((v1, r1), i) <- rows.zipWithIndex; (v2, r2) <- rows.drop(i + 1)) {
      def d2(a: Seq[Double], b: Seq[Double]) =
        a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
      assert(math.abs(d2(v1, v2) - d2(r1, r2)) < 1e-9)
    }
  }

  test("jacobiEigen recovers eigenpairs: A·v = λ·v on the real covariance") {
    val (_, cov) = Opq.covariance(emb, "embedding", dim)
    val (values, vectors) = Opq.jacobiEigen(cov)
    for (ix <- 0 until dim) {
      val v = vectors(ix)
      for (i <- 0 until dim) {
        var av = 0.0
        for (j <- 0 until dim) av += cov(i)(j) * v(j)
        assert(math.abs(av - values(ix) * v(i)) < 1e-9,
          s"eigenpair $ix fails A·v=λ·v at row $i")
      }
    }
    // trace is preserved: Σλ = Σ diag(cov)
    assert(math.abs(values.sum - (0 until dim).map(i => cov(i)(i)).sum) < 1e-9)
  }

  test("jacobiEigen handles exactly-equal diagonal entries (theta = 0 pivot)") {
    // signum(0) = 0 would degenerate the rotation to the identity and the
    // off-diagonal element would never be eliminated — [[1,.5],[.5,1]]
    // has eigenvalues (0.5, 1.5), not (1, 1)
    val (values, vectors) = Opq.jacobiEigen(
      Array(Array(1.0, 0.5), Array(0.5, 1.0)))
    assert(values.sorted.zip(Seq(0.5, 1.5)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
      s"eigenvalues ${values.toSeq}")
    // and the eigenvectors actually diagonalize: A·v = λ·v
    for (i <- 0 until 2) {
      val av = Array.tabulate(2)(r => 1.0 * vectors(i)(r) + 0.5 * vectors(i)(1 - r))
      assert((0 until 2).forall(r => math.abs(av(r) - values(i) * vectors(i)(r)) < 1e-12))
    }
  }

  test("eigenvalue allocation balances subspace products (crafted spectrum)") {
    // eigenvalues 2^10..2^-9: consecutive slicing puts all the energy in
    // subspace 0; balanced dealing must shrink the product spread
    val values = Array.tabulate(16)(i => math.pow(2.0, 10 - i))
    val vectors = Array.tabulate(16, 16)((i, j) => if (i == j) 1.0 else 0.0)
    val m = 4
    val r = Opq.allocate(values, vectors, m)
    // each row of r is an axis vector — recover which eigen index went where
    def bucketLogProducts(rows: Array[Array[Double]]): Seq[Double] =
      rows.grouped(4).map(_.map(row => math.log(values(row.indexWhere(_ == 1.0)))).sum).toSeq
    val balanced = bucketLogProducts(r)
    val consecutive = bucketLogProducts(vectors)
    def spread(x: Seq[Double]) = x.max - x.min
    assert(spread(balanced) < spread(consecutive) * 0.2,
      s"allocation spread ${spread(balanced)} not far below consecutive ${spread(consecutive)}")
    assert(r.length == 16 && orthonormalityErr(r) < 1e-12)
  }

  test("covariance matches the driver-side computation exactly") {
    val (mean, cov) = Opq.covariance(emb.limit(100), "embedding", dim)
    val vs = emb.limit(100).select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0).toArray)
    val n = vs.length
    for (i <- 0 until dim) {
      val mi = vs.map(_(i)).sum / n
      assert(math.abs(mean(i) - mi) < 1e-12)
      for (j <- i until dim) {
        val mj = vs.map(_(j)).sum / n
        val cij = vs.map(v => v(i) * v(j)).sum / n - mi * mj
        assert(math.abs(cov(i)(j) - cij) < 1e-10, s"cov($i,$j)")
      }
    }
  }

  test("trained OPQ distortion is within a few percent of flat PQ on isotropic data") {
    // this corpus is near-isotropic (eigen spread 4x over 64 dims, weak
    // correlations), so rotation neither helps nor hurts much — the band
    // pins "never hurts correctness-relevant amounts"; gains appear on
    // anisotropic real-world embeddings
    def distortion(df: org.apache.spark.sql.DataFrame, vc: String, mo: Pq.PqModel): Double = {
      val rows = df.select(col(vc).cast("array<double>").as("v"),
          PqExpressions.encode(col(vc), mo.codebooks, mo.m, mo.ksub, mo.dsub).as("codes"))
        .collect()
      rows.map { row =>
        val v = row.getSeq[Double](0); val codes = row.getSeq[Int](1)
        var s = 0.0
        for (j <- 0 until mo.m; d <- 0 until mo.dsub) {
          val diff = v(j * mo.dsub + d) - mo.codebooks((j * mo.ksub + codes(j)) * mo.dsub + d)
          s += diff * diff
        }
        s
      }.sum / rows.length
    }
    val flat = Pq.train(emb, "embedding", dim, m = 4, ksub = 8, iters = 2)
    val dFlat = distortion(emb.select(col("embedding").cast("array<double>").as("v")), "v", flat)
    val (rot, opqModel) = Opq.train(emb, "embedding", dim, m = 4, ksub = 8, iters = 2)
    val dOpq = distortion(emb.select(RotateVector(col("embedding"), rot).as("v")), "v", opqModel)
    assert(dOpq / dFlat > 0.9 && dOpq / dFlat < 1.05,
      s"opq/flat distortion ratio ${dOpq / dFlat} outside the isotropic-corpus band")
  }

  test("adcTopK under a trained rotation ranks planted exact duplicates at the top") {
    val planted = emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val (rot, model) = Opq.train(emb, "embedding", dim, m = 4, ksub = 8, iters = 2)
    val hits = Opq.adcTopK(corpus, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        rot, model, k = 2)
      .filter(col("neighbor_id") === col("query_id") + 100000)
      .count()
    assert(hits >= 8, s"expected ≥8/10 planted duplicates in top-2, got $hits")
  }

  test("searching a parquet-stored OPQ code table equals direct search (at-rest contract)") {
    val r = Opq.randomRotation(dim)
    val model = Pq.deterministicModel(m = 4, ksub = 8, dsub = 16, seed = 7L, scale = 0.125)
    val queries = emb.filter(col("vec_id") < 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-opq-store").toFile
    try {
      Opq.encode(emb, "vec_id", "embedding", r, model)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val stored = spark.read.parquet(dir.getAbsolutePath)
      val got = Opq.adcTopKEncoded(stored, queries, "vec_id", "vec_id", "embedding",
          r, model, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
      val want = Opq.adcTopK(emb, queries, "vec_id", "embedding", r, model, k = 5)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
      assert(got.toSeq == want.toSeq)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
        f.delete()
      }
      rm(dir)
    }
  }

  test("plan shape: rotation and encode fuse into one map-only codegen stage") {
    val r = Opq.randomRotation(dim)
    val model = Pq.deterministicModel(m = 4, ksub = 8, dsub = 16, seed = 7L, scale = 0.125)
    val df = Opq.encode(emb, "vec_id", "embedding", r, model)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("rotate_vector")
      && l.contains("pq_encode")),
      s"rotation and encode must share one whole-stage-codegen projection:\n$p")
    assert(!p.contains("Exchange") && !p.contains("Join"), s"encode must be map-only:\n$p")
  }
}
