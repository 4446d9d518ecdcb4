package graft

import org.apache.spark.sql.functions._

import graft.llm.Similarity

/** PCA training (one covariance pass + driver Jacobi) and the fused
  * center-and-project expression: orthonormality, variance ordering,
  * deterministic signs, projection laws, and a hand-checkable 2-D case.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  // 40 vectors in R^3 concentrated along (1, 1, 0)/√2 with small noise on
  // the second direction (-1, 1, 0)/√2 and none on z
  private lazy val vecs: Seq[Seq[Double]] = (0 until 40).map { i =>
    val t = (i - 20) / 4.0           // dominant coordinate
    val s = ((i * 7) % 5 - 2) / 10.0 // small orthogonal noise
    Seq(t - s, t + s, 3.0)           // constant z: zero variance there
  }
  private lazy val df = vecs.map(Tuple1(_)).toDF("v")
    .select(monotonically_increasing_id().as("id"), col("v"))

  test("pcaTrain: descending eigenvalues, orthonormal components, fixed signs") {
    val (mean, comps, values) = Similarity.pcaTrain(df, "v", dim = 3, k = 3)
    assert(math.abs(mean(2) - 3.0) < 1e-12)
    assert(values.length == 3 && values(0) >= values(1) && values(1) >= values(2))
    assert(values(2) < 1e-12) // the constant z direction carries nothing
    // orthonormal rows
    for (a <- comps; b <- comps) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val expect = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-9, s"dot=$dot")
    }
    // dominant direction ≈ ±(1,1,0)/√2 (the sample noise tilts it a hair)
    assert(math.abs(math.abs(comps(0)(0)) - math.sqrt(0.5)) < 0.02)
    assert(math.abs(math.abs(comps(0)(1)) - math.sqrt(0.5)) < 0.02)
    assert(comps(0).map(math.abs).max == comps(0).max) // sign fixed positive
    // the defining property, exactly: cov · v = λ · v for each pair
    val n = vecs.length
    val mu = Array.tabulate(3)(d => vecs.map(_(d)).sum / n)
    val cov = Array.tabulate(3, 3)((a, b) =>
      vecs.map(v => (v(a) - mu(a)) * (v(b) - mu(b))).sum / n)
    for ((v, lam) <- comps.zip(values); a <- 0 until 3) {
      val av = (0 until 3).map(b => cov(a)(b) * v(b)).sum
      assert(math.abs(av - lam * v(a)) < 1e-9, s"eigen residual at $a")
    }
  }

  test("pcaProject: per-component variance equals the eigenvalue; k=dim preserves distances") {
    val (mean, comps, values) = Similarity.pcaTrain(df, "v", dim = 3, k = 2)
    val proj = Similarity.pcaProject(df, "id", "v", mean, comps)
      .select(col("pca")).as[Seq[Double]].collect()
    assert(proj.forall(_.length == 2))
    for (c <- 0 until 2) {
      val xs = proj.map(_(c))
      val varc = xs.map(x => x * x).sum / xs.length - math.pow(xs.sum / xs.length, 2)
      assert(math.abs(varc - values(c)) < 1e-9, s"component $c: $varc vs ${values(c)}")
    }
    // full-rank projection is an isometry of centered vectors
    val (m3, c3, _) = Similarity.pcaTrain(df, "v", dim = 3, k = 3)
    val full = Similarity.pcaProject(df, "id", "v", m3, c3)
      .orderBy("id").select(col("pca")).as[Seq[Double]].collect()
    val orig = vecs
    def d2(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    for (i <- 0 until 5; j <- 5 until 10)
      assert(math.abs(d2(full(i), full(j)) - d2(orig(i), orig(j))) < 1e-9)
  }

  test("AffineProject: nulls and short vectors follow the RotateVector stance") {
    import org.apache.spark.sql.GraftShims
    val mean = Array(1.0, 2.0)
    val mat = Array(1.0, 0.0, 0.0, 1.0, 1.0, 1.0) // 3x2: identity rows + sum
    def proj(v: Seq[java.lang.Double]) =
      Seq(Tuple1(v)).toDF("v").select(GraftShims.toColumn(
        graft.functions.AffineProject(GraftShims.toExpression(col("v")),
          mean, mat, rows = 3, dim = 2)).as("p"))
        .select(col("p")).as[Option[Seq[Double]]].head()
    assert(proj(Seq(3.0, 5.0)) == Some(Seq(2.0, 3.0, 5.0)))
    assert(proj(Seq(3.0)) == Some(Seq(2.0, -2.0, 0.0))) // missing tail = 0.0
    assert(proj(Seq(3.0, null)) == None)
    val nullRow = Seq(Tuple1(Option.empty[Seq[Double]])).toDF("v")
      .select(GraftShims.toColumn(graft.functions.AffineProject(
        GraftShims.toExpression(col("v")), mean, mat, 3, 2)).as("p"))
      .select(col("p")).as[Option[Seq[Double]]].head()
    assert(nullRow == None)
  }

  test("whiten: unit variance per kept component; degenerate directions drop") {
    val (mean, comps, values) = Similarity.pcaTrain(df, "v", dim = 3, k = 3)
    val w = Similarity.whiten(comps, values)
    assert(w.length == 2, "the zero-variance z direction must drop, not explode")
    val proj = Similarity.pcaProject(df, "id", "v", mean, w)
      .select(col("pca")).as[Seq[Double]].collect()
    for (c <- 0 until 2) {
      val xs = proj.map(_(c))
      val varc = xs.map(x => x * x).sum / xs.length - math.pow(xs.sum / xs.length, 2)
      assert(math.abs(varc - 1.0) < 1e-9, s"whitened component $c variance $varc")
    }
  }

  test("pcaProject plan is map-only (no exchange)") {
    val (mean, comps, _) = Similarity.pcaTrain(df, "v", dim = 3, k = 2)
    val plan = Similarity.pcaProject(df, "id", "v", mean, comps)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
