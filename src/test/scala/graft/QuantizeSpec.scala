package graft

import org.apache.spark.sql.functions._

import graft.functions.AffineQuantize
import graft.llm.Quantize

/** Scalar int8 affine quantization: encode vs a scalar reference,
  * reconstruction-error bound, the [−127,127] clamp on out-of-range
  * inputs (codegen AND interpreted), empty-corpus fail-fast, null/short
  * vector semantics, and the codegen plan-shape contract.
  */
class QuantizeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Graft.table(spark, sf, "embeddings")
  private val dim = 64

  private lazy val (mins, maxs) = Quantize.int8Stats(emb, "embedding", dim)

  /** Reference implementation in plain Scala on collected rows. */
  private def refEncode(v: Array[Double]): Array[Int] =
    Array.tabulate(math.min(v.length, mins.length)) { i =>
      if (maxs(i) == mins(i)) 0
      else {
        val y = math.floor((v(i) - mins(i)) * 254.0 / (maxs(i) - mins(i)) + 0.5) - 127.0
        if (y < -127.0) -127 else if (y > 127.0) 127 else y.toInt
      }
    }

  test("encode matches the scalar reference on real embeddings") {
    val rows = Quantize.int8Encode(emb.limit(50), "vec_id", "embedding", mins, maxs)
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
        "vec_id")
      .collect()
    assert(rows.length == 50)
    for (r <- rows) {
      val got = r.getSeq[Int](r.fieldIndex("int8_codes")).toArray
      val want = refEncode(r.getSeq[Double](r.fieldIndex("v")).toArray)
      assert(got.sameElements(want), s"vec ${r.getLong(0)}: ${got.toSeq} vs ${want.toSeq}")
    }
  }

  test("corpus codes all land in [-127, 127] and use the range's extremes") {
    val codes = Quantize.int8Encode(emb, "vec_id", "embedding", mins, maxs)
      .select(explode(col("int8_codes")).as("c"))
    val r = codes.agg(min(col("c")), max(col("c"))).head()
    assert(r.getInt(0) == -127, s"corpus min code ${r.getInt(0)} — the dimension minima " +
      "should encode exactly -127")
    assert(r.getInt(1) == 127, s"corpus max code ${r.getInt(1)}")
  }

  test("reconstruction error is bounded by half a step per dimension") {
    val rows = emb.select(col("embedding").cast("array<double>").as("v"),
        Quantize.int8Reconstruct(
          AffineQuantize(col("embedding"), mins, maxs), mins, maxs).as("xhat"))
      .collect()
    for (r <- rows) {
      val v = r.getSeq[Double](0)
      val xhat = r.getSeq[Double](1)
      for (i <- v.indices) {
        val halfStep = (maxs(i) - mins(i)) / 254.0 / 2.0
        // + epsilon: the bound itself is attained at cell midpoints and
        // the reconstruction arithmetic reassociates at ~1e-16
        assert(math.abs(v(i) - xhat(i)) <= halfStep + 1e-12,
          s"dim $i: |${v(i)} - ${xhat(i)}| > half step $halfStep")
      }
    }
  }

  test("out-of-range inputs clamp to [-127, 127] on codegen and interpreted paths") {
    import spark.implicits._
    // values far outside the corpus ranges, including extremes that would
    // overflow an int cast (and wrap sign) without the double-space clamp
    val df = Seq((
      Array.fill(dim)(1e6), Array.fill(dim)(-1e6),
      Array.fill(dim)(1e300), Array.fill(dim)(-1e300),
    )).toDF("hi", "lo", "inf", "ninf")
    def check(): Unit = {
      val r = df.select(
        AffineQuantize(col("hi"), mins, maxs).as("hi"),
        AffineQuantize(col("lo"), mins, maxs).as("lo"),
        AffineQuantize(col("inf"), mins, maxs).as("inf"),
        AffineQuantize(col("ninf"), mins, maxs).as("ninf")).head()
      assert(r.getSeq[Int](0).forall(_ == 127), s"hi: ${r.getSeq[Int](0)}")
      assert(r.getSeq[Int](1).forall(_ == -127), s"lo: ${r.getSeq[Int](1)}")
      assert(r.getSeq[Int](2).forall(_ == 127), s"1e300: ${r.getSeq[Int](2)}")
      assert(r.getSeq[Int](3).forall(_ == -127), s"-1e300: ${r.getSeq[Int](3)}")
    }
    check()
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(check())
  }

  test("a slightly-out-of-range query vector still quantizes monotonically") {
    import spark.implicits._
    // min - step vs min: the former clamps to -127, the latter encodes -127
    // too — saturation, not wraparound, at the boundary
    val step0 = (maxs(0) - mins(0)) / 254.0
    val df = Seq((Array(mins(0) - step0), Array(mins(0)), Array(maxs(0) + step0)))
      .toDF("below", "atMin", "above")
    val r = df.select(
      AffineQuantize(col("below"), mins, maxs).as("b"),
      AffineQuantize(col("atMin"), mins, maxs).as("m"),
      AffineQuantize(col("above"), mins, maxs).as("a")).head()
    assert(r.getSeq[Int](0).head == -127)
    assert(r.getSeq[Int](1).head == -127)
    assert(r.getSeq[Int](2).head == 127)
  }

  test("int8Stats fails loud on an empty corpus") {
    val e = intercept[IllegalArgumentException] {
      Quantize.int8Stats(emb.filter(col("vec_id") < 0), "embedding", dim)
    }
    assert(e.getMessage.contains("empty corpus"), e.getMessage)
    // wrong-dim gate has the same failure mode: no vectors survive
    val e2 = intercept[IllegalArgumentException] {
      Quantize.int8Stats(emb, "embedding", dim + 1)
    }
    assert(e2.getMessage.contains("empty corpus"), e2.getMessage)
  }

  test("null vector -> null; null element -> null; short vector encodes its dims") {
    val df = spark.sql(
      """SELECT CAST(NULL AS ARRAY<DOUBLE>) AS nv,
                array(1.0D, NULL) AS ne,
                array(0.5D, -0.5D) AS short""")
    val r = df.select(
      AffineQuantize(col("nv"), mins, maxs).as("a"),
      AffineQuantize(col("ne"), mins, maxs).as("b"),
      AffineQuantize(col("short"), mins, maxs).as("c")).head()
    assert(r.isNullAt(0))
    assert(r.isNullAt(1))
    assert(r.getSeq[Int](2).length == 2)
  }

  test("round-trip int8Reconstruct stays inside the corpus range") {
    val rows = emb.limit(20).select(
      Quantize.int8Reconstruct(
        AffineQuantize(col("embedding"), mins, maxs), mins, maxs).as("xhat"))
      .collect()
    for (r <- rows; (x, i) <- r.getSeq[Double](0).zipWithIndex) {
      assert(x >= mins(i) - 1e-12 && x <= maxs(i) + 1e-12,
        s"dim $i reconstructed $x outside [${mins(i)}, ${maxs(i)}]")
    }
  }

  test("int8TopK with rerank = corpus equals bruteForceTopK bit-for-bit") {
    // stage 2 uses bruteForceTopK's exact staged-norm formula, so when the
    // candidate cut keeps everything the two operators must coincide —
    // including rounded cosines and tie order
    val queries = emb.filter(col("vec_id") < 4)
    val n = emb.count().toInt
    val got = graft.llm.Quantize.int8TopK(emb, queries, "vec_id", "embedding",
        mins, maxs, k = 5, rerank = n)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val want = graft.llm.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("searching a parquet-stored code table equals direct search (at-rest contract)") {
    val queries = emb.filter(col("vec_id") < 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-int8-store").toFile
    try {
      Quantize.int8Encode(emb, "vec_id", "embedding", mins, maxs)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val stored = spark.read.parquet(dir.getAbsolutePath)
      val got = Quantize.int8TopKEncoded(stored, emb, queries, "vec_id", "embedding",
          mins, maxs, k = 5, rerank = 50)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
      val want = Quantize.int8TopK(emb, queries, "vec_id", "embedding",
          mins, maxs, k = 5, rerank = 50)
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

  test("int8TopK recall: a modest rerank recovers the exact top-5 on this corpus") {
    // int8 cosine error per pair is ~1e-3; the exact top-5 sit well inside
    // the top-50 approximate candidates, so the two-stage result equals
    // brute force here (the production recall/cost dial, exercised)
    val queries = emb.filter(col("vec_id") < 4)
    val got = graft.llm.Quantize.int8TopK(emb, queries, "vec_id", "embedding",
        mins, maxs, k = 5, rerank = 50)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val want = graft.llm.Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("int8TopK plan: zero corpus shuffles — broadcast joins and bounded top-k only") {
    val df = graft.llm.Quantize.int8TopK(emb, emb.limit(3), "vec_id", "embedding",
      mins, maxs, k = 3, rerank = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("collect_top_k") && !p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"candidate ids must broadcast back over the corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus row may shuffle for a join:\n$p")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("affine_quantize")),
      s"code scan fell out of whole-stage codegen:\n$p")
  }

  test("property: codegen == interpreted on adversarial doubles (NaN, ±Inf, subnormals)") {
    // the clamp's contract must hold pathwise-identically: the generated
    // Java and nullSafeEval state the same op sequence, including the
    // specials — NaN falls through both clamp comparisons to (int) NaN == 0,
    // ±Inf saturate, subnormals/extremes can't wrap the int cast
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    val specials = Array(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MaxValue, Double.MinValue, Double.MinPositiveValue, -0.0, 0.0, 1e308, -1e308)
    val vecs = Seq.tabulate(200) { _ =>
      Array.tabulate(dim) { i =>
        if (rnd.nextInt(10) == 0) specials(rnd.nextInt(specials.length))
        else mins(i) + (rnd.nextDouble() * 3.0 - 1.0) * (maxs(i) - mins(i))
      }
    }
    val df = vecs.toDF("v")
    def run(): Seq[Seq[Int]] = df.select(AffineQuantize(col("v"), mins, maxs))
      .collect().map(_.getSeq[Int](0)).toSeq
    val gen = run()
    val interp = withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(run())
    assert(gen == interp, "codegen and interpreted paths diverged")
    for (codes <- gen; c <- codes) assert(c >= -127 && c <= 127, s"code $c escaped int8")
  }

  test("plan shape: encode is one map-only codegen'd scan, no join, no shuffle") {
    val df = Quantize.int8Encode(emb, "vec_id", "embedding", mins, maxs)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("affine_quantize")),
      s"affine_quantize fell out of whole-stage codegen:\n$p")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"encode scan should be map-only:\n$p")
  }

}
