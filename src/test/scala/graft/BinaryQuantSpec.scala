package graft

import org.apache.spark.sql.functions._

import graft.functions.{HammingDistance, SignPack}
import graft.llm.Quantize

/** 1-bit sign quantization + Hamming ANN: pack vs a scalar reference,
  * Hamming vs sign-disagreement count, codegen/interpreted parity,
  * null/mismatch semantics, the brute-force equivalence anchor, and the
  * zero-corpus-shuffle plan contract.
  */
class BinaryQuantSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Graft.table(spark, sf, "embeddings")
  private val dim = 64

  /** Reference pack in plain Scala. */
  private def refPack(v: Array[Double]): Array[Long] = {
    val out = new Array[Long]((v.length + 63) / 64)
    for (i <- v.indices if v(i) > 0.0) out(i >> 6) |= 1L << (i & 63)
    out
  }

  test("sign pack matches the scalar reference on real embeddings") {
    val rows = Quantize.binaryEncode(emb.limit(50), "vec_id", "embedding", dim)
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
        "vec_id")
      .collect()
    assert(rows.length == 50)
    for (r <- rows) {
      val got = r.getSeq[Long](r.fieldIndex("bin_code")).toArray
      val want = refPack(r.getSeq[Double](r.fieldIndex("v")).toArray)
      assert(got.sameElements(want), s"vec ${r.getLong(0)}: ${got.toSeq} vs ${want.toSeq}")
    }
  }

  test("Hamming distance equals the count of sign-disagreeing dimensions") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    val pairs = Seq.tabulate(100) { _ =>
      (Array.fill(130)(rnd.nextDouble() * 2 - 1), Array.fill(130)(rnd.nextDouble() * 2 - 1))
    }
    val got = pairs.toDF("a", "b")
      .select(HammingDistance(SignPack(col("a")), SignPack(col("b"))))
      .collect().map(_.getInt(0))
    val want = pairs.map { case (a, b) =>
      a.zip(b).count { case (x, y) => (x > 0.0) != (y > 0.0) }
    }
    assert(got.toSeq == want)
  }

  test("codegen == interpreted on adversarial doubles (NaN, ±Inf, ±0, subnormals)") {
    // sign boundary contract: NaN > 0 is false (quantizes to 0), -0.0 and
    // +0.0 both quantize to 0 (strictly-positive test), +Inf to 1 — and
    // the generated Java states the identical comparison
    import spark.implicits._
    val specials = Array(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      Double.MinPositiveValue, -Double.MinPositiveValue, -0.0, 0.0, 1e-300, -1e-300)
    val rnd = new scala.util.Random(42L)
    val vecs = Seq.tabulate(200) { _ =>
      Array.tabulate(70)(_ =>
        if (rnd.nextInt(3) == 0) specials(rnd.nextInt(specials.length))
        else rnd.nextDouble() * 2 - 1)
    }
    val df = vecs.toDF("v")
    def run(): Seq[Seq[Long]] =
      df.select(SignPack(col("v"))).collect().map(_.getSeq[Long](0)).toSeq
    val gen = run()
    val interp = withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")(run())
    assert(gen == interp, "codegen and interpreted paths diverged")
    // cross-check bit 0 semantics on the specials directly
    val one = Seq(Tuple1(Array(Double.NaN)), Tuple1(Array(0.0)), Tuple1(Array(-0.0)),
      Tuple1(Array(Double.PositiveInfinity)), Tuple1(Array(Double.MinPositiveValue)))
      .toDF("v").select(SignPack(col("v"))).collect().map(_.getSeq[Long](0).head)
    assert(one.toSeq == Seq(0L, 0L, 0L, 1L, 1L))
  }

  test("null element nulls the code; word-length mismatch nulls the distance") {
    import spark.implicits._
    val df = Seq((Seq[java.lang.Double](1.0, null, 2.0), Seq(1L, 2L), Seq(1L)))
      .toDF("v", "a", "b")
    val r = df.select(SignPack(col("v")).as("p"),
      HammingDistance(col("a"), col("b")).as("h")).head()
    assert(r.isNullAt(0), "null element must null the packed code")
    assert(r.isNullAt(1), "word-length mismatch must null the distance")
  }

  test("hammingTopK with rerank = corpus equals bruteForceTopK bit-for-bit") {
    // stage 2 is the shared exact rescore, so when the Hamming cut keeps
    // everything the two operators must coincide — including rounded
    // cosines and tie order
    val corpus = emb.filter(size(col("embedding")) === dim)
    val queries = corpus.filter(col("vec_id") < 4)
    val n = corpus.count().toInt
    val got = Quantize.hammingTopK(emb, queries, "vec_id", "embedding", dim,
        k = 5, rerank = n)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val want = graft.llm.Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding",
        k = 5, dim = dim)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("searching a parquet-stored sign-code table equals direct search (at-rest contract)") {
    val queries = emb.filter(col("vec_id") < 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-bin-store").toFile
    try {
      Quantize.binaryEncode(emb, "vec_id", "embedding", dim)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
      val stored = spark.read.parquet(dir.getAbsolutePath)
      val got = Quantize.hammingTopKEncoded(stored, emb, queries, "vec_id", "embedding",
          dim, k = 5, rerank = 100)
        .orderBy("query_id", "rank").collect().map(_.toSeq)
      val want = Quantize.hammingTopK(emb, queries, "vec_id", "embedding", dim,
          k = 5, rerank = 100)
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

  test("hammingTopK recall: rerank=100 recovers the exact top-5 on this corpus") {
    // the production recall/cost dial at the coarsest tier: 64 sign bits
    // rank the true top-5 inside the top-100 of this 500-vector corpus
    // (measured: top-50 catches only 11/20 — 1-bit codes are noisier than
    // int8's top-50, which is exactly the compression trade)
    val corpus = emb.filter(size(col("embedding")) === dim)
    val queries = corpus.filter(col("vec_id") < 4)
    val got = Quantize.hammingTopK(emb, queries, "vec_id", "embedding", dim,
        k = 5, rerank = 100)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val want = graft.llm.Similarity.bruteForceTopK(corpus, queries, "vec_id", "embedding",
        k = 5, dim = dim)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(got.toSeq == want.toSeq)
  }

  test("hammingTopK plan: zero corpus shuffles, codegen'd pack + popcount scan") {
    val df = Quantize.hammingTopK(emb, emb.limit(3), "vec_id", "embedding", dim,
      k = 3, rerank = 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("collect_top_k") && !p.contains("Window"), p)
    assert(p.contains("BroadcastHashJoin"),
      s"candidate ids must broadcast back over the corpus:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"no corpus row may shuffle for a join:\n$p")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("sign_pack")),
      s"pack scan fell out of whole-stage codegen:\n$p")
    assert(p.contains("hamming_distance"), p)
  }
}
