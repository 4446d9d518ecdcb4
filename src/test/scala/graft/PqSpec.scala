package graft

import org.apache.spark.sql.functions._

import graft.llm.Pq
import graft.functions.PqExpressions

/** Product quantization: encode argmin correctness, LUT/ADC consistency,
  * training distortion, determinism, and the plan-shape contract.
  */
class PqSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val emb = graft.core.Graft.table(spark, sf, "embeddings")

  private val m = 4
  private val ksub = 8
  private val dsub = 16
  private lazy val model = Pq.deterministicModel(m, ksub, dsub, seed = 7L)

  /** Reference implementation in plain Scala, computed on collected rows. */
  private def refEncode(v: Array[Double], mo: Pq.PqModel): Array[Int] =
    Array.tabulate(mo.m) { j =>
      var best = 0
      var bestDist = Double.MaxValue
      for (c <- 0 until mo.ksub) {
        val off = (j * mo.ksub + c) * mo.dsub
        var s = 0.0
        for (d <- 0 until mo.dsub) {
          val gi = j * mo.dsub + d
          val x = if (gi < v.length) v(gi) else 0.0
          val diff = x - mo.codebooks(off + d)
          s += diff * diff
        }
        if (s < bestDist) { best = c; bestDist = s }
      }
      best
    }

  test("encode matches the scalar argmin reference on real embeddings") {
    val rows = Pq.encode(emb.limit(50), "vec_id", "embedding", model)
      .join(emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v")),
        "vec_id")
      .collect()
    assert(rows.length == 50)
    for (r <- rows) {
      val got = r.getSeq[Int](r.fieldIndex("pq_codes")).toArray
      val want = refEncode(r.getSeq[Double](r.fieldIndex("v")).toArray, model)
      assert(got.sameElements(want), s"vec ${r.getLong(0)}: ${got.toSeq} vs ${want.toSeq}")
    }
  }

  test("adc(codes(x), lut(q)) equals the reconstructed squared L2 distance") {
    val df = emb.limit(10).select(col("vec_id"),
      col("embedding").cast("array<double>").as("v"),
      PqExpressions.encode(col("embedding"), model.codebooks, m, ksub, dsub).as("codes"),
      PqExpressions.lut(col("embedding"), model.codebooks, m, ksub, dsub).as("lut"))
    val rows = df.crossJoin(df.select(col("codes").as("codes2"),
        col("vec_id").as("id2")))
      .select(col("vec_id"), col("id2"), col("v"), col("codes2"),
        PqExpressions.adc(col("codes2"), col("lut"), ksub).as("adc"))
      .collect()
    for (r <- rows) {
      val q = r.getSeq[Double](r.fieldIndex("v")).toArray
      val codes = r.getSeq[Int](r.fieldIndex("codes2")).toArray
      var want = 0.0
      for (j <- 0 until m; d <- 0 until dsub) {
        val diff = q(j * dsub + d) - model.codebooks((j * ksub + codes(j)) * dsub + d)
        want += diff * diff
      }
      assert(math.abs(r.getDouble(r.fieldIndex("adc")) - want) < 1e-9)
    }
  }

  test("training lowers quantization distortion over the deterministic start") {
    def distortion(mo: Pq.PqModel): Double = {
      val rows = emb.select(col("embedding").cast("array<double>").as("v"),
          PqExpressions.encode(col("embedding"), mo.codebooks, mo.m, mo.ksub, mo.dsub)
            .as("codes"))
        .collect()
      rows.map { r =>
        val v = r.getSeq[Double](0).toArray
        val codes = r.getSeq[Int](1).toArray
        var s = 0.0
        for (j <- 0 until mo.m; d <- 0 until mo.dsub) {
          val diff = v(j * mo.dsub + d) - mo.codebooks((j * mo.ksub + codes(j)) * mo.dsub + d)
          s += diff * diff
        }
        s
      }.sum / rows.length
    }
    val trained = Pq.train(emb, "embedding", dim = 64, m = m, ksub = ksub, iters = 2)
    val d0 = distortion(model)
    val dt = distortion(trained)
    assert(dt < d0 * 0.8, s"trained distortion $dt not clearly below random $d0")
  }

  test("train is deterministic") {
    val a = Pq.train(emb, "embedding", dim = 64, m = m, ksub = ksub, iters = 1)
    val b = Pq.train(emb, "embedding", dim = 64, m = m, ksub = ksub, iters = 1)
    assert(a.codebooks.zip(b.codebooks).forall { case (x, y) => math.abs(x - y) < 1e-9 })
  }

  test("adcTopK ranks planted exact duplicates first under a trained model") {
    val planted = emb.filter(col("vec_id") < 10)
      .withColumn("vec_id", col("vec_id") + 100000)
    val corpus = emb.unionByName(planted)
    val trained = Pq.train(emb, "embedding", dim = 64, m = m, ksub = ksub, iters = 2)
    // identical vectors get identical codes, so the duplicate's ADC equals
    // the query's own quantization distortion — the minimum possible ADC
    // for that query; ties (same-code natural rows) break by neighbor id,
    // and 100000+i never wins a tie against a natural id, so top-1 may be
    // a same-code natural row. Accept the duplicate anywhere in the top-2.
    val hits = Pq.adcTopK(corpus, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        trained, k = 2)
      .filter(col("neighbor_id") === col("query_id") + 100000)
      .count()
    assert(hits >= 8, s"expected ≥8/10 planted duplicates in top-2, got $hits")
  }

  test("adc guards corrupt codes per subspace segment: 0 contribution, not a cross-segment read") {
    // code ksub (one past the last valid centroid) in subspace 0 would —
    // without the per-segment guard — read lut[ksub], which is subspace 1's
    // FIRST entry: in overall LUT bounds, silently wrong. The guard must
    // drop it, so the ADC equals the sum over only the valid subspaces.
    val df = emb.limit(5).select(col("vec_id"),
      PqExpressions.encode(col("embedding"), model.codebooks, m, ksub, dsub).as("codes"),
      PqExpressions.lut(col("embedding"), model.codebooks, m, ksub, dsub).as("lut"))
    val corrupt = concat(array(lit(ksub)), slice(col("codes"), 2, m - 1))
    val negCorrupt = concat(array(lit(-1)), slice(col("codes"), 2, m - 1))
    val rows = df.select(col("vec_id"), col("codes"), col("lut"),
        PqExpressions.adc(corrupt, col("lut"), ksub).as("adcCorrupt"),
        PqExpressions.adc(negCorrupt, col("lut"), ksub).as("adcNeg"),
        PqExpressions.adc(col("codes"), col("lut"), ksub).as("adcGood"))
      .collect()
    for (r <- rows) {
      val codes = r.getSeq[Int](r.fieldIndex("codes")).toArray
      val lut = r.getSeq[Double](r.fieldIndex("lut")).toArray
      val wantTail = (1 until m).map(j => lut(j * ksub + codes(j))).sum
      assert(math.abs(r.getDouble(r.fieldIndex("adcCorrupt")) - wantTail) < 1e-9,
        s"vec ${r.getLong(0)}: corrupt code ksub read a neighboring segment")
      assert(math.abs(r.getDouble(r.fieldIndex("adcNeg")) - wantTail) < 1e-9,
        s"vec ${r.getLong(0)}: negative code should contribute 0")
      val wantAll = (0 until m).map(j => lut(j * ksub + codes(j))).sum
      assert(math.abs(r.getDouble(r.fieldIndex("adcGood")) - wantAll) < 1e-9)
    }
  }

  test("adcTopKEncoded over a stored code table equals direct adcTopK") {
    val queries = emb.filter(col("vec_id") < 4)
    val stored = Pq.encode(emb, "vec_id", "embedding", model)
    val viaStored = Pq.adcTopKEncoded(stored, queries, "vec_id", "vec_id", "embedding",
        model, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    val direct = Pq.adcTopK(emb, queries, "vec_id", "embedding", model, k = 5)
      .orderBy("query_id", "rank").collect().map(_.toSeq)
    assert(viaStored.toSeq == direct.toSeq)
  }

  test("null and short vectors: encode nulls on null, handles short input") {
    val df = strDf(Seq("s"), Seq(Seq("x")))
      .select(lit(null).cast("array<double>").as("nv"),
        array(lit(1.0), lit(2.0)).as("short"))
    val r = df.select(
      PqExpressions.encode(col("nv"), model.codebooks, m, ksub, dsub).as("a"),
      PqExpressions.encode(col("short"), model.codebooks, m, ksub, dsub).as("b"))
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getSeq[Int](1).length == m)
  }

  test("plan shape: encode/LUT codegen'd, queries broadcast, bounded top-k") {
    val df = Pq.adcTopK(emb, emb.limit(3), "vec_id", "embedding", model, k = 3)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side should broadcast:\n$p")
    assert(p.contains("collect_top_k") && !p.contains("Window"), p)
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("pq_encode")),
      s"encode fell out of whole-stage codegen:\n$p")
    assert(p.linesIterator.exists(l => l.contains("*(") && l.contains("pq_adc")),
      s"ADC fell out of whole-stage codegen:\n$p")
  }
}
