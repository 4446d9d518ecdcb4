package graft

import org.apache.spark.sql.functions._

import graft.llm.Classifier

/** Linear bag-of-features classifier: hand-computed scores, n-gram
  * features, filter form, empty-doc handling.
  */
class ClassifierSpec extends SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    Seq(
      (1L, "good good bad"),      // 2·0.5 - 0.25 = 0.75 over 3 feats
      (2L, "bad bad"),            // -0.5 over 2
      (3L, "unknown words only"),
      (4L, ""),                   // no features → absent
    ).toDF("doc_id", "text")
  }
  private val w = Map("good" -> 0.5, "bad" -> -0.25)

  test("scoreLinear: hand-computed logits, zero-feature docs absent") {
    import spark.implicits._
    val out = Classifier.scoreLinear(docs, "doc_id", "text", w, bias = 0.0)
      .select("doc_id", "n_features", "sum_weight", "keep")
      .as[(Long, Long, Double, Boolean)].collect().sortBy(_._1)
    assert(out.map(_._1).sameElements(Array(1L, 2L, 3L))) // doc 4 absent
    assert(out(0) == ((1L, 3L, 0.75, true)))
    assert(out(1) == ((2L, 2L, -0.5, false)))
    assert(out(2) == ((3L, 3L, 0.0, false))) // OOV-only: logit 0, not kept
  }

  test("bias shifts the decision; wordNgrams=2 adds bigram features") {
    import spark.implicits._
    // bias makes the OOV-only doc pass
    val biased = Classifier.scoreLinear(docs, "doc_id", "text", w, bias = 0.125)
      .filter(col("doc_id") === 3L).select("keep").as[Boolean].head()
    assert(biased)
    // the bigram "good bad" only matches with wordNgrams=2
    val w2 = Map("good bad" -> 1.0)
    val uni = Classifier.scoreLinear(docs, "doc_id", "text", w2)
      .filter(col("doc_id") === 1L).select("sum_weight").as[Double].head()
    val bi = Classifier.scoreLinear(docs, "doc_id", "text", w2, wordNgrams = 2)
      .filter(col("doc_id") === 1L).select("sum_weight").as[Double].head()
    assert(uni == 0.0 && bi == 1.0)
  }

  test("qualityFilter keeps accepted docs with original columns") {
    import spark.implicits._
    val kept = Classifier.qualityFilter(docs, "doc_id", "text", w)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("scoring is map-only: no exchange, no join, no aggregate") {
    val p = Classifier.scoreLinear(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p)
    assert(!p.contains("Join"), p)
    assert(!p.contains("Aggregate"), p)
    val pf = Classifier.qualityFilter(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!pf.contains("Exchange") && !pf.contains("Join") &&
      !pf.contains("Aggregate"), pf)
  }

  test("native score equals the explode + broadcast-join restatement") {
    import spark.implicits._
    // the declarative reference shape the native expression replaced:
    // explode unigram+bigram features, left-join the weight table, one
    // doc-keyed agg — recomputed here as the cross-check
    val weights = Map("join" -> 0.5, "slow" -> -0.125, "hash join" -> 0.25,
      "scan" -> 0.0625)
    val corpus = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val feats = concat(graft.functions.TextFunctions.tokens(col("text")),
      graft.functions.TextFunctions.shingles(col("text"), 2))
    val ref = corpus.select(col("doc_id"), explode(feats).as("__f"))
      .join(broadcast(weights.toSeq.toDF("token", "weight")),
        col("__f") === col("token"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum(coalesce(col("weight"), lit(0.0))).as("sw"))
    val got = Classifier.scoreLinear(corpus, "doc_id", "text", weights,
        wordNgrams = 2)
      .select(col("doc_id"), col("n_features").as("n"), col("sum_weight").as("sw"))
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty)
    // filter form agrees with the score form's keep set
    val keptScore = Classifier.scoreLinear(corpus, "doc_id", "text", weights,
        bias = 0.0, wordNgrams = 2)
      .filter(col("keep")).select("doc_id").as[Long].collect().toSet
    val keptFilter = Classifier.qualityFilter(corpus, "doc_id", "text",
        weights, bias = 0.0, wordNgrams = 2)
      .select("doc_id").as[Long].collect().toSet
    assert(keptFilter == keptScore && keptScore.nonEmpty)
  }
}
