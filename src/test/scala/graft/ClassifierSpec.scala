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

  test("weight table broadcasts; corpus never shuffles on the token key") {
    val p = Classifier.scoreLinear(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
