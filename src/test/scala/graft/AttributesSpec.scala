package graft

import org.apache.spark.sql.functions._

import graft.llm.Attributes

/** [[Attributes]]: tag-once/mix-many sidecars — map-only tagging, id-keyed
  * joins, null semantics for untagged docs, collision guards.
  */
class AttributesSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq((1L, "the quick brown fox", "web"),
      (2L, "short", "web"),
      (3L, "a much longer document with many words inside it", "books"))
      .toDF("doc_id", "text", "source")
  }

  test("tag computes every attribute in one map-only pass") {
    val side = Attributes.tag(corpus, "doc_id", Seq(
      "n_tokens" -> graft.functions.TextFunctions.tokenCount(col("text")).cast("long"),
      "n_chars" -> length(col("text")).cast("long")))
    assert(side.columns.toSeq == Seq("doc_id", "n_tokens", "n_chars"))
    val rows = side.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows(1L) == ((4L, 19L)) && rows(2L) == ((1L, 5L)))
    // map-only: no exchange in the tagging plan
    val p = side.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"tag must not shuffle:\n$p")
  }

  test("mix joins sidecars by id and filters; untagged docs are dropped " +
      "by null-rejecting predicates, admitted by explicit null branches") {
    import spark.implicits._
    val counts = Attributes.tag(corpus, "doc_id",
      Seq("n_tokens" -> graft.functions.TextFunctions.tokenCount(col("text"))))
    // a tagger that only saw part of the corpus
    val partial = Seq((1L, 0.9)).toDF("doc_id", "score")
    val strict = Attributes.mix(corpus.select("doc_id", "source"), "doc_id",
      Seq(counts, partial), col("n_tokens") >= 2 && col("score") >= 0.5)
    assert(strict.select("doc_id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    val lenient = Attributes.mix(corpus.select("doc_id", "source"), "doc_id",
      Seq(counts, partial),
      col("n_tokens") >= 2 && coalesce(col("score"), lit(1.0)) >= 0.5)
    assert(lenient.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 3L))
  }

  test("name collisions fail loudly") {
    intercept[IllegalArgumentException](
      Attributes.tag(corpus, "doc_id", Seq(
        "a" -> lit(1), "a" -> lit(2))))
    intercept[IllegalArgumentException](
      Attributes.tag(corpus, "doc_id", Seq("doc_id" -> lit(1))))
    val s1 = Attributes.tag(corpus, "doc_id", Seq("a" -> lit(1)))
    val s2 = Attributes.tag(corpus, "doc_id", Seq("a" -> lit(2)))
    intercept[IllegalArgumentException](
      Attributes.mix(corpus, "doc_id", Seq(s1, s2), lit(true)))
  }
}
