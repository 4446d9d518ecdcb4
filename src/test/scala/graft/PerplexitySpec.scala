package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.llm.Perplexity

class PerplexitySpec extends SparkSpec {

  /** The gold standard the two-phase bucketing must equal: a literal ntile
    * window. Fine at test scale, the exact thing we refuse to run at 100 TB.
    */
  private def ntileOracle(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.withColumn("expected", ntile(k).over(
      Window.partitionBy("strat").orderBy(desc("score"), asc("id"))))

  test("matches a literal ntile window: remainders, ties, several strata") {
    import spark.implicits._
    // sizes 7/3/1 across strata exercise n%k of 1, 0, 1; duplicated scores
    // exercise the tie path (rank inside a tie group comes from the window)
    val rows = Seq(
      ("a", 1L, 0.5), ("a", 2L, 0.5), ("a", 3L, 0.9), ("a", 4L, 0.1),
      ("a", 5L, 0.9), ("a", 6L, 0.3), ("a", 7L, 0.5),
      ("b", 8L, 1.0), ("b", 9L, 1.0), ("b", 10L, 1.0),
      ("c", 11L, 2.0),
    ).toDF("strat", "id", "score")
    val got = Perplexity.ntileBuckets(rows, col("score"), col("strat"), col("id"))
    val joined = ntileOracle(got, 3)
    assert(joined.filter(col("bucket") =!= col("expected")).count() == 0)
    assert(got.count() == rows.count())
  }

  test("agrees with ntile for every k on a pseudo-random corpus") {
    import spark.implicits._
    // deterministic pseudo-random scores quantized to force heavy ties
    val rows = (1L to 500L).map { i =>
      (s"s${i % 4}", i, (i * 2654435761L % 17).toDouble / 16.0)
    }.toDF("strat", "id", "score")
    for (k <- Seq(1, 2, 3, 5, 7)) {
      val got = Perplexity.ntileBuckets(rows, col("score"), col("strat"),
        col("id"), k)
      assert(ntileOracle(got, k).filter(col("bucket") =!= col("expected")).count() == 0,
        s"k=$k diverged from ntile")
    }
  }

  test("null scores drop out; null strata fail loudly") {
    import spark.implicits._
    val rows = Seq(("a", 1L, Some(1.0)), ("a", 2L, None), ("a", 3L, Some(0.5)))
      .toDF("strat", "id", "score")
    val got = Perplexity.ntileBuckets(rows, col("score"), col("strat"), col("id"))
    assert(got.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 3L))
    val bad = Seq((null.asInstanceOf[String], 1L, 1.0)).toDF("strat", "id", "score")
    val e = intercept[Exception] {
      Perplexity.ntileBuckets(bad, col("score"), col("strat"), col("id")).collect()
    }
    assert(e.getMessage != null)
  }

  test("bounded driver state is enforced") {
    import spark.implicits._
    val rows = (1L to 100L).map(i => ("a", i, i.toDouble)).toDF("strat", "id", "score")
    val e = intercept[IllegalArgumentException] {
      Perplexity.ntileBuckets(rows, col("score"), col("strat"), col("id"),
        maxGroups = 10)
    }
    assert(e.getMessage.contains("quantize"))
  }

  test("perplexityBuckets labels thirds per language and skips empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the the the", "en"), (2L, "the cat", "en"), (3L, "rare words", "en"),
      (4L, "el el", "es"), (5L, "", "es"), (6L, "unico", "es"),
    ).toDF("doc_id", "text", "lang")
    val got = Perplexity.perplexityBuckets(docs, "doc_id", "text", col("lang"))
      .collect().map(r => r.getLong(0) -> r.getString(4)).toMap
    // en: avg freqs — doc1 "the"×3 (freq 4) → 4.0; doc2 (4+1)/2=2.5;
    // doc3 (1+1)/2=1.0 → head/middle/tail. es: doc4 el×2 (freq 2) → 2.0
    // head; doc6 1.0 middle (n=2 ⇒ ntile buckets 1,2); doc5 empty absent
    assert(got == Map(1L -> "head", 2L -> "middle", 3L -> "tail",
      4L -> "head", 6L -> "middle"))
  }
}
