package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.topology.{BuiltinComponents, Topology}

/** The complete two-job "tag once, mix many" handoff (the Dolma model),
  * pinned END TO END through the topology RUN path: job A materializes a
  * parquet attribute sidecar with [[graft.llm.Attributes.tag]]; job B is
  * a TOML topology — SidecarJoin → QuantileFilter → RedactSpans — that
  * re-curates from config alone, never touching a tagger. The pieces are
  * each oracle-checked (`q_attribute_mix`, `q_quantile_filter`,
  * `q_span_redact`, `q_sidecar_recipe`); this spec pins the HANDOFF —
  * job A's on-disk output drives job B's config-declared filters through
  * `Compiled.run()` — against the same recipe composed directly from the
  * library APIs.
  */
class SidecarRecipeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("job A (Attributes.tag -> parquet sidecar) feeds job B (TOML " +
      "SidecarJoin -> QuantileFilter -> RedactSpans) through run()") {
    assume(new java.io.File(sf).isDirectory, "testdata not available")
    val dir = Files.createTempDirectory("graft-recipe").toString
    val docs = graft.core.Graft.table(spark, sf, "documents")
    val s1 = (col("doc_id") % 4).cast("int")

    // ---- job A: run the taggers once, write the slim sidecar ----
    graft.llm.Attributes.tag(docs, "doc_id", Seq(
        "score" -> round(TextFunctions.qualityScore(col("text")) * 10000)
          .cast("long"),
        "spans" -> to_json(array(array(s1, s1 + 3)))))
      .write.mode("overwrite").parquet(s"$dir/sidecar")
    // the corpus interchange file job B ingests (JSONL, Dolma-style)
    docs.select(to_json(struct(col("doc_id"), col("lang"), col("text")))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(s"$dir/corpus")

    // ---- job B: pure config, consuming job A's sidecar ----
    val toml =
      s"""[fields]
         |names = ["doc_id", "lang", "text", "score", "spans"]
         |[input]
         |name = "JsonLines"
         |  [input.config]
         |  Files = ["$dir/corpus"]
         |  MatchPath = ".*\\\\.txt"
         |[[filter]]
         |name = "SidecarJoin"
         |  [filter.config]
         |  Path = "$dir/sidecar"
         |  IdField = "doc_id"
         |  Fields = ["score", "spans"]
         |[[filter]]
         |name = "QuantileFilter"
         |  [filter.config]
         |  GroupField = "lang"
         |  ScoreField = "score"
         |  Drop = 0.4
         |  Scale = 1
         |[[filter]]
         |name = "RedactSpans"
         |  [filter.config]
         |  Field = "text"
         |  SpansField = "spans"
         |  Token = "<PII>"
         |[output]
         |name = "Recorder"
         |fields = ["doc_id", "lang", "text", "score"]
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    val got = BuiltinComponents.Recorder.last
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet

    // ---- the same recipe composed from the library APIs directly ----
    val sidecarBack = spark.read.parquet(s"$dir/sidecar")
    val joined = docs.select("doc_id", "lang", "text")
      .join(sidecarBack, Seq("doc_id"))
    val kept = graft.llm.Mix.quantileFilter(joined, col("lang"), col("score"),
      drop = 0.4)
    val expected = kept.select(
        col("doc_id").cast("string"),
        col("lang"),
        TextFunctions.redactSpans(col("text"),
          array(struct(s1.as("s"), (s1 + 3).as("e"))), "<PII>"),
        col("score").cast("string"))
      .collect().map(r =>
        (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet

    assert(result.rows == expected.size.toLong,
      s"run() reported ${result.rows} records, expected ${expected.size}")
    assert(got == expected,
      s"handoff mismatch: ${(got -- expected).take(3)} extra, " +
        s"${(expected -- got).take(3)} missing")
    // the recipe actually gates (some rows dropped) and actually rewrites
    // (some surviving text carries the token) — guard against a
    // vacuously-equal empty comparison
    assert(expected.nonEmpty && expected.size < docs.count(),
      s"quantile gate must drop some rows: kept ${expected.size}")
    assert(got.exists(_._3.contains("<PII>")), "no redaction token in output")
  }
}
