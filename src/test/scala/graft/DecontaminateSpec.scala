package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.llm.Decontaminate
import graft.topology.Topology

class DecontaminateSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The QUICK, brown fox!"),              // normalization: case + punct
      (3L, "quick brownish fox"),                 // substring but not token run
      (4L, "totally unrelated text here"),
      (5L, "ends with lazy dog"),
      (6L, ""),                                   // empty text never matches
    ).toDF("doc_id", "text")
  }

  test("normalizeText lowercases, collapses punct runs, trims") {
    import spark.implicits._
    val out = Seq("  The QUICK,,; brown-fox! ", "", null.asInstanceOf[String])
      .toDF("t").select(TextFunctions.normalizeText(col("t"))).as[String].collect()
    assert(out(0) == "the quick brown fox")
    assert(out(1) == "" && out(2) == "")
  }

  test("flagged finds token-boundary phrase matches across phrase lengths") {
    import spark.implicits._
    val ids = Decontaminate.flagged(corpus, "doc_id", "text",
      Seq("quick brown fox", "lazy dog")).as[Long].collect().toSet
    // doc 3: "brownish" is not a "brown" token; doc 4/6: no match
    assert(ids == Set(1L, 2L, 5L))
  }

  test("clean drops exactly the flagged docs; empty phrase list rejected") {
    import spark.implicits._
    val kept = Decontaminate.clean(corpus, "doc_id", "text", Seq("lazy dog"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L, 6L))
    intercept[IllegalArgumentException](
      Decontaminate.flagged(corpus, "doc_id", "text", Seq("", "  ")))
  }

  test("Decontaminate + NormalizeText TOML components") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decon").toFile
    java.nio.file.Files.writeString(new java.io.File(dir, "in.csv").toPath,
      "1|the quick brown fox\n2|UNRELATED Text!\n3|a quick brown fox too\n")
    val toml =
      s"""[fields]
         |names = ["id", "text"]
         |[csv]
         |field_separator = "|"
         |[[filter]]
         |name = "Decontaminate"
         |  [filter.config]
         |  Field = "text"
         |  Phrases = ["quick brown fox"]
         |[[filter]]
         |name = "NormalizeText"
         |  [filter.config]
         |  SrcField = "text"
         |  DstField = "text"
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$dir/in.csv"]
         |[output]
         |name = "Recorder"
         |""".stripMargin
    val (_, _) = Topology.compileToml(spark, toml, env = Map.empty).run()
    // Recorder is a raw output: rows are (projected fields..., _record)
    val got = graft.topology.BuiltinComponents.Recorder.last
      .map(r => Seq(r.getString(0), r.getString(1)).mkString("|"))
    assert(got == Seq("2|unrelated text"))
  }
}
