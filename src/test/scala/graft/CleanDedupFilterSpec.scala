package graft

import java.io.File
import java.nio.file.Files

import graft.topology.{BuiltinComponents, Topology}

/** The SpanDedup / ExactSubstrDedup TOML filters: corpus-wide cleaned-text
  * dedup from config — the field is REWRITTEN, not the record dropped
  * (except when nothing survives).
  */
class CleanDedupFilterSpec extends SparkSpec {

  private def runToml(rows: Seq[String], filterToml: String): Map[String, String] = {
    val dir = Files.createTempDirectory("graft-cleandedup-toml").toFile
    val data = new File(dir, "in.csv")
    java.nio.file.Files.write(data.toPath,
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava)
    val toml =
      s"""[csv]
         |field_separator = 59
         |[fields]
         |names = ["id", "text"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$data"]
         |  MatchPath = ".*\\\\.csv"
         |$filterToml
         |[output]
         |name = "Recorder"
         |fields = ["id", "text"]
         |""".stripMargin
    Topology.compileToml(spark, toml, BuiltinComponents.all).run()
    BuiltinComponents.Recorder.last.map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("SpanDedup rewrites the field; all-duplicate records drop") {
    val got = runToml(
      Seq("1;a b c d e f g h", "2;a b c d x y z w", "3;a b c d e f g h"),
      """[[filter]]
        |name = "SpanDedup"
        |  [filter.config]
        |  IdField = "id"
        |  Field = "text"
        |  Width = 4""".stripMargin)
    // doc 2 loses its first span to doc 1; doc 3 loses everything and drops
    assert(got == Map("1" -> "a b c d e f g h", "2" -> "x y z w"))
  }

  test("SpanDedup cdc mode runs and keeps first occurrences") {
    val got = runToml(
      Seq("1;a b c d e f g h", "2;a b c d e f g h"),
      """[[filter]]
        |name = "SpanDedup"
        |  [filter.config]
        |  IdField = "id"
        |  Field = "text"
        |  Mode = "cdc"
        |  MeanLen = 4""".stripMargin)
    // identical docs: doc 1 survives whole, doc 2 loses every span
    assert(got == Map("1" -> "a b c d e f g h"))
  }

  test("ExactSubstrDedup cuts duplicated windows at any alignment") {
    val got = runToml(
      Seq("1;p q r s t", "2;z p q r s t"),
      """[[filter]]
        |name = "ExactSubstrDedup"
        |  [filter.config]
        |  IdField = "id"
        |  Field = "text"
        |  K = 4""".stripMargin)
    // doc 2's windows at offsets 1 and 2 duplicate doc 1's; the interval
    // union [1,6) is cut, leaving only the unshared leading token
    assert(got == Map("1" -> "p q r s t", "2" -> "z"))
  }

  test("RedactSpans rewrites char spans from a JSON offsets field; " +
      "missing/garbage spans leave the text unchanged") {
    val dir = Files.createTempDirectory("graft-redactspans-toml").toFile
    val data = new File(dir, "in.csv")
    java.nio.file.Files.write(data.toPath,
      scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
        "1;hello world;[[0,5]]",
        "2;abcdefghij;[[2,5],[7,9]]",
        "3;untouched;",
        "4;also kept;not-json")).asJava)
    val toml =
      s"""[csv]
         |field_separator = 59
         |[fields]
         |names = ["id", "text", "spans"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$data"]
         |  MatchPath = ".*\\\\.csv"
         |[[filter]]
         |name = "RedactSpans"
         |  [filter.config]
         |  Field = "text"
         |  SpansField = "spans"
         |  Token = "<PII>"
         |[output]
         |name = "Recorder"
         |fields = ["id", "text"]
         |""".stripMargin
    Topology.compileToml(spark, toml, BuiltinComponents.all).run()
    val got = BuiltinComponents.Recorder.last
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("1" -> "<PII> world", "2" -> "ab<PII>fg<PII>j",
      "3" -> "untouched", "4" -> "also kept"), s"got $got")
  }
}
