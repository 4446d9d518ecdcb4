package graft

import java.io.File
import java.nio.file.Files

import graft.topology.{BuiltinComponents, Topology}

/** The JsonLines input/output pair: JSONL round-trips through the
  * topology's string record model, scalars keep their literal text,
  * nested values arrive as JSON text, missing keys are null-ish.
  */
class JsonLinesSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-jsonl").toFile

  private def writeLines(dir: File, name: String, lines: String*): File = {
    val f = new File(dir, name)
    java.nio.file.Files.write(f.toPath,
      scala.jdk.CollectionConverters.SeqHasAsJava(lines).asJava)
    f
  }

  test("input: fields by key — strings, numbers, nested and missing values") {
    val dir = tmp()
    writeLines(dir, "in.jsonl",
      """{"id": "a", "text": "hello world", "score": 3.5}""",
      """{"id": "b", "text": "t w o", "score": 7, "extra": true}""",
      """{"id": "c", "meta": {"k": 1}}""")
    val toml =
      s"""[fields]
         |names = ["id", "text", "score", "meta"]
         |[input]
         |name = "JsonLines"
         |  [input.config]
         |  Files = ["${new File(dir, "in.jsonl")}"]
         |[output]
         |name = "Recorder"
         |fields = ["id", "text", "score", "meta"]
         |""".stripMargin
    Topology.compileToml(spark, toml, BuiltinComponents.all).run()
    val got = BuiltinComponents.Recorder.last
      .map(r => r.getString(0) ->
        (r.getString(1), r.getString(2), r.getString(3))).toMap
    // missing keys land as "" — the topology's empty-for-null record model
    assert(got("a") == (("hello world", "3.5", "")))
    assert(got("b") == (("t w o", "7", ""))) // undeclared keys ignored
    val cMeta = got("c")._3
    assert(got("c")._1 == "" && cMeta.replaceAll("\\s", "") == """{"k":1}""")
  }

  test("output then input: JSONL round-trips records byte-faithfully") {
    val dir = tmp()
    val out = new File(dir, "out")
    val in = writeLines(dir, "src.jsonl",
      """{"id": "1", "text": "alpha, with commas"}""",
      """{"id": "2", "text": "quote \" inside"}""")
    val writeToml =
      s"""[fields]
         |names = ["id", "text"]
         |[input]
         |name = "JsonLines"
         |  [input.config]
         |  Files = ["$in"]
         |[output]
         |name = "JsonLines"
         |fields = ["id", "text"]
         |  [output.config]
         |  Path = "$out"
         |  Compression = "gzip"
         |""".stripMargin
    Topology.compileToml(spark, writeToml, BuiltinComponents.all).run()
    // read what was written back through the input (gz transparent) with
    // NO MatchPath: the default must accept the writer's part-*.txt.gz
    // layout, so a defaults-only round-trip works
    val readToml =
      s"""[fields]
         |names = ["id", "text"]
         |[input]
         |name = "JsonLines"
         |  [input.config]
         |  Files = ["$out"]
         |[output]
         |name = "Recorder"
         |fields = ["id", "text"]
         |""".stripMargin
    Topology.compileToml(spark, readToml, BuiltinComponents.all).run()
    val got = BuiltinComponents.Recorder.last
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("1" -> "alpha, with commas", "2" -> "quote \" inside"))
  }
}
