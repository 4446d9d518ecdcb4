package graft

import java.io.File
import java.nio.file.Files

import graft.topology.Topology

/** Byte-level parity with the reference engine: run its own example
  * topologies (e2e_test.go:20-48) over its own checked-in inputs
  * (`testdata/input.csv….zst`) and compare our decompressed output
  * content against its golden files (`testdata/….golden`). Same TOML
  * semantics, same filter results, same record serialization — a user of
  * the reference switching engines sees identical files.
  */
class GoldenE2ESpec extends SparkSpec {

  private val refData = new File("/root/reference/testdata")

  private def tmpDir(): File = Files.createTempDirectory("graft-golden").toFile

  private def gunzip(f: File): Seq[String] = {
    val in = new java.util.zip.GZIPInputStream(new java.io.FileInputStream(f))
    val s = scala.io.Source.fromInputStream(in, "UTF-8")
    try s.getLines().toList finally s.close()
  }

  private def readOut(paths: Seq[String]): Seq[String] =
    paths.flatMap(p => gunzip(new File(p)))

  private def assume_(): Unit =
    assume(refData.isDirectory, "reference testdata not available")

  test("advanced_csv_example.toml: zstd -> ClauseFilter -> gzip matches golden") {
    assume_()
    val dir = tmpDir()
    val toml =
      s"""[fields]
         |names = ["timestamp", "source", "target"]
         |[input]
         |name="List"
         |  [input.config]
         |  files=["$refData/input.csv.zst"]
         |[[filter]]
         |name="ClauseFilter"
         |  [filter.config]
         |  Clause=${"\"\"\""}(or (timestamp value5) (target value6))${"\"\"\""}
         |[output]
         |name="FileWriter"
         |procs=1
         |  [output.config]
         |  PathString="$dir/csv.gz"
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    val golden = gunzip(new File(refData, "advanced_csv.golden"))
    assert(readOut(result.paths).sorted == golden.sorted)
  }

  test("advanced_csv_example_0x1e.toml: \\x1e separator matches golden") {
    assume_()
    val dir = tmpDir()
    val toml =
      s"""[csv]
         |field_separator="\\u001e"
         |[fields]
         |names = ["timestamp", "source", "target"]
         |[input]
         |name="List"
         |  [input.config]
         |  files=["$refData/input.csv.0x1e.zst"]
         |[[filter]]
         |name="ClauseFilter"
         |  [filter.config]
         |  Clause=${"\"\"\""}(or (timestamp value5) (target value6))${"\"\"\""}
         |[output]
         |name="FileWriter"
         |procs=1
         |  [output.config]
         |  PathString="$dir/0x1e.csv.gz"
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    val golden = gunzip(new File(refData, "advanced_csv_0x1e.golden"))
    assert(readOut(result.paths).sorted == golden.sorted)
  }

  test("validation example: per-field regex gate matches golden") {
    assume_()
    val dir = tmpDir()
    val toml =
      s"""[fields]
         |names = ["timestamp", "source", "target"]
         |[validation]
         |timestamp="^value[0-9]+$$"
         |target="value3"
         |[input]
         |name="List"
         |  [input.config]
         |  files=["$refData/input.csv.zst"]
         |[output]
         |name="FileWriter"
         |procs=1
         |  [output.config]
         |  PathString="$dir/output.csv.gz"
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    val golden = gunzip(new File(refData, "validation.csv.gz.golden"))
    assert(readOut(result.paths).sorted == golden.sorted)
  }
}
