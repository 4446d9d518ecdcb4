package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.topology.Topology

/** The Parquet TOML output: columnar sink for the projected fields. */
class ParquetOutputSpec extends SparkSpec {

  private def runToml(outConfig: String): (graft.topology.OutputResult, Map[String, Any], File) = {
    val dir = Files.createTempDirectory("graft-parquet-out").toFile
    val data = new File(dir, "in.csv")
    Files.write(data.toPath, java.util.List.of(
      "1;US;ok", "2;JP;meh", "3;US;fine", "4;;empty"))
    val toml =
      s"""[csv]
         |field_separator = 59
         |[fields]
         |names = ["id", "country", "note"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$data"]
         |  MatchPath = ".*\\\\.csv"
         |[output]
         |name = "Parquet"
         |fields = ["id", "country", "note"]
         |  [output.config]
         |  Path = "$dir/out"
         |$outConfig
         |""".stripMargin
    val (r, m) = Topology.compileToml(spark, toml).run()
    (r, m, dir)
  }

  test("writes the projected fields columnar; rows counted on the write job") {
    val (result, metrics, dir) = runToml("")
    assert(result.rows == 4L && result.paths == Seq(s"$dir/out"))
    assert(metrics.get("output_records").contains(4L))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.columns.toSeq == Seq("id", "country", "note"))
    assert(back.count() == 4)
    // empty CSV field round-trips as the projection's empty string
    assert(back.filter(col("id") === "4").select("country").head().getString(0) == "")
  }

  test("PartitionBy lays the files out by field value (directory pruning at rest)") {
    val (_, _, dir) = runToml("  PartitionBy = \"country\"")
    val names = new File(dir, "out").listFiles().map(_.getName).filter(_.startsWith("country="))
    assert(names.toSet == Set("country=US", "country=JP", "country=__HIVE_DEFAULT_PARTITION__"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.filter(col("country") === "US").count() == 2)
  }

  test("Parquet input: declared fields selected by name, cast to strings; missing field is loud") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-parquet-in").toFile
    Seq((1L, "en", 250L), (2L, "de", 100L)).toDF("doc_id", "lang", "n_chars")
      .write.parquet(s"$dir/docs")
    def toml(fields: String) =
      s"""[fields]
         |names = [$fields]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[output]
         |name = "Recorder"
         |""".stripMargin
    Topology.compileToml(spark, toml("\"doc_id\", \"lang\"")).run()
    val rows = graft.topology.BuiltinComponents.Recorder.last
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("1", "en"), ("2", "de")))
    val e = intercept[Exception](
      Topology.compileToml(spark, toml("\"doc_id\", \"missing_col\"")))
    assert(e.getMessage.contains("missing_col"))
  }

  test("unknown PartitionBy field and bad Mode fail loudly") {
    val e1 = intercept[Exception](runToml("  PartitionBy = \"nope\""))
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[Exception](runToml("  Mode = \"upsert\""))
    assert(e2.getMessage.contains("upsert"))
  }
}
