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

  test("unknown PartitionBy field and bad Mode fail loudly") {
    val e1 = intercept[Exception](runToml("  PartitionBy = \"nope\""))
    assert(e1.getMessage.contains("nope"))
    val e2 = intercept[Exception](runToml("  Mode = \"upsert\""))
    assert(e2.getMessage.contains("upsert"))
  }
}
