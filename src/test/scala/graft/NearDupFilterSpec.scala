package graft

import java.io.File
import java.nio.file.Files

import graft.llm.Dedup
import graft.topology.{BuiltinComponents, Topology}

/** The NearDupDedup TOML filter: corpus-wide verified MinHash dedup from
  * config, standalone and against an at-rest signature store.
  */
class NearDupFilterSpec extends SparkSpec {

  private val base =
    "the quick brown fox jumps over the lazy dog while the cat sleeps " +
      "in the warm sun near the old barn door every single afternoon"
  private val other =
    "completely different text about spark clusters and parquet files " +
      "with nothing shared at all in any shingle of this string whatsoever"

  private def tmpDir(): File = Files.createTempDirectory("graft-neardup-toml").toFile

  private def runToml(dir: File, extraConfig: String): Set[String] = {
    val data = new File(dir, "in.csv")
    // \x1f-free simple CSV with ; separator to keep commas out of text
    java.nio.file.Files.write(data.toPath, java.util.List.of(
      s"1;$base",
      s"2;${base.replace("lazy", "sleepy")}",
      s"3;$other"))
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
         |[[filter]]
         |name = "NearDupDedup"
         |  [filter.config]
         |  IdField = "id"
         |  Field = "text"
         |$extraConfig
         |[output]
         |name = "Recorder"
         |fields = ["id"]
         |""".stripMargin
    Topology.compileToml(spark, toml, BuiltinComponents.all).run()
    BuiltinComponents.Recorder.last.map(_.getString(0)).toSet
  }

  test("standalone: smaller-id record survives its near-duplicates") {
    assert(runToml(tmpDir(), "") == Set("1", "3"))
  }

  test("with an at-rest store: store kills batch docs in either id order") {
    import spark.implicits._
    val dir = tmpDir()
    // store holds the base doc under a LARGER id than the batch's copies
    val store = Seq(("900", base)).toDF("id", "text")
    Dedup.minhashSignatures(store, "id", "text")
      .write.parquet(s"$dir/sigs")
    store.write.parquet(s"$dir/corpus")
    val kept = runToml(dir,
      s"""  StoreSigs = "$dir/sigs"
         |  StoreCorpus = "$dir/corpus"""".stripMargin)
    // 1 and 2 both die against the store's 900; 3 survives
    assert(kept == Set("3"))
  }

  test("StoreSigs without StoreCorpus is a loud config error") {
    val e = intercept[Exception](runToml(tmpDir(), "  StoreSigs = \"/nope\""))
    assert(e.getMessage.contains("StoreSigs and StoreCorpus"))
  }

  test("KeepBest: the higher-scoring duplicate survives instead of the smaller id") {
    val dir = tmpDir()
    val data = new File(dir, "in.csv")
    java.nio.file.Files.write(data.toPath, java.util.List.of(
      s"1;0.2;$base",
      s"2;0.9;${base.replace("lazy", "sleepy")}",
      s"3;0.1;$other"))
    val toml =
      s"""[csv]
         |field_separator = 59
         |[fields]
         |names = ["id", "score", "text"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$data"]
         |  MatchPath = ".*\\\\.csv"
         |[[filter]]
         |name = "NearDupDedup"
         |  [filter.config]
         |  IdField = "id"
         |  Field = "text"
         |  KeepBest = "score"
         |[output]
         |name = "Recorder"
         |fields = ["id"]
         |""".stripMargin
    Topology.compileToml(spark, toml, BuiltinComponents.all).run()
    assert(BuiltinComponents.Recorder.last.map(_.getString(0)).toSet == Set("2", "3"))
  }

  test("KeepBest on a non-numeric field is a loud data error, not a " +
      "silent null rank") {
    val dir = tmpDir()
    val data = new File(dir, "in.csv")
    java.nio.file.Files.write(data.toPath, java.util.List.of(
      s"1;not-a-number;$base",
      s"2;0.9;${base.replace("lazy", "sleepy")}"))
    val toml =
      s"""[csv]
         |field_separator = 59
         |[fields]
         |names = ["id", "score", "text"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$data"]
         |  MatchPath = ".*\\\\.csv"
         |[[filter]]
         |name = "NearDupDedup"
         |  [filter.config]
         |  IdField = "id"
         |  Field = "text"
         |  KeepBest = "score"
         |[output]
         |name = "Recorder"
         |fields = ["id"]
         |""".stripMargin
    val e = intercept[Exception](
      Topology.compileToml(spark, toml, BuiltinComponents.all).run())
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("non-numeric")), chain(e).mkString(" | "))
  }

  test("KeepBest with an at-rest store is a loud config error") {
    val e = intercept[Exception](runToml(tmpDir(),
      """  KeepBest = "id"
        |  StoreSigs = "/nope"
        |  StoreCorpus = "/nope"""".stripMargin))
    assert(e.getMessage.contains("KeepBest applies to batch mode only"))
  }
}
