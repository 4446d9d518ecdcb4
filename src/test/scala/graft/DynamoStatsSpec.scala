package graft

import java.io.File
import java.nio.file.Files

import graft.metrics.StatsDumper
import graft.topology.Topology

class DynamoStatsSpec extends SparkSpec {

  test("DynamoDB double: ≤25-item batches, in-batch pkey dedup, region fan-out") {
    val dir = Files.createTempDirectory("graft-ddb").toFile
    val lines = (1 to 60).map(i => s"k${i % 40},$i") // 40 distinct keys → dups
    val toml =
      s"""[fields]
         |names = ["pk", "v"]
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = [${lines.map(l => s""""$l"""").mkString(", ")}]
         |[output]
         |name = "DynamoDB"
         |fields = ["pk", "v"]
         |  [output.config]
         |  Table = "t1"
         |  Columns = ["s:pk", "n:v"]
         |  Regions = ["us-west-2", "eu-west-1"]
         |  LocalDir = "$dir"
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml, env = Map.empty).run()

    def batches(region: String): Seq[Seq[String]] = {
      val d = new File(s"$dir/$region/t1")
      Option(d.listFiles()).toSeq.flatten.sortBy(_.getName)
        .map(f => scala.io.Source.fromFile(f).getLines().toList)
    }
    val w = batches("us-west-2")
    assert(w.nonEmpty && w.forall(_.size <= 25))
    // every batch has unique pks (in-batch dedup)
    for (b <- w) {
      val pks = b.map(l => "\"pk\":\\{\"S\":\"([^\"]+)\"".r.findFirstMatchIn(l).get.group(1))
      assert(pks.distinct.size == pks.size, s"dup pk within batch: $pks")
    }
    // fan-out: both regions got identical content
    assert(batches("eu-west-1").flatten.sorted == w.flatten.sorted)
    // typed encoding
    assert(w.flatten.head.contains("\"v\":{\"N\":"))
    assert(result.rows <= 60 && result.rows >= 40)
  }

  test("DynamoDB Client seam: aws without the SDK fails fast; bogus rejected") {
    def toml(clientLine: String) =
      s"""[fields]
         |names = ["pk", "v"]
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = ["k1,1"]
         |[output]
         |name = "DynamoDB"
         |fields = ["pk", "v"]
         |  [output.config]
         |  Table = "t1"
         |  Columns = ["s:pk", "n:v"]
         |$clientLine
         |""".stripMargin
    // same descriptor, Client="aws": the reflective SDK load fails with an
    // instructive error in this SDK-less build (executor errors surface
    // wrapped in SparkException)
    val e = intercept[Exception](
      Topology.compileToml(spark, toml("""  Client = "aws""""), env = Map.empty).run())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("AWS SDK v2")), messages(e).mkString(" | "))
    // unknown client kind is rejected before any work runs
    val e2 = intercept[Exception](
      Topology.compileToml(spark, toml("""  Client = "bogus""""), env = Map.empty).run())
    assert(messages(e2).exists(_.contains("local")), messages(e2).mkString(" | "))
    // local without LocalDir is rejected
    val e3 = intercept[Exception](
      Topology.compileToml(spark, toml(""), env = Map.empty).run())
    assert(messages(e3).exists(_.contains("LocalDir")), messages(e3).mkString(" | "))
  }

  test("StatsDumper emits the reference-format line for batch topologies") {
    val dumper = new StatsDumper(quiet = true).attach(spark)
    try {
      val toml =
        """[fields]
          |names = ["a"]
          |[input]
          |name = "LogLines"
          |  [input.config]
          |  Lines = ["x", "y", "z"]
          |[output]
          |name = "Recorder"
          |""".stripMargin
      Topology.compileToml(spark, toml, env = Map.empty).run()
      // listener fires asynchronously after the action
      val deadline = System.currentTimeMillis() + 10000
      while (dumper.lines.isEmpty && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(dumper.lines.nonEmpty)
      val line = dumper.lines.last
      assert(line.matches("Stats: 1s\\[w:\\d+,r:\\d+\\] total\\[w:\\d+,r:\\d+\\] " +
        "speed\\[\\d+ rec/s\\] errors\\[p:0 i:0 f:0 o:0 u:0\\]"), line)
      assert(line.contains("r:3"))
    } finally dumper.detach(spark)
  }

  test("track_filter_drops: validation + per-filter drop breakdown in stats") {
    val dumper = new StatsDumper(quiet = true).attach(spark)
    try {
      val toml =
        """[general]
          |track_filter_drops = true
          |[fields]
          |names = ["a", "b"]
          |[validation]
          |a = "^[xyz]$"
          |[input]
          |name = "LogLines"
          |  [input.config]
          |  Lines = ["x,1", "y,", "z,3", "BAD,4"]
          |[[filter]]
          |name = "NotNull"
          |  [filter.config]
          |  Fields = ["b"]
          |[[filter]]
          |name = "StringMatch"
          |  [filter.config]
          |  Field = "a"
          |  Strings = ["z"]
          |[output]
          |name = "Recorder"
          |""".stripMargin
      val (_, metrics) = Topology.compileToml(spark, toml, env = Map.empty).run()
      // 4 read; validation drops BAD; NotNull drops "y,"; StringMatch drops z
      assert(metrics.get("records_after_validation").contains(3L))
      assert(metrics.get("invalid_a").contains(1L))
      assert(metrics.get("records_after_0_NotNull").contains(2L))
      assert(metrics.get("records_after_1_StringMatch").contains(1L))
      val deadline = System.currentTimeMillis() + 10000
      while (!dumper.lines.lastOption.exists(_.contains("filtered[")) &&
        System.currentTimeMillis() < deadline) Thread.sleep(100)
      val line = dumper.lines.last
      assert(line.contains("errors[p:0 i:1 f:2 o:0 u:0]"), line)
      assert(line.contains("filtered[NotNull:1 StringMatch:1]"), line)
    } finally dumper.detach(spark)
  }
}
