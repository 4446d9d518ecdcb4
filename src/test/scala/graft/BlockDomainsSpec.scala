package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** URL host extraction, domain-suffix chains, and the blocklist filter:
  * whole-label semantics, the literal-vs-native routing equality, and the
  * BlockDomains TOML filter end to end.
  */
class BlockDomainsSpec extends SparkSpec {
  import spark.implicits._

  private def hostOf(url: String): String =
    Seq(url).toDF("u").select(TextFunctions.urlHost(col("u"))).as[String].head()

  test("urlHost: scheme/userinfo/port/path stripped, host lowercased") {
    assert(hostOf("https://User:pw@WWW.Example.COM:8443/a/b?q=1#f") == "www.example.com")
    assert(hostOf("http://example.org") == "example.org")
    assert(hostOf("HTTP://EXAMPLE.ORG:80/") == "example.org")
    assert(hostOf("not a url") == "")
    assert(hostOf(null) == "")
  }

  test("hostSuffixes: label-boundary chain; blanks and trailing dots drop") {
    def suf(h: String): Seq[String] =
      Seq(h).toDF("h").select(TextFunctions.hostSuffixes(col("h"))).as[Seq[String]].head()
    assert(suf("a.b.c.com") == Seq("a.b.c.com", "b.c.com", "c.com", "com"))
    assert(suf("com") == Seq("com"))
    assert(suf("fqdn.example.com.") == Seq("fqdn.example.com", "example.com", "com"))
    assert(suf("") == Seq())
  }

  test("domainBlocked: whole-label matching, never substrings") {
    val bl = Seq("tracker.com", "spam.example.org")
    def blocked(url: String): Boolean =
      Seq(url).toDF("u").select(TextFunctions.domainBlocked(col("u"), bl)).as[Boolean].head()
    assert(blocked("https://tracker.com/x"))
    assert(blocked("https://a.b.tracker.com/x"))
    assert(!blocked("https://nottracker.com/x"))        // substring trap
    assert(!blocked("https://tracker.com.evil.net/x"))  // listed domain as a PREFIX
    assert(blocked("http://u@SPAM.Example.Org:80/"))
    assert(!blocked("http://example.org/"))
    assert(!blocked("plain text"))
  }

  test("literal and native paths agree on random hosts") {
    val rnd = new scala.util.Random(11)
    val parts = Seq("ads", "www", "x1", "tracker", "nottracker", "com", "org", "net", "evil")
    val hosts = Seq.fill(300)(Seq.fill(1 + rnd.nextInt(4))(parts(rnd.nextInt(parts.size)))
      .mkString("."))
    val small = Seq("tracker.com", "evil.net", "x1.org") // literal route (<= threshold)
    val big = small ++ (1 to 100).map(i => s"pad$i.invalid") // native route
    assert(big.size > TextFunctions.BlocklistLiteralThreshold)
    val df = hosts.toDF("h").withColumn("u", concat(lit("https://"), col("h"), lit("/")))
    val both = df.select(col("h"),
        TextFunctions.domainBlocked(col("u"), small).as("lit_path"),
        TextFunctions.domainBlocked(col("u"), big).as("native_path"))
      .collect()
    assert(both.nonEmpty && both.forall(r => r.getBoolean(1) == r.getBoolean(2)),
      both.filter(r => r.getBoolean(1) != r.getBoolean(2)).mkString(", "))
    // and both saw real positives and negatives
    assert(both.exists(_.getBoolean(1)) && both.exists(!_.getBoolean(1)))
  }

  test("BlockDomains TOML filter: inline list + file list, drop and audit modes") {
    import graft.topology.{BuiltinComponents, Topology}
    val dir = Files.createTempDirectory("graft-blockdom").toFile
    val data = new File(dir, "in.csv")
    Files.write(data.toPath, scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
      "1;https://ads.tracker.com/a", "2;https://good.example.org/b",
      "3;https://spam.example.org/c", "4;https://nottracker.com/d")).asJava)
    val listFile = new File(dir, "blocked.txt")
    Files.write(listFile.toPath, scala.jdk.CollectionConverters.SeqHasAsJava(Seq(
      "# adult/malware feed excerpt", "spam.example.org", "")).asJava)
    def run(extra: String): Seq[String] = {
      val toml =
        s"""[csv]
           |field_separator = 59
           |[fields]
           |names = ["id", "url"]
           |[input]
           |name = "List"
           |  [input.config]
           |  Files = ["$data"]
           |  MatchPath = ".*\\\\.csv"
           |[[filter]]
           |name = "BlockDomains"
           |  [filter.config]
           |  Field = "url"
           |  Domains = "tracker.com"
           |  DomainsFile = "$listFile"
           |$extra
           |[output]
           |name = "Recorder"
           |fields = ["id"]
           |""".stripMargin
      Topology.compileToml(spark, toml).run()
      BuiltinComponents.Recorder.last.map(_.getString(0)).sorted
    }
    assert(run("") == Seq("2", "4"))                   // blocked rows dropped
    assert(run("  KeepOnMatch = true") == Seq("1", "3")) // audit mode
  }

  test("empty blocklist fails loudly on the config surface") {
    import graft.topology.Topology
    val toml =
      """[fields]
        |names = ["url"]
        |[input]
        |name = "Random"
        |  [input.config]
        |  NumRecords = 1
        |[[filter]]
        |name = "BlockDomains"
        |  [filter.config]
        |  Field = "url"
        |[output]
        |name = "Nop"
        |""".stripMargin
    val ex = intercept[Exception](Topology.compileToml(spark, toml).run())
    assert(ex.getMessage.contains("empty blocklist"), ex.getMessage)
  }
}
