package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}

import graft.sources.TarShards
import graft.streaming.Streaming

/** The full web-crawl funnel PURELY FROM CONFIG as a daemon — the shape a
  * C4-style pipeline runs in production: WebDataset tar shards of raw HTML
  * stream in, each micro-batch extracts main content (boilerplate blocks
  * die), passes the C4 line/page gates and the Gopher shape gate, and the
  * survivors land through the exact-substring dedup store (cross-batch
  * repeats cut against the accumulated corpus) — with a checkpointed
  * restart proving no document is duplicated or lost.
  */
class FunnelDaemonSpec extends SparkSpec {

  private def shard(dir: java.io.File, name: String,
      entries: (String, String)*): Unit = {
    val bos = new ByteArrayOutputStream()
    entries.foreach { case (n, html) =>
      TarShards.writeEntry(bos, n, html.getBytes("UTF-8"))
    }
    bos.write(new Array[Byte](1024))
    val out = new FileOutputStream(new java.io.File(dir, name))
    out.write(bos.toByteArray); out.close()
  }

  private val nav =
    """<div class="nav"><a href="/">Home</a> <a href="/a">About</a></div>"""

  private def page(paras: String*): String =
    s"<html><body>$nav${paras.map(p => s"<p>$p</p>").mkString}</body></html>"

  private val p1 = "alpha bravo charlie delta echo foxtrot golf hotel " +
    "india juliet kilo lima."
  private val p2 = "mike november oscar papa quebec romeo sierra tango " +
    "uniform victor whiskey xray."
  private val p3 = "yankee zulu stone river cloud forest meadow valley " +
    "harbor lantern."

  test("tar HTML stream -> MainContent -> C4Clean gate -> GopherQuality " +
      "-> SubstrDedupStore from TOML; checkpointed restart loses and " +
      "duplicates nothing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toFile
    val shards = new java.io.File(dir, "shards"); shards.mkdirs()
    // shard 0: a real article (three prose paragraphs) and a nav-only
    // page that must die at the C4 page gate after MainContent leaves it
    // empty
    shard(shards, "s0.tar",
      "1000.html" -> page(p1, p2, p3),
      "1001.html" -> page())
    val toml =
      s"""[fields]
         |names = ["key", "html", "main", "clean"]
         |[input]
         |name = "WebDataset"
         |  [input.config]
         |  Path = "${shards.getAbsolutePath}"
         |  MaxFilesPerTrigger = 1
         |[[filter]]
         |name = "MainContent"
         |  [filter.config]
         |  SrcField = "html"
         |  DstField = "main"
         |[[filter]]
         |name = "C4Clean"
         |  [filter.config]
         |  SrcField = "main"
         |  DstField = "clean"
         |  Gate = "true"
         |[[filter]]
         |name = "GopherQuality"
         |  [filter.config]
         |  Field = "clean"
         |  MinWords = 10
         |[output]
         |name = "SubstrDedupStore"
         |  [output.config]
         |  IdField = "key"
         |  Field = "clean"
         |  K = 8
         |  StoreDir = "$dir/store"
         |  CorpusDir = "$dir/corpus"
         |  RunTag = "{{.RunTag}}"
         |  Rotation = "{{.Rotation}}"
         |""".stripMargin
    val d1 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d1.processAllAvailable()
    d1.stop()
    def corpus(): Map[String, String] =
      spark.read.parquet(s"$dir/corpus").select("key", "clean")
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val full = s"$p1 $p2 $p3"
    assert(corpus() == Map("1000" -> full),
      "article kept token-normalized; nav-only page gated out")

    // shard 1: a page embedding an EXACT 8-token run of the article
    // (tokens 2-9 of p1 — away from the terminal-punctuation token) that
    // must be cut against the at-rest store, and a fresh page. The
    // restarted daemon resumes from the checkpoint: shard 0 is NOT
    // reprocessed, nothing is duplicated, nothing already landed is lost.
    val lifted = "bravo charlie delta echo foxtrot golf hotel india"
    shard(shards, "s1.tar",
      "2000.html" -> page(
        s"tower bridge $lifted window garden extra words here.",
        "copper kettle simmers quietly beside the morning window frame.",
        "seven lanterns swing gently above the narrow harbor street."),
      "2001.html" -> page(
        "granite peaks rise sharply beyond the quiet evening plateau.",
        "violet kites drift slowly across the warm summer afternoon.",
        "wooden carts rattle softly down the ancient market lane."))
    val d2 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d2.processAllAvailable()
    d2.stop()
    val got = corpus()
    assert(got.keySet == Set("1000", "2000", "2001"),
      s"restart must neither duplicate nor lose documents: ${got.keySet}")
    assert(got("1000") == full, "already-landed article untouched by restart")
    // exactly the lifted 8-token window died; the page's own words stayed
    assert(got("2000") ==
      "tower bridge window garden extra words here. " +
        "copper kettle simmers quietly beside the morning window frame. " +
        "seven lanterns swing gently above the narrow harbor street.")
    assert(got("2001").startsWith("granite peaks rise sharply"))
    // and the one-row-per-key invariant holds at the parquet level too
    val dup = spark.read.parquet(s"$dir/corpus").groupBy("key").count()
      .filter(org.apache.spark.sql.functions.col("count") > 1).count()
    assert(dup == 0L)
  }
}
