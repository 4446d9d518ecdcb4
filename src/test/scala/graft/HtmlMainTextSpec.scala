package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.topology.{BuiltinComponents, Topology}

/** Main-content (boilerplate) extraction: block segmentation at
  * block-level tags, the two-signal keep gate (length + link density),
  * threshold boundaries, and equivalence between [[TF.htmlMainText]] and
  * the bound-scores rebuild q_html_main_text evaluates.
  */
class HtmlMainTextSpec extends SparkSpec {

  private def mainText(html: String, minLen: Int = 30,
      maxLd: Double = 0.33): String = {
    import spark.implicits._
    Seq(html).toDF("page")
      .select(TF.htmlMainText(col("page"), minLen, maxLd)).head().getString(0)
  }

  private val prose =
    "The quick brown fox jumps over the lazy dog near the river bank today."

  test("keeps article prose, drops nav / cookie banner / aside / footer") {
    val html =
      s"""<html><head><title>T</title><style>nav{}</style></head><body>
         |<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/c">Contact</a></nav>
         |<div class="cookie">We use cookies. <a href="/p">Learn more</a></div>
         |<article><p>$prose</p><p>$prose</p></article>
         |<aside><a href="/r1">Related one</a> <a href="/r2">Related two</a></aside>
         |<footer>(c) 2026 <a href="/tos">Terms</a> <a href="/priv">Privacy</a></footer>
         |</body></html>""".stripMargin
    assert(mainText(html) == s"$prose\n$prose")
  }

  test("length gate boundary: a 30-char block survives, 29 does not") {
    val b30 = "x" * 30
    val b29 = "y" * 29
    assert(mainText(s"<p>$b30</p><p>$b29</p>") == b30)
  }

  test("link-density gate boundary at 0.33") {
    // the inline-tag strip inserts one space between the prose run and the
    // anchor text, so block text = na + 1 + nb chars, link chars = nb
    // kept:    21a + 9b  -> len 31, link 9  <= 0.33*31 = 10.23
    // dropped: 20a + 11b -> len 32, link 11 >  0.33*32 = 10.56
    val kept = "<p>" + ("a" * 21) + "<a href=\"/x\">" + ("b" * 9) + "</a></p>"
    val dropped = "<p>" + ("a" * 20) + "<a href=\"/x\">" + ("b" * 11) + "</a></p>"
    val keptText = ("a" * 21) + " " + ("b" * 9)
    assert(mainText(kept) == keptText)
    assert(mainText(dropped + kept) == keptText)
  }

  test("anchor text measures on the decoded/collapsed scale, like block text") {
    // &amp; decodes to 1 char in both the numerator and the denominator
    val html = "<p>" + ("a" * 24) + "<a href=\"/x\">x &amp; y" + "</a></p>"
    // text = "a"*24 + " " + "x & y" = 30 chars; link chars 5 <= 9.9 -> kept
    assert(mainText(html) == ("a" * 24) + " x & y")
  }

  test("script/style/comment content never reaches any block") {
    val html = s"<p>$prose<script>var a = '$prose';</script></p>" +
      s"<style>p {}</style><!-- $prose -->"
    assert(mainText(html) == prose)
  }

  test("htmlMainText equals the bound-scores rebuild the oracle query uses") {
    import spark.implicits._
    val pages = Seq(
      s"""<nav><a href="/">Home</a></nav><article><p>$prose</p>
         |<p>$prose extra words</p></article><footer>bye</footer>""".stripMargin,
      s"<p>$prose</p>",
      "<p>short</p>",
      "")
    val df = pages.toDF("page")
    val rebuilt = TF.bindOnce(TF.htmlBlockScores(col("page"))) { b =>
      array_join(
        transform(
          filter(b, x => x.getField("len") >= 30 &&
            x.getField("link_chars").cast("double") <=
              lit(0.33) * x.getField("len").cast("double")),
          _.getField("text")),
        "\n")
    }
    val rows = df.select(TF.htmlMainText(col("page")).as("a"), rebuilt.as("b"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
    assert(rows.length == pages.length)
  }

  test("MainContent TOML component: boilerplate dropped, thresholds wired") {
    val page = "<nav><a href=\\\"/\\\">Home</a> <a href=\\\"/a\\\">About</a></nav>" +
      s"<article><p>$prose</p></article>" +
      "<footer><a href=\\\"/tos\\\">Terms</a></footer>"
    val toml =
      s"""[fields]
         |names = ["id", "html", "main"]
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = ["1,$page"]
         |[[filter]]
         |name = "MainContent"
         |  [filter.config]
         |  SrcField = "html"
         |  DstField = "main"
         |  MinLength = 30
         |  MaxLinkDensity = 0.33
         |[output]
         |name = "Recorder"
         |""".stripMargin
    Topology.compileToml(spark, toml, env = Map.empty).run()
    val row = BuiltinComponents.Recorder.last.head
    assert(row(2) == prose, row.mkString("|"))
  }
}
