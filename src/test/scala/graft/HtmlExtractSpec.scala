package graft

import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}
import graft.topology.{BuiltinComponents, Topology}

/** WET-style HTML extraction: tag/script/style/comment stripping, entity
  * decode order, title/link extraction, the documented regex limitations,
  * and the HtmlExtract TOML component.
  */
class HtmlExtractSpec extends SparkSpec {

  private def extract(html: String): (String, String, Int) = {
    import spark.implicits._
    val r = Seq(html).toDF("page")
      .select(TF.htmlToText(col("page")), TF.htmlTitle(col("page")),
        TF.htmlLinkCount(col("page")))
      .head()
    (r.getString(0), r.getString(1), r.getInt(2))
  }

  test("strips tags, script, style, comments; decodes entities; collapses space") {
    val (text, title, links) = extract(
      """<html><head><title>
        |  My   Page </title><style>p { color: red; }</style></head>
        |<body><!-- nav
        |comment --><h1>Hello</h1>
        |<p>one &amp; two &lt;three&gt;&nbsp;&quot;four&quot; &#39;five&#39;</p>
        |<script type="text/javascript">var x = "<p>not text</p>";</script>
        |<a href="https://x.test/a">A</a> and <a href='https://x.test/b'>B</a>
        |</body></html>""".stripMargin)
    // title text IS visible text (it survives tag-stripping, like a WET
    // extraction) — only script/style/comment CONTENT is dropped
    assert(text == "My Page Hello one & two <three> \"four\" 'five' A and B")
    assert(title == "My Page")
    // single-quoted href is intentionally not counted (the pattern pins
    // double-quoted attributes — the overwhelming real-world form)
    assert(links == 1)
  }

  test("entity decode order: &amp;lt; decodes to &lt;, not <") {
    // the standard double-decode rule: &amp; must decode LAST so an
    // escaped entity stays escaped after one decode pass
    val (text, _, _) = extract("<p>&amp;lt;literal&amp;gt;</p>")
    assert(text == "&lt;literal&gt;")
  }

  test("script strip ends at the FIRST closing tag (documented regex limit)") {
    // a '</script>' inside a JS string still terminates the strip — the
    // lazy match is the shared-RE2-syntax trade; the tail script text is
    // then tag-stripped like ordinary content
    val (text, _, _) = extract("""<p>a</p><script>var s = "</script>"; more</script><p>b</p>""")
    assert(text.startsWith("a") && text.endsWith("b"))
    assert(text.contains("more"), "tail after the early close survives as text")
  }

  test("missing title -> empty string; no links -> 0; null page -> null") {
    val (text, title, links) = extract("<p>just text</p>")
    assert(text == "just text" && title == "" && links == 0)
    import spark.implicits._
    val r = Seq(Option.empty[String]).toDF("page")
      .select(TF.htmlToText(col("page"))).head()
    assert(r.isNullAt(0))
  }

  test("numeric character references beyond &#39; survive literally") {
    val (text, _, _) = extract("<p>&#8212; and &#x2014;</p>")
    assert(text == "&#8212; and &#x2014;")
  }

  test("HtmlExtract TOML component: DstField, TitleField, LinksField") {
    val toml =
      s"""[fields]
         |names = ["id", "html", "text", "title", "links"]
         |[input]
         |name = "LogLines"
         |  [input.config]
         |  Lines = ["1,<html><head><title>T1</title></head><body><p>hi &amp; bye</p><a href=\\"u\\">l</a></body></html>"]
         |[[filter]]
         |name = "HtmlExtract"
         |  [filter.config]
         |  SrcField = "html"
         |  DstField = "text"
         |  TitleField = "title"
         |  LinksField = "links"
         |[output]
         |name = "Recorder"
         |""".stripMargin
    Topology.compileToml(spark, toml, env = Map.empty).run()
    val row = BuiltinComponents.Recorder.last.head
    assert(row(2) == "T1 hi & bye l", row.mkString("|"))
    assert(row(3) == "T1")
    assert(row(4) == "1")
  }

  test("extraction is a map-only codegen'd scan — no shuffle, no UDF") {
    val docs = graft.core.Graft.table(spark, "/root/testdata/sf0.001", "documents")
    val df = docs.select(TF.htmlToText(concat(lit("<p>"), col("text"), lit("</p>"))))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("BatchEvalPython"), p)
    assert(p.contains("*(1)"), s"extraction fell out of whole-stage codegen:\n$p")
  }
}
