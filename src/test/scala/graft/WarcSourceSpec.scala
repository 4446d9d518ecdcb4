package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.functions._

/** The `warc` DSv2 source against byte-synthesized ISO 28500 fixtures:
  * field extraction, HTTP block splitting, per-record-gzip member
  * concatenation (the Common Crawl layout), the `types` filter, column
  * pruning down to a metadata-only scan, and partition-per-file planning.
  */
class WarcSourceSpec extends SparkSpec {

  private def record(wtype: String, uri: String, block: Array[Byte],
      extra: Map[String, String] = Map.empty): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.0\r\n"
    h ++= s"WARC-Type: $wtype\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:$wtype-${uri.hashCode}>\r\n"
    h ++= s"WARC-Date: 2026-08-14T00:00:00Z\r\n"
    if (uri.nonEmpty) h ++= s"WARC-Target-URI: $uri\r\n"
    extra.foreach { case (k, v) => h ++= s"$k: $v\r\n" }
    h ++= s"Content-Length: ${block.length}\r\n"
    h ++= "\r\n"
    h.toString.getBytes(ISO_8859_1) ++ block ++ "\r\n\r\n".getBytes(ISO_8859_1)
  }

  private def httpBlock(status: Int, ct: String, body: String): Array[Byte] =
    (s"HTTP/1.1 $status OK\r\nContent-Type: $ct\r\nServer: x\r\n\r\n" + body)
      .getBytes(ISO_8859_1)

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("warc-fixture").toFile
    d.deleteOnExit()
    val r1 = record("warcinfo", "", "software: graft-test\r\n".getBytes(ISO_8859_1),
      Map("Content-Type" -> "application/warc-fields"))
    val r2 = record("request", "https://x.test/a",
      "GET /a HTTP/1.1\r\nHost: x.test\r\n\r\n".getBytes(ISO_8859_1),
      Map("Content-Type" -> "application/http; msgtype=request"))
    val r3 = record("response", "https://x.test/a",
      httpBlock(200, "text/html; charset=utf-8", "<html><p>hello &amp; bye</p></html>"),
      Map("Content-Type" -> "application/http; msgtype=response"))
    val r4 = record("response", "https://x.test/b",
      httpBlock(404, "text/plain", "gone"),
      Map("Content-Type" -> "application/http; msgtype=response"))
    // plain file: all four concatenated
    val plain = new FileOutputStream(new java.io.File(d, "part-0.warc"))
    try Seq(r1, r2, r3, r4).foreach(plain.write) finally plain.close()
    // gz file: each record its OWN gzip member, concatenated — the
    // Common Crawl framing the reader must stream through transparently
    val gz = new FileOutputStream(new java.io.File(d, "part-1.warc.gz"))
    try Seq(r1, r2, r3, r4).foreach { r =>
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos); g.write(r); g.close()
      gz.write(bos.toByteArray)
    } finally gz.close()
    d.getAbsolutePath
  }

  private def read(path: String) = spark.read.format("warc").load(path)

  test("parses WARC fields and splits application/http blocks") {
    val rows = read(s"$dir/part-0.warc").orderBy("warc_offset").collect()
    assert(rows.length == 4)
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ==
      Seq("warcinfo", "request", "response", "response"))
    val resp = rows(2)
    assert(resp.getAs[String]("target_uri") == "https://x.test/a")
    assert(resp.getAs[Int]("http_status") == 200)
    assert(resp.getAs[String]("http_content_type") == "text/html; charset=utf-8")
    assert(new String(resp.getAs[Array[Byte]]("payload"), ISO_8859_1) ==
      "<html><p>hello &amp; bye</p></html>")
    assert(resp.getAs[String]("warc_date") == "2026-08-14T00:00:00Z")
    // non-http block: payload is the whole record block
    assert(new String(rows(0).getAs[Array[Byte]]("payload"), ISO_8859_1)
      .startsWith("software:"))
    // request records are http too — the GET line is the status-line slot
    // but doesn't start with HTTP/, so the block stays whole
    assert(new String(rows(1).getAs[Array[Byte]]("payload"), ISO_8859_1)
      .startsWith("GET /a"))
  }

  test("per-record gzip members stream transparently; offsets are decompressed positions") {
    val plain = read(s"$dir/part-0.warc").orderBy("warc_offset").collect()
    val gz = read(s"$dir/part-1.warc.gz").orderBy("warc_offset").collect()
    assert(gz.length == 4)
    // same decompressed byte layout → identical offsets and fields
    for ((p, g) <- plain.zip(gz)) {
      assert(p.getAs[Long]("warc_offset") == g.getAs[Long]("warc_offset"))
      assert(p.getAs[String]("record_id") == g.getAs[String]("record_id"))
    }
  }

  test("zstd-compressed WARC streams transparently") {
    val src = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/part-0.warc"))
    val zdir = java.nio.file.Files.createTempDirectory("warc-zst").toFile
    zdir.deleteOnExit()
    val zf = new java.io.File(zdir, "part-2.warc.zst")
    val out = new com.github.luben.zstd.ZstdOutputStreamNoFinalizer(
      new FileOutputStream(zf), 3)
    out.write(src); out.close()
    val rows = read(zf.getAbsolutePath).orderBy("warc_offset").collect()
    assert(rows.length == 4)
    assert(rows(2).getAs[Int]("http_status") == 200)
  }

  test("types option filters at parse time") {
    val df = spark.read.format("warc").option("types", "response").load(s"$dir/part-0.warc")
    assert(df.select("warc_type").distinct().collect().map(_.getString(0)).toSeq ==
      Seq("response"))
    assert(df.count() == 2)
  }

  test("column pruning reaches the scan: metadata-only query skips payload bytes") {
    val df = read(s"$dir/part-0.warc").select("target_uri", "content_length")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("target_uri") && !p.contains("payload"),
      s"payload must be pruned out of the scan:\n$p")
    val uris = df.collect().map(_.getString(0))
    assert(uris.count(_ != null) == 3)
  }

  test("one partition per file; directory and glob loads") {
    val all = read(dir) // directory
    assert(all.rdd.getNumPartitions == 2)
    assert(all.count() == 8)
    assert(read(s"$dir/*.warc.gz").count() == 4) // glob
    // provenance columns carry the file
    assert(all.select("warc_file").distinct().count() == 2)
  }

  test("HTML extraction composes over the payload — crawl to clean text") {
    val text = spark.read.format("warc").option("types", "response").load(dir)
      .filter(col("http_status") === 200)
      .select(graft.functions.TextFunctions.htmlToText(
        col("payload").cast("string")).as("text"))
      .collect().map(_.getString(0))
    assert(text.toSeq == Seq("hello & bye", "hello & bye"))
  }

  test("WARC on the TOML surface: declared [fields] select from the warc " +
      "schema into the string record model, Types filters at parse time, " +
      "unknown fields are loud") {
    val toml =
      s"""[fields]
         |names = ["target_uri", "http_status", "payload"]
         |[input]
         |name = "WARC"
         |  [input.config]
         |  Path = "$dir/part-0.warc"
         |  Types = "response"
         |[[filter]]
         |name = "SqlWhere"
         |  [filter.config]
         |  Where = "cast(http_status as int) = 200"
         |[output]
         |name = "Nop"
         |fields = ["target_uri", "payload"]
         |""".stripMargin
    val rows = graft.topology.Topology.compileToml(spark, toml)
      .projected.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(0) == "https://x.test/a")
    // payload lands as decoded text — the record model is strings
    assert(rows(0).getString(1) == "<html><p>hello &amp; bye</p></html>")
    // a field outside the warc schema fails at compile, not as an empty column
    val bad = toml.replace("\"http_status\"", "\"no_such_field\"")
    val e = intercept[Exception](graft.topology.Topology.compileToml(spark, bad))
    assert(e.getMessage.contains("no_such_field"))
  }

  test("binary / non-UTF8 payloads: never skipped — byte-exact on the " +
      "DSv2 binary column, U+FFFD replacement on the TOML string " +
      "surface, entity-level Content-Encoding NOT decompressed") {
    val d = java.nio.file.Files.createTempDirectory("warc-bin").toFile
    d.deleteOnExit()
    // a real crawl segment carries binary responses: gzip magic, NULs,
    // invalid UTF-8 sequences. 0x1f and 0x00 are VALID (control) UTF-8;
    // 0x8b, 0xff, 0xfe are not.
    val binBody = "BINHEAD".getBytes(ISO_8859_1) ++
      Array[Byte](0x1f, 0x8b.toByte, 0x00, 0xff.toByte, 0xfe.toByte) ++
      "TAIL".getBytes(ISO_8859_1)
    val head = ("HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n" +
      "Content-Encoding: gzip\r\n\r\n").getBytes(ISO_8859_1)
    val rec = record("response", "https://x.test/bin", head ++ binBody,
      Map("Content-Type" -> "application/http; msgtype=response"))
    val f = new FileOutputStream(new java.io.File(d, "bin.warc"))
    try f.write(rec) finally f.close()
    // DSv2: the payload column is BINARY and byte-exact — the reader
    // does NOT decompress entity-level Content-Encoding (member-level
    // warc.gz framing is a different, handled layer); a pipeline that
    // wants the entity bytes inflated gates on http headers and does it
    // explicitly
    val dsv2 = read(s"${d.getAbsolutePath}/bin.warc")
      .select("target_uri", "payload", "http_content_type").collect()
    assert(dsv2.length == 1, "a binary response must not be skipped")
    assert(java.util.Arrays.equals(
      dsv2(0).getAs[Array[Byte]]("payload"), binBody))
    // TOML surface: the string record model wraps the same bytes; at
    // the JVM boundary invalid UTF-8 sequences surface as U+FFFD
    // replacement characters (one per malformed unit — the standard
    // decoder policy), valid ASCII (controls and NUL included) passes
    // through, and the record still flows so downstream gates can
    // match/drop it explicitly
    val toml =
      s"""[fields]
         |names = ["target_uri", "payload"]
         |[input]
         |name = "WARC"
         |  [input.config]
         |  Path = "${d.getAbsolutePath}/bin.warc"
         |  Types = "response"
         |[[filter]]
         |name = "RegexMatch"
         |  [filter.config]
         |  Fields = ["payload"]
         |  Regexs = ["BINHEAD"]
         |[output]
         |name = "Nop"
         |fields = ["target_uri", "payload"]
         |""".stripMargin
    val rows = graft.topology.Topology.compileToml(spark, toml)
      .projected.collect()
    assert(rows.length == 1, "a binary payload must still be gateable")
    assert(rows(0).getString(1) ==
      "BINHEAD\u001f\ufffd\u0000\ufffd\ufffdTAIL")
  }

  test("truncated record fails loud with file and offset") {
    val d = java.nio.file.Files.createTempDirectory("warc-bad").toFile
    d.deleteOnExit()
    val bad = record("response", "https://x.test/c",
      httpBlock(200, "text/plain", "body")).dropRight(20)
    val f = new FileOutputStream(new java.io.File(d, "bad.warc"))
    try f.write(bad) finally f.close()
    val e = intercept[org.apache.spark.SparkException] {
      read(s"${d.getAbsolutePath}/bad.warc").collect()
    }
    assert(e.getMessage.contains("bad.warc") ||
      Option(e.getCause).exists(_.getMessage.contains("truncated")))
  }
}
