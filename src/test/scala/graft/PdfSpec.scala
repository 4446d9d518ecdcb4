package graft

import java.nio.charset.StandardCharsets.ISO_8859_1

import graft.llm.Pdf

/** PDF text extraction: stream framing, FlateDecode, the literal-string
  * escape table, nested parens, hex strings, TJ piece grouping, BT/ET
  * block joining, and the never-throw contract on garbage.
  */
class PdfSpec extends SparkSpec {

  private def deflate(s: String): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(ISO_8859_1)); d.finish()
    val buf = new Array[Byte](4096)
    val n = d.deflate(buf)
    d.end()
    java.util.Arrays.copyOf(buf, n)
  }

  private def pdf(streams: (String, Option[Array[Byte]])*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.4\n".getBytes(ISO_8859_1))
    streams.zipWithIndex.foreach { case ((dict, data), i) =>
      val bytes = data.getOrElse(dict.getBytes(ISO_8859_1))
      val d = if (data.isDefined) s"<< /Length ${bytes.length} /Filter /FlateDecode >>"
      else s"<< /Length ${bytes.length} >>"
      out.write(s"${i + 1} 0 obj\n$d\nstream\n".getBytes(ISO_8859_1))
      out.write(bytes)
      out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    }
    out.write("%%EOF\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  test("literal strings, escapes, octal, nested parens, hex, TJ grouping") {
    val content = "BT /F1 12 Tf 72 720 Td (hello world) Tj " +
      "(esc \\(a\\) \\\\ \\101\\n) Tj [(ker) -250 (ned)] TJ <48492121> Tj ET\n" +
      "BT (second block) Tj ET"
    val got = Pdf.extractText(pdf(content -> None))
    assert(got.contains(
      "hello world esc (a) \\ A\n kerned HI!!\nsecond block"))
  }

  test("balanced nested parens without escapes") {
    val got = Pdf.extractText(pdf("BT (a (nested (deep)) done) Tj ET" -> None))
    assert(got.contains("a (nested (deep)) done"))
  }

  test("FlateDecode streams inflate; mixed with uncompressed streams") {
    val flate = deflate("BT (flate text works) Tj ET")
    val got = Pdf.extractText(pdf(
      "BT (plain first) Tj ET" -> None,
      "" -> Some(flate)))
    assert(got.contains("plain first\nflate text works"))
  }

  /** A raw object with an arbitrary dictionary string — for filter/ObjStm
    * cases the flate-or-raw [[pdf]] helper can't express.
    */
  private def pdfObj(dict: String, bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("%PDF-1.5\n".getBytes(ISO_8859_1))
    out.write(s"1 0 obj\n$dict\nstream\n".getBytes(ISO_8859_1))
    out.write(bytes)
    out.write("\nendstream\nendobj\n%%EOF\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  test("non-Flate/LZW filtered streams are SKIPPED, not walked raw: binary " +
      "data with accidental BT/ET bytes injects nothing") {
    // a fake JPEG body whose bytes happen to contain a BT…ET pair with a
    // paren string between — walked raw this would pollute the extraction
    val binary = Array[Byte](0xFF.toByte, 0xD8.toByte) ++
      "BT (binary garbage) Tj ET".getBytes(ISO_8859_1) ++
      Array[Byte](0xFF.toByte, 0xD9.toByte)
    val doc = Pdf.extractText(pdfObj(
      s"<< /Length ${binary.length} /Filter /DCTDecode >>", binary))
    assert(doc.isEmpty)
    // a chain whose bytes are INVALID for its first filter skips (raw
    // deflate is not ASCII85 text) — corrupt chains drop, never garble
    val chained = deflate("BT (chained) Tj ET")
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${chained.length} /Filter [/ASCII85Decode /FlateDecode] >>",
      chained)).isEmpty)
    // predictor'd Flate whose decompressed bytes don't tile into whole
    // (rowLen+1)-byte rows skips (18 bytes against /Columns 4)
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${chained.length} /Filter /FlateDecode " +
        "/DecodeParms << /Predictor 12 /Columns 4 >> >>", chained)).isEmpty)
    // an INDIRECT /Filter value (legal per §7.3.8.2) means the stream is
    // filtered in a way we cannot resolve — skip, never walk raw (the
    // still-compressed bytes could carry accidental BT…ET pairs)
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${binary.length} /Filter 2 0 R >>", binary)).isEmpty)
    // and a skipped stream doesn't take the rest of the document with it
    val mixed = new java.io.ByteArrayOutputStream()
    mixed.write(pdfObj(s"<< /Length ${binary.length} /Filter /DCTDecode >>",
      binary).dropRight(6).toArray) // keep %%EOF off, append a text object
    mixed.write(("2 0 obj\n<< /Length 20 >>\nstream\n" +
      "BT (kept) Tj ET\nendstream\nendobj\n%%EOF\n").getBytes(ISO_8859_1))
    assert(Pdf.extractText(mixed.toByteArray).contains("kept"))
  }

  test("filter chains decode in array order: ASCII85→Flate, Hex→Flate; " +
      "ASCIIHex/ASCII85/RunLength stand alone; unknown link skips the chain") {
    val text = "BT (chain decoded text) Tj ET"
    val fl = deflate(text)
    // [/ASCII85Decode /FlateDecode]: 85-decode first, then inflate
    val a85 = Pdf.ascii85Encode(fl)
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${a85.length} /Filter [/ASCII85Decode /FlateDecode] >>",
      a85)).contains("chain decoded text"))
    // hex → flate, with whitespace and the '>' terminator
    val hex = fl.map(b => f"${b & 0xFF}%02X").mkString("", " ", ">")
      .getBytes(ISO_8859_1)
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${hex.length} /Filter [/ASCIIHexDecode /FlateDecode] >>",
      hex)).contains("chain decoded text"))
    // standalone ASCIIHexDecode, lowercase digits
    val hexOnly = (text.getBytes(ISO_8859_1).map(b => f"${b & 0xFF}%02x")
      .mkString + ">").getBytes(ISO_8859_1)
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${hexOnly.length} /Filter /ASCIIHexDecode >>", hexOnly))
      .contains("chain decoded text"))
    // standalone ASCII85 with 'z' shorthand absent, partial final group
    val a85only = Pdf.ascii85Encode(text.getBytes(ISO_8859_1))
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${a85only.length} /Filter /ASCII85Decode >>", a85only))
      .contains("chain decoded text"))
    // RunLengthDecode: literal run + repeat run + EOD
    val rl = new java.io.ByteArrayOutputStream()
    val lit = "BT (rle ".getBytes(ISO_8859_1)
    rl.write(lit.length - 1); rl.write(lit)
    rl.write(257 - 4); rl.write('x') // "xxxx"
    val tail = " text) Tj ET".getBytes(ISO_8859_1)
    rl.write(tail.length - 1); rl.write(tail)
    rl.write(128)
    val rlb = rl.toByteArray
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${rlb.length} /Filter /RunLengthDecode >>", rlb))
      .contains("rle xxxx text"))
    // an unknown link anywhere in the chain skips the whole stream
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${a85.length} /Filter [/ASCII85Decode /DCTDecode] >>",
      a85)).isEmpty)
  }

  test("PNG predictors un-apply after Flate (Up/Sub/Paeth rows); TIFF " +
      "predictor 2; geometry mismatch skips") {
    val text = "BT (predictor text works) Tj ETpad" // 34 bytes
    val raw = text.getBytes(ISO_8859_1)
    assert(raw.length % 17 == 0) // tiles into 2 rows of /Columns 17
    val up = deflate(new String(Pdf.pngPredictUp(raw, 17), ISO_8859_1))
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${up.length} /Filter /FlateDecode /DecodeParms " +
        "<< /Predictor 12 /Columns 17 >> >>", up))
      .contains("predictor text works"))
    // Sub/None/Average/Paeth rows: encode by directly building filtered
    // rows (None rows = type-0 prefix, trivially correct to un-apply)
    val none = deflate(new String(
      raw.grouped(17).flatMap(r => Array[Byte](0) ++ r).toArray, ISO_8859_1))
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${none.length} /Filter /FlateDecode /DecodeParms " +
        "<< /Predictor 15 /Columns 17 >> >>", none))
      .contains("predictor text works"))
    // TIFF predictor 2: horizontal differencing at 8-bit
    val tiff = raw.grouped(17).flatMap { row =>
      row.zipWithIndex.map { case (b, i) =>
        if (i == 0) b else ((b - row(i - 1)) & 0xFF).toByte }
    }.toArray
    val tfl = deflate(new String(tiff, ISO_8859_1))
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${tfl.length} /Filter /FlateDecode /DecodeParms " +
        "<< /Predictor 2 /Columns 17 >> >>", tfl))
      .contains("predictor text works"))
    // geometry that doesn't tile → skip, never garble
    val bad = deflate(text.take(20))
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${bad.length} /Filter /FlateDecode /DecodeParms " +
        "<< /Predictor 12 /Columns 17 >> >>", bad)).isEmpty)
  }

  test("LZWDecode streams decode; corrupt LZW drops") {
    val text = "BT (lzw stream text works) Tj ET"
    val enc = Pdf.lzwEncodeLiteral(text.getBytes(ISO_8859_1))
    val got = Pdf.extractText(pdfObj(
      s"<< /Length ${enc.length} /Filter /LZWDecode >>", enc))
    assert(got.contains("lzw stream text works"))
    // width sync across the 9→10-bit boundary: payload longer than 253
    // literals (the first widen point)
    val long = "BT (" + ("x" * 400) + ") Tj ET"
    val encLong = Pdf.lzwEncodeLiteral(long.getBytes(ISO_8859_1))
    assert(Pdf.extractText(pdfObj(
      s"<< /Length ${encLong.length} /Filter /LZWDecode >>", encLong))
      .contains("x" * 400))
    // corrupt: a code far ahead of the table → stream drops, no throw
    assert(Pdf.extractText(pdfObj(
      "<< /Length 4 /Filter /LZWDecode >>",
      Array[Byte](0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))).isEmpty)
  }

  /** An /ObjStm container holding `objs` (objnum → body), header pairs at
    * /First per PDF 32000-1 §7.5.7.
    */
  private def objStm(objs: Seq[(Int, String)]): (String, Array[Byte]) = {
    val offsets = objs.map(_._2.getBytes(ISO_8859_1).length)
      .scanLeft(0)(_ + _).init
    val header = objs.zip(offsets)
      .map { case ((num, _), off) => s"$num $off" }.mkString(" ") + " "
    (header, (header + objs.map(_._2).mkString).getBytes(ISO_8859_1))
  }

  test("object streams: embedded text objects extract (Flate and raw)") {
    val (header, payload) = objStm(Seq(
      2 -> "<< /Type /Font >>",
      3 -> "BT (hidden in objstm) Tj ET",
      4 -> "(outside bt ignored)"))
    // uncompressed ObjStm (no /Filter): split by /N //First, bodies walked
    val rawDoc = pdfObj(s"<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${payload.length} >>", payload)
    assert(Pdf.extractText(rawDoc).contains("hidden in objstm"))
    // the mainstream shape: Flate-compressed ObjStm
    val flated = {
      val d = new java.util.zip.Deflater()
      d.setInput(payload); d.finish()
      val buf = new Array[Byte](8192)
      val n = d.deflate(buf); d.end()
      java.util.Arrays.copyOf(buf, n)
    }
    val flateDoc = pdfObj(s"<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${flated.length} /Filter /FlateDecode >>", flated)
    assert(Pdf.extractText(flateDoc).contains("hidden in objstm"))
    // malformed header (offset past the payload) degrades to whole-walk
    val badDoc = pdfObj(s"<< /Type /ObjStm /N 2 /First 99999 " +
      s"/Length ${payload.length} >>", payload)
    assert(Pdf.extractText(badDoc).contains("hidden in objstm"))
  }

  test("strings outside BT/ET are ignored; dict << >> inside streams skipped") {
    val got = Pdf.extractText(pdf(
      "(not shown) BT (shown) Tj << /X (nope) >> ET (also not)" -> None))
    // strings inside the BT..ET block are collected even as dict values —
    // the documented naive tier; outside the block nothing is
    assert(got.contains("shown nope"))
  }

  test("garbage, empty, truncated and non-PDF payloads never throw") {
    assert(Pdf.extractText(null).isEmpty)
    assert(Pdf.extractText(Array.empty[Byte]).isEmpty)
    assert(Pdf.extractText("not a pdf at all".getBytes(ISO_8859_1)).isEmpty)
    assert(Pdf.extractText("%PDF-1.4\nstream\n(x".getBytes(ISO_8859_1)).isEmpty ||
      true) // truncated: any non-throwing result is acceptable
    val corrupt = pdf("" -> Some(Array[Byte](1, 2, 3, 4)))
    assert(Pdf.extractText(corrupt).isEmpty) // bad zlib drops the stream
    // a PDF with streams but no text objects
    assert(Pdf.extractText(pdf("0 0 m 100 100 l S" -> None)).isEmpty)
  }

  test("withPdfText keeps all record fields; KeepUndecodable passes junk " +
      "through with an empty text") {
    import spark.implicits._
    def b64(b: Array[Byte]) = java.util.Base64.getEncoder.encodeToString(b)
    val rows = Seq(
      ("a", b64(pdf("BT (alpha text) Tj ET" -> None)), "x1"),
      ("b", b64("not a pdf".getBytes(ISO_8859_1)), "x2"))
      .toDF("id", "payload", "extra")
    val strict = Pdf.withPdfText(rows, "payload", "text")
      .select("id", "extra", "text")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(strict == Set(("a", "x1", "alpha text")))
    val kept = Pdf.withPdfText(rows, "payload", "text", keepUndecodable = true)
      .select("id", "text")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept == Set(("a", "alpha text"), ("b", "")))
    // overwrite mode: DstField == SrcField
    val over = Pdf.withPdfText(rows, "payload", "payload")
      .select("id", "payload").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(over == Set(("a", "alpha text")))
  }

  test("PdfExtract TOML filter over WebDataset BinaryFields, end to end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pdf-toml").toFile
    val bos = new java.io.ByteArrayOutputStream()
    graft.sources.TarShards.writeEntry(bos, "0001.pdf",
      pdf("BT (config reachable pdf) Tj ET" -> None))
    graft.sources.TarShards.writeEntry(bos, "0002.pdf",
      "junk bytes".getBytes(ISO_8859_1))
    bos.write(new Array[Byte](1024))
    val f = new java.io.FileOutputStream(new java.io.File(dir, "s0.tar"))
    f.write(bos.toByteArray); f.close()
    val toml =
      s"""[fields]
         |names = ["key", "pdf", "text"]
         |[input]
         |name = "WebDataset"
         |  [input.config]
         |  Path = "${dir.getAbsolutePath}"
         |  BinaryFields = ["pdf"]
         |[[filter]]
         |name = "PdfExtract"
         |  [filter.config]
         |  SrcField = "pdf"
         |  DstField = "text"
         |[output]
         |name = "Recorder"
         |fields = ["key", "text"]
         |""".stripMargin
    graft.topology.Topology.compileToml(spark, toml, env = Map.empty).run()
    val rows = graft.topology.BuiltinComponents.Recorder.last
      .map(r => (r(0), r(1))).toSet
    assert(rows == Set(("0001", "config reachable pdf")))
  }

  test("pdfTexts: distributed map-only extraction, undecodable rows drop") {
    import spark.implicits._
    val rows = Seq(
      (1L, pdf("BT (doc one) Tj ET" -> None)),
      (2L, "junk".getBytes(ISO_8859_1)),
      (3L, pdf("BT (doc three) Tj ET" -> None)))
    val got = Pdf.pdfTexts(rows.toDF("doc_id", "payload"), "doc_id", "payload")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got == Map(1L -> "doc one", 3L -> "doc three"))
    val plan = Pdf.pdfTexts(rows.toDF("doc_id", "payload"), "doc_id", "payload")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }
}
