package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PDF text extraction — pure-JVM byte walking of PDF content streams,
  * the same engineering discipline as the ISO-BMFF/EBML/JPEG walkers in
  * [[Multimodal.JvmCodecs]]: no external codec library, deterministic
  * output, undecodable payloads drop (never throw). PDFs are a top-3
  * training-data source; this covers the mainstream text-object layout:
  *
  *  - content streams located by `stream`…`endstream` framing, the
  *    object dictionary read back to the enclosing `obj` for the
  *    `/Filter` entry: unfiltered streams walk raw, `/FlateDecode`
  *    inflates with the JDK's zlib, `/LZWDecode` decodes with the PDF
  *    LZW variant below; any OTHER filter (DCTDecode/JPXDecode/
  *    ASCII85…), filter CHAINS, predictor'd streams and encrypted
  *    documents are SKIPPED, not errors — a compressed binary payload
  *    routinely contains accidental `BT`…`ET` byte pairs, so walking it
  *    raw would inject garbage blocks into extracted training text;
  *  - object streams (`/Type /ObjStm`, PDF 1.5+): the decoded container
  *    is split by its `/N` (objnum, offset) header pairs at `/First`,
  *    and each embedded object body is walked for text blocks like a
  *    content stream — text an ObjStm-packed document carries is no
  *    longer silently extracted as empty;
  *  - show-text collected between `BT`…`ET`: literal strings `(…)` with
  *    balanced nested parens and the full escape table (`\n \r \t \b \f
  *    \( \) \\`, 1-3 digit octal, line continuations), hex strings
  *    `<…>` (odd-length per spec pads a trailing 0);
  *  - one `TJ` array concatenates its strings into ONE piece (kerning
  *    splits mid-word); pieces join with a single space within a text
  *    object; text objects join with newlines. Positioning operators are
  *    deliberately not interpreted — this is the WET-style extraction
  *    tier (layout-reconstructing extraction is a codec-library job).
  *
  * Scale shape: map-only over (id, payload) in the typed partition path,
  * partition-batched like [[Multimodal.decodeImages]]; nothing shuffles,
  * nothing collects.
  */
object Pdf {

  /** Decoded content streams of a PDF: (dictText, bytes) per stream,
    * Flate-inflated when the dict names it. Not a PDF → Nil.
    */
  private def contentStreams(b: Array[Byte]): Seq[Array[Byte]] = {
    if (b.length < 8 || !asciiAt(b, 0, "%PDF-")) return Nil
    val out = Vector.newBuilder[Array[Byte]]
    var i = 0
    while (i < b.length - 6) {
      if (asciiAt(b, i, "stream") && !asciiAt(b, i - 3, "end")) {
        // data begins after "stream" + CRLF or LF (PDF 32000-1 §7.3.8.1)
        var ds = i + 6
        if (ds < b.length && b(ds) == '\r') ds += 1
        if (ds < b.length && b(ds) == '\n') ds += 1
        var de = indexOfAscii(b, ds, "endstream")
        if (de < 0) de = b.length
        var dataEnd = de
        // the spec's trailing EOL before "endstream" is not stream data
        if (dataEnd > ds && b(dataEnd - 1) == '\n') dataEnd -= 1
        if (dataEnd > ds && b(dataEnd - 1) == '\r') dataEnd -= 1
        // the object dictionary: back to the enclosing "obj" (or origin)
        val objAt = lastIndexOfAscii(b, i, "obj")
        val dict = new String(b, math.max(objAt, 0), i - math.max(objAt, 0),
          java.nio.charset.StandardCharsets.ISO_8859_1)
        val raw = java.util.Arrays.copyOfRange(b, ds, math.max(ds, dataEnd))
        decodeStream(dict, raw).foreach { data =>
          if (dict.contains("/ObjStm")) objStmBodies(dict, data).foreach(out += _)
          else out += data
        }
        i = de + 9
      } else i += 1
    }
    out.result()
  }

  private def asciiAt(b: Array[Byte], i: Int, s: String): Boolean =
    i >= 0 && i + s.length <= b.length &&
      (0 until s.length).forall(j => b(i + j) == s.charAt(j).toByte)

  private def indexOfAscii(b: Array[Byte], from: Int, s: String): Int = {
    var i = math.max(from, 0)
    while (i <= b.length - s.length) {
      if (asciiAt(b, i, s)) return i
      i += 1
    }
    -1
  }

  private def lastIndexOfAscii(b: Array[Byte], before: Int, s: String): Int = {
    var i = math.min(before, b.length) - s.length
    while (i >= 0) {
      if (asciiAt(b, i, s)) return i
      i -= 1
    }
    -1
  }

  /** zlib-inflate (FlateDecode); corrupt data → None, never a throw.
    * `end()` runs in a finally — the stalled/corrupt paths this
    * never-throw extractor exists for would otherwise leak each
    * Inflater's native zlib buffers until finalization.
    */
  private def inflate(data: Array[Byte]): Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](4096)
      while (!inf.finished() && !inf.needsInput()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (n == 0 && !inf.finished()) return None // stalled
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
    finally inf.end()
  }

  private val FilterEntry = """(?s)/Filter\s*(\[[^\]]*\]|/[A-Za-z0-9]+)""".r
  private val NameToken = """/([A-Za-z0-9]+)""".r

  /** Decoded bytes of one stream given its object-dictionary text: raw
    * when the dict names NO filter, inflated/LZW-decoded for a single
    * `/FlateDecode`/`/LZWDecode`, None for everything else (unknown
    * filters, chains, `/Predictor` > 1 — data this walker cannot turn
    * back into text, which must not be scanned as if it were).
    */
  private def decodeStream(dict: String, raw: Array[Byte]): Option[Array[Byte]] = {
    val names = FilterEntry.findFirstMatchIn(dict) match {
      case None => return Some(raw) // no /Filter: stream data IS the bytes
      case Some(m) => NameToken.findAllMatchIn(m.group(1)).map(_.group(1)).toList
    }
    val predictor = intKey(dict, "/Predictor").getOrElse(1L)
    if (predictor > 1) None
    else names match {
      case List("FlateDecode") => inflate(raw)
      case List("LZWDecode") => lzwDecode(raw)
      case _ => None
    }
  }

  /** Integer value of a `/Key N` dictionary entry (no reference-chasing —
    * a `/Key 3 0 R` indirect value returns None, skipping the stream).
    */
  private def intKey(dict: String, key: String): Option[Long] =
    (key + """\s+(\d+)(\s+\d+\s+R)?""").r.findFirstMatchIn(dict)
      .filter(_.group(2) == null).map(_.group(1).toLong)

  /** Embedded object bodies of a DECODED `/ObjStm` container: the first
    * `/First` bytes hold `/N` whitespace-separated (objnum, offset)
    * pairs, offsets relative to `/First`; bodies run between consecutive
    * offsets (PDF 32000-1 §7.5.7). A malformed header degrades to
    * walking the whole container — never a throw.
    */
  private def objStmBodies(dict: String, data: Array[Byte]): Seq[Array[Byte]] = {
    val parsed = for {
      n <- intKey(dict, "/N").map(_.toInt) if n > 0
      first <- intKey(dict, "/First").map(_.toInt)
      if first > 0 && first <= data.length
    } yield {
      val header = new String(data, 0, first,
        java.nio.charset.StandardCharsets.ISO_8859_1)
      val nums = header.trim.split("\\s+")
        .flatMap(s => scala.util.Try(s.toLong).toOption)
      val offsets = nums.grouped(2).collect { case Array(_, off) => off.toInt }
        .take(n).toArray
      if (offsets.isEmpty || offsets.exists(o => o < 0 || first + o > data.length))
        Seq(data)
      else offsets.zip(offsets.drop(1) :+ (data.length - first)).toSeq.map {
        case (from, until) =>
          java.util.Arrays.copyOfRange(data, first + from,
            math.max(first + from, math.min(first + until, data.length)))
      }
    }
    parsed.getOrElse(Seq(data))
  }

  /** PDF LZWDecode (PDF 32000-1 §7.4.4 with EarlyChange = 1, the
    * default): MSB-first variable-width codes 9→12 bits, 256 = clear
    * table, 257 = EOD, the code width growing one entry EARLY. Corrupt
    * data → None, never a throw — the [[inflate]] contract.
    */
  private def lzwDecode(data: Array[Byte]): Option[Array[Byte]] = {
    try {
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val table = new scala.collection.mutable.ArrayBuffer[Array[Byte]](4096)
      def reset(): Unit = {
        table.clear()
        var i = 0
        while (i < 256) { table += Array(i.toByte); i += 1 }
        table += null; table += null // 256 clear, 257 EOD
      }
      reset()
      var codeLen = 9
      var prev: Array[Byte] = null
      var acc = 0L
      var accBits = 0
      var i = 0
      var done = false
      while (!done && (accBits >= codeLen || i < data.length)) {
        while (accBits < codeLen && i < data.length) {
          acc = (acc << 8) | (data(i) & 0xFF); accBits += 8; i += 1
        }
        if (accBits < codeLen) done = true // trailing partial code: padding
        else {
          val code = ((acc >> (accBits - codeLen)) & ((1L << codeLen) - 1)).toInt
          accBits -= codeLen
          if (code == 256) { reset(); codeLen = 9; prev = null }
          else if (code == 257) done = true
          else {
            val entry =
              if (code < table.length && table(code) != null) table(code)
              else if (code == table.length && prev != null) prev :+ prev(0)
              else return None // code ahead of the table: corrupt
            out.write(entry, 0, entry.length)
            if (prev != null && table.length < 4096) table += (prev :+ entry(0))
            prev = entry
            // EarlyChange = 1: widen when the NEXT add would hit the limit
            if (codeLen < 12 && table.length + 1 >= (1 << codeLen)) codeLen += 1
          }
        }
      }
      Some(out.toByteArray)
    } catch { case _: Exception => None }
  }

  /** A VALID LZWDecode stream of `data` that never emits a match — the
    * clear code, each byte as a literal code, EOD — with the code width
    * widening exactly as [[lzwDecode]]'s table grows. A fixture encoder
    * (PdfSpec, the q_pdf_objstm oracle fixture), not a compressor.
    */
  private[graft] def lzwEncodeLiteral(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var acc = 0L
    var accBits = 0
    var codeLen = 9
    var tableLen = 258
    def put(code: Int): Unit = {
      acc = (acc << codeLen) | code; accBits += codeLen
      while (accBits >= 8) {
        out.write(((acc >> (accBits - 8)) & 0xFF).toInt); accBits -= 8
      }
    }
    put(256)
    var i = 0
    while (i < data.length) {
      put(data(i) & 0xFF)
      // mirror the decoder: after the first literal every code adds one
      // table entry; widen one early (EarlyChange = 1)
      if (i > 0 && tableLen < 4096) tableLen += 1
      if (codeLen < 12 && tableLen + 1 >= (1 << codeLen)) codeLen += 1
      i += 1
    }
    put(257)
    if (accBits > 0) out.write(((acc << (8 - accBits)) & 0xFF).toInt)
    out.toByteArray
  }

  /** Show-text pieces of one decoded content stream, grouped into text
    * objects: BT…ET blocks, literal/hex strings, TJ arrays as one piece.
    */
  private def textBlocks(s: Array[Byte]): Seq[Seq[String]] = {
    val blocks = Vector.newBuilder[Seq[String]]
    var pieces: Vector[String] = null // non-null inside BT…ET
    var arrayPiece: StringBuilder = null // non-null inside [ … ]
    var i = 0
    def emit(str: String): Unit =
      if (pieces != null) {
        if (arrayPiece != null) arrayPiece.append(str)
        else pieces :+= str
      }
    while (i < s.length) {
      val c = s(i).toChar
      if (c == 'B' && asciiAt(s, i, "BT")) { pieces = Vector.empty; i += 2 }
      else if (c == 'E' && asciiAt(s, i, "ET")) {
        if (pieces != null && pieces.nonEmpty) blocks += pieces
        pieces = null; arrayPiece = null; i += 2
      }
      else if (c == '[' && pieces != null) { arrayPiece = new StringBuilder; i += 1 }
      else if (c == ']' && pieces != null) {
        if (arrayPiece != null && arrayPiece.nonEmpty) pieces :+= arrayPiece.toString
        arrayPiece = null; i += 1
      }
      else if (c == '(') {
        val (str, next) = literalString(s, i + 1)
        emit(str); i = next
      }
      else if (c == '<' && i + 1 < s.length && s(i + 1) != '<') {
        val (str, next) = hexString(s, i + 1)
        emit(str); i = next
      }
      else if (c == '<') i += 2 // dict open "<<" inside a stream
      else i += 1
    }
    blocks.result()
  }

  /** PDF literal string from after '(' to its BALANCED ')'; returns
    * (decoded, index past the closing paren). Full escape table.
    */
  private def literalString(s: Array[Byte], from: Int): (String, Int) = {
    val out = new StringBuilder
    var depth = 1
    var i = from
    while (i < s.length && depth > 0) {
      val c = s(i).toChar
      if (c == '\\' && i + 1 < s.length) {
        val e = s(i + 1).toChar
        e match {
          case 'n' => out.append('\n'); i += 2
          case 'r' => out.append('\r'); i += 2
          case 't' => out.append('\t'); i += 2
          case 'b' => out.append('\b'); i += 2
          case 'f' => out.append('\f'); i += 2
          case '(' => out.append('('); i += 2
          case ')' => out.append(')'); i += 2
          case '\\' => out.append('\\'); i += 2
          case '\r' => i += 2; if (i < s.length && s(i) == '\n') i += 1 // continuation
          case '\n' => i += 2 // continuation
          case d if d >= '0' && d <= '7' =>
            var v = 0; var n = 0; i += 1
            while (n < 3 && i < s.length && s(i) >= '0' && s(i) <= '7') {
              v = v * 8 + (s(i) - '0'); i += 1; n += 1
            }
            out.append((v & 0xFF).toChar)
          case other => out.append(other); i += 2 // unknown: drop backslash
        }
      } else if (c == '(') { depth += 1; out.append(c); i += 1 }
      else if (c == ')') {
        depth -= 1
        if (depth > 0) out.append(c)
        i += 1
      } else { out.append(c); i += 1 }
    }
    (out.toString, i)
  }

  /** PDF hex string from after '<' to '>'; odd digit count pads 0. */
  private def hexString(s: Array[Byte], from: Int): (String, Int) = {
    val out = new StringBuilder
    val digits = new StringBuilder
    var i = from
    while (i < s.length && s(i) != '>') {
      val c = s(i).toChar
      if (Character.digit(c, 16) >= 0) digits.append(c)
      i += 1
    }
    if (digits.length % 2 == 1) digits.append('0')
    var j = 0
    while (j < digits.length) {
      out.append(Integer.parseInt(digits.substring(j, j + 2), 16).toChar)
      j += 2
    }
    (out.toString, i + 1)
  }

  /** Visible text of one PDF payload: text objects joined by newlines,
    * pieces within an object by single spaces. Not a PDF / no text →
    * None (the caller's rows drop, matching the media decoders).
    */
  def extractText(payload: Array[Byte]): Option[String] = {
    if (payload == null) return None
    val blocks = contentStreams(payload).flatMap(textBlocks)
    if (blocks.isEmpty) None
    else Some(blocks.map(_.mkString(" ")).mkString("\n"))
  }

  /** Record-preserving extraction for the TOML surface: appends (or
    * overwrites) `dstCol` with the text of the BASE64-encoded PDF in
    * `srcB64Col` (the WebDataset BinaryFields encoding — the string
    * record model would mangle raw PDF bytes). Payloads that are not a
    * PDF with text DROP, or pass through with an empty `dstCol` when
    * `keepUndecodable`. Map-only in the typed row path, the media-decoder
    * discipline.
    */
  def withPdfText(df: DataFrame, srcB64Col: String, dstCol: String,
      keepUndecodable: Boolean = false): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StringType
    val srcIx = df.schema.fieldIndex(srcB64Col)
    val replaceIx = if (df.columns.contains(dstCol)) df.schema.fieldIndex(dstCol) else -1
    val outSchema = if (replaceIx >= 0) df.schema
      else df.schema.add(dstCol, StringType, nullable = true)
    df.mapPartitions { it =>
      it.flatMap { row =>
        val b64 = row.get(srcIx)
        val text =
          if (b64 == null) None
          else try extractText(
            java.util.Base64.getMimeDecoder.decode(b64.toString))
          catch { case _: IllegalArgumentException => None }
        (text, keepUndecodable) match {
          case (None, false) => None
          case (t, _) =>
            val vals = row.toSeq.toArray
            val out = if (replaceIx >= 0) {
              vals(replaceIx) = t.getOrElse(""); vals
            } else vals :+ t.getOrElse("")
            Some(Row.fromSeq(out.toIndexedSeq))
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** (idCol, text) for every payload that IS a PDF with text — map-only,
    * partition-batched in the typed path like the image/audio decoders.
    */
  def pdfTexts(df: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.flatMap { case (id, p) =>
        extractText(p).map(t => (id, t))
      }))
      .toDF(idCol, "text")
  }
}
