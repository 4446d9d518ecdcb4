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
    * when the dict names NO filter; filter CHAINS (e.g.
    * `[/ASCII85Decode /FlateDecode]`) decode in array order (PDF 32000-1
    * §7.3.8.2 — the first named filter decodes the stream bytes first);
    * `/Predictor` ≥ 2 un-applies after the Flate/LZW stage it
    * parameterizes. Any filter this walker cannot turn back into text
    * (DCT/JPX/JBIG2/Crypt…) → None — compressed binary routinely contains
    * accidental `BT`…`ET` byte pairs, so it must not be scanned as text.
    * A `/Filter` entry that is PRESENT but unparseable (an indirect
    * `/Filter 2 0 R` value, legal per §7.3.8.2) also returns None: the
    * stream IS filtered, we just cannot tell how — walking it raw would
    * be exactly the garbage injection the skip stance exists to prevent.
    */
  private def decodeStream(dict: String, raw: Array[Byte]): Option[Array[Byte]] = {
    val names = FilterEntry.findFirstMatchIn(dict) match {
      case None =>
        return if (dict.contains("/Filter")) None // indirect/unparseable
               else Some(raw) // no /Filter: stream data IS the bytes
      case Some(m) => NameToken.findAllMatchIn(m.group(1)).map(_.group(1)).toList
    }
    names.foldLeft(Option(raw)) { (acc, name) =>
      acc.flatMap { data =>
        name match {
          // abbreviated names are the inline-image aliases (§8.9.7 table
          // 94); honoring them costs nothing and some writers leak them
          // into stream dicts
          case "FlateDecode" | "Fl"     => inflate(data).flatMap(unpredict(dict, _))
          case "LZWDecode" | "LZW"      => lzwDecode(data).flatMap(unpredict(dict, _))
          case "ASCIIHexDecode" | "AHx" => asciiHexDecode(data)
          case "ASCII85Decode" | "A85"  => ascii85Decode(data)
          case "RunLengthDecode" | "RL" => runLengthDecode(data)
          case _ => None // DCT/JPX/JBIG2/CCITT/Crypt…: not text, skip
        }
      }
    }
  }

  /** Un-apply the stream's `/Predictor` to decompressed Flate/LZW bytes
    * (PDF 32000-1 §7.4.4.4): 1 (or absent) = none; 2 = TIFF horizontal
    * differencing (8-bit components only — other depths skip); ≥ 10 =
    * the PNG per-row filters (None/Sub/Up/Average/Paeth, RFC 2083 §6),
    * one filter-type byte per row. Geometry comes from /Columns /Colors
    * /BitsPerComponent (defaults 1, 1, 8); data that does not tile into
    * whole rows → None, the never-throw skip contract.
    */
  private def unpredict(dict: String, data: Array[Byte]): Option[Array[Byte]] = {
    val predictor = intKey(dict, "/Predictor").getOrElse(1L)
    if (predictor <= 1) return Some(data)
    val columns = intKey(dict, "/Columns").getOrElse(1L).toInt
    val colors = intKey(dict, "/Colors").getOrElse(1L).toInt
    val bpc = intKey(dict, "/BitsPerComponent").getOrElse(8L).toInt
    if (columns <= 0 || colors <= 0 || bpc <= 0) return None
    if (predictor == 2L) {
      if (bpc != 8) return None // sub-byte TIFF differencing: skip
      val rowLen = columns * colors
      if (rowLen <= 0 || data.length % rowLen != 0) return None
      val out = data.clone()
      var r = 0
      while (r < out.length) {
        var i = colors
        while (i < rowLen) {
          out(r + i) = (out(r + i) + out(r + i - colors)).toByte
          i += 1
        }
        r += rowLen
      }
      Some(out)
    } else if (predictor >= 10L) {
      val bpp = math.max(1, colors * bpc / 8) // bytes per pixel, floor 1
      val rowLen = (columns * colors * bpc + 7) / 8
      if (rowLen <= 0 || data.length % (rowLen + 1) != 0) return None
      val rows = data.length / (rowLen + 1)
      val out = new Array[Byte](rows * rowLen)
      var r = 0
      while (r < rows) {
        val ft = data(r * (rowLen + 1)) & 0xFF
        val src = r * (rowLen + 1) + 1
        val dst = r * rowLen
        val prior = dst - rowLen // valid only when r > 0
        var i = 0
        while (i < rowLen) {
          val x = data(src + i) & 0xFF
          val a = if (i >= bpp) out(dst + i - bpp) & 0xFF else 0
          val b = if (r > 0) out(prior + i) & 0xFF else 0
          val c = if (r > 0 && i >= bpp) out(prior + i - bpp) & 0xFF else 0
          val v = ft match {
            case 0 => x // None
            case 1 => x + a // Sub
            case 2 => x + b // Up
            case 3 => x + (a + b) / 2 // Average
            case 4 => // Paeth
              val p = a + b - c
              val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
              x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c)
            case _ => return None // unknown row filter: corrupt
          }
          out(dst + i) = (v & 0xFF).toByte
          i += 1
        }
        r += 1
      }
      Some(out)
    } else None // predictors 3..9 are not defined
  }

  /** ASCIIHexDecode (§7.4.2): hex pairs, whitespace skipped, `>` ends the
    * data (odd digit count pads a trailing 0). Non-hex byte → None.
    */
  private def asciiHexDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 1)
    var hi = -1
    var i = 0
    while (i < data.length) {
      val c = data(i).toChar
      if (c == '>') {
        if (hi >= 0) out.write(hi << 4) // odd count: pad 0
        return Some(out.toByteArray)
      } else if (!c.isWhitespace) {
        val d = Character.digit(c, 16)
        if (d < 0) return None
        if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
      }
      i += 1
    }
    if (hi >= 0) out.write(hi << 4)
    Some(out.toByteArray) // missing '>' tolerated: data simply ends
  }

  /** ASCII85Decode (§7.4.3): 5 chars `!`..`u` → 4 bytes base-85; `z` = 4
    * zero bytes (whole-group shorthand only); whitespace skipped; `~>`
    * ends the data; a trailing partial group of n chars yields n−1 bytes
    * (padded with `u` per spec). Out-of-range byte or lone-`z`-in-group →
    * None.
    */
  private def ascii85Decode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 4 / 5 + 4)
    val grp = new Array[Int](5)
    var n = 0
    def flush(count: Int): Boolean = { // count = chars in group (2..5)
      if (count < 2) return count == 0
      var acc = 0L
      var i = 0
      while (i < 5) { acc = acc * 85 + (if (i < count) grp(i) else 84); i += 1 }
      var j = 0
      while (j < count - 1) { out.write(((acc >> (24 - 8 * j)) & 0xFF).toInt); j += 1 }
      true
    }
    var i = 0
    while (i < data.length) {
      val c = data(i).toChar
      if (c == '~') return if (flush(n)) Some(out.toByteArray) else None
      else if (c == 'z') {
        if (n != 0) return None // z inside a group: corrupt
        out.write(0); out.write(0); out.write(0); out.write(0)
      } else if (!c.isWhitespace) {
        if (c < '!' || c > 'u') return None
        grp(n) = c - '!'; n += 1
        if (n == 5) { if (!flush(5)) return None; n = 0 }
      }
      i += 1
    }
    if (flush(n)) Some(out.toByteArray) else None // missing '~>' tolerated
  }

  /** RunLengthDecode (§7.4.5): length byte L — 0..127 copies the next
    * L+1 bytes literally, 129..255 repeats the next byte 257−L times,
    * 128 = EOD. A literal run past the buffer → None.
    */
  private def runLengthDecode(data: Array[Byte]): Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(data.length * 2)
    var i = 0
    while (i < data.length) {
      val l = data(i) & 0xFF
      if (l == 128) return Some(out.toByteArray)
      else if (l < 128) {
        if (i + 1 + l + 1 > data.length) return None
        out.write(data, i + 1, l + 1)
        i += l + 2
      } else {
        if (i + 1 >= data.length) return None
        var k = 257 - l
        while (k > 0) { out.write(data(i + 1)); k -= 1 }
        i += 2
      }
    }
    Some(out.toByteArray) // missing EOD tolerated
  }

  /** ASCII85-ENCODE `data` (with the `~>` terminator, no `z`
    * shorthand) — a fixture encoder for PdfSpec and the q_pdf_chain
    * oracle fixture, the [[lzwEncodeLiteral]] discipline.
    */
  private[graft] def ascii85Encode(data: Array[Byte]): Array[Byte] = {
    val out = new StringBuilder
    var i = 0
    while (i < data.length) {
      val count = math.min(4, data.length - i)
      var acc = 0L
      var j = 0
      while (j < 4) {
        acc = (acc << 8) | (if (j < count) data(i + j) & 0xFF else 0); j += 1
      }
      val cs = new Array[Char](5)
      var k = 4
      while (k >= 0) { cs(k) = ('!' + (acc % 85)).toChar; acc /= 85; k -= 1 }
      out.appendAll(cs, 0, count + 1)
      i += 4
    }
    out.append("~>")
    out.toString.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  /** PNG-predict `data` with the Up filter (type 2) at `columns` bytes
    * per row — the inverse of [[unpredict]]'s PNG path, for fixtures
    * (`data.length` must tile into whole rows).
    */
  private[graft] def pngPredictUp(data: Array[Byte], columns: Int): Array[Byte] = {
    require(columns > 0 && data.length % columns == 0,
      s"pngPredictUp: ${data.length} bytes do not tile into $columns-byte rows")
    val rows = data.length / columns
    val out = new Array[Byte](rows * (columns + 1))
    var r = 0
    while (r < rows) {
      out(r * (columns + 1)) = 2 // Up
      var i = 0
      while (i < columns) {
        val cur = data(r * columns + i) & 0xFF
        val above = if (r > 0) data((r - 1) * columns + i) & 0xFF else 0
        out(r * (columns + 1) + 1 + i) = ((cur - above) & 0xFF).toByte
        i += 1
      }
      r += 1
    }
    out
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
