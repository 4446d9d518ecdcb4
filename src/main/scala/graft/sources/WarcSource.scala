package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("warc")` — a DataSource V2 reader for WARC (Web
  * ARChive, ISO 28500) files, the container format of Common Crawl and
  * every large-scale web corpus: the raw input of an LLM training-data
  * pipeline before HTML extraction ([[graft.functions.TextFunctions.htmlToText]]).
  *
  * Spark-first design and the 100 TB contract:
  *  - **one InputPartition per file** — WARC's gzip framing is not
  *    block-splittable without an external index, and crawls ship as many
  *    ~1 GB files (Common Crawl: ~64 000 per monthly crawl), so file-level
  *    parallelism saturates any executor count; readers stream records
  *    with O(record) memory, never buffering a file;
  *  - **column pruning reaches the byte level** (SupportsPushDownRequiredColumns):
  *    when neither `payload` nor the `http_*` fields are required, each
  *    record's body is `skip`ped, not read — a metadata-only scan (URL
  *    census, dedup key extraction) touches headers only;
  *  - **Hadoop FileSystem API** end to end, so `file:`, `hdfs:`, and
  *    `s3a:` paths all work and the session's FS credentials ride along
  *    via the broadcast-serializable Configuration.
  *
  * Record grammar (ISO 28500 §4): `WARC/1.0\r\n`, header lines to a blank
  * line, a Content-Length-sized block, `\r\n\r\n`. Per-record gzip members
  * (the Common Crawl layout) decompress transparently — GZIPInputStream
  * reads concatenated members. For `application/http` blocks the HTTP
  * status, Content-Type, and body are split out; other blocks land in
  * `payload` whole.
  *
  * Options: `types` — comma-separated WARC-Type filter (e.g. `response`);
  * non-matching records are skipped at parse time (headers read, body
  * skipped) before any row materializes.
  */
class WarcDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "warc"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = WarcSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new WarcTable(WarcSource.resolvePaths(properties.asScala.toMap))
}

object WarcSource {
  val schema: StructType = StructType(Seq(
    StructField("record_id", StringType),        // WARC-Record-ID
    StructField("warc_type", StringType),        // WARC-Type
    StructField("target_uri", StringType),       // WARC-Target-URI
    StructField("warc_date", StringType),        // WARC-Date (ISO 8601)
    StructField("content_type", StringType),     // record-level Content-Type
    StructField("content_length", LongType),     // record block length
    StructField("http_status", IntegerType),     // from application/http blocks
    StructField("http_content_type", StringType),
    StructField("payload", BinaryType),          // HTTP body, or the whole block
    StructField("warc_file", StringType),        // provenance (CDX essentials)
    StructField("warc_offset", LongType),        // offset in the DECOMPRESSED stream
  ))

  /** Spark hands `.load(p…)` to the provider as `path` or a JSON-array
    * `paths` property; globs and directories expand via the Hadoop FS.
    * Shared with the `tar` source (`format` labels the error).
    */
  def resolvePaths(properties: Map[String, String], format: String = "warc"): Seq[String] = {
    val raw = properties.get("paths") match {
      case Some(json) => // minimal JSON string-array parse: ["a","b"]
        "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(json)
          .map(m => m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
      case None => properties.get("path").toSeq
    }
    require(raw.nonEmpty,
      s"$format: no path given — use spark.read.format(\"$format\").load(path)")
    raw
  }

  private[graft] def expand(paths: Seq[String], conf: Configuration,
      format: String = "warc"): Seq[String] = {
    val files = paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      Option(fs.globStatus(hp)).toSeq.flatten.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith(".")
            && !s.getPath.getName.startsWith("_"))
          .map(_.getPath.toString)
        else Seq(st.getPath.toString)
      }
    }
    require(files.nonEmpty, s"$format: no files matched $paths")
    files.sorted
  }
}

class WarcTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"warc(${paths.mkString(",")})"
  override def schema(): StructType = WarcSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new WarcScanBuilder(paths, options.asScala.toMap)
}

class WarcScanBuilder(paths: Seq[String], options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = WarcSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new WarcScan(paths, required, options)
}

class WarcScan(paths: Seq[String], required: StructType, options: Map[String, String])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    WarcSource.expand(paths, conf).map(f => WarcInputPartition(f)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confGetter =
      GraftShims.serializableHadoopConf(SparkSession.active.sessionState.newHadoopConf())
    val types = options.get("types").map(_.split(",").map(_.trim.toLowerCase)
      .filter(_.nonEmpty).toSet).filter(_.nonEmpty)
    WarcReaderFactory(required.fieldNames, types, confGetter)
  }
}

case class WarcInputPartition(file: String) extends InputPartition

case class WarcReaderFactory(fields: Array[String], types: Option[Set[String]],
    confGetter: () => Configuration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new WarcPartitionReader(partition.asInstanceOf[WarcInputPartition].file,
      fields, types, confGetter())
}

/** Streams one WARC file record-by-record. Byte-accurate: header lines are
  * CRLF-terminated ASCII read directly off the stream (no Reader — a
  * charset decoder would corrupt the byte count the offsets come from).
  */
class WarcPartitionReader(file: String, fields: Array[String], types: Option[Set[String]],
    conf: Configuration) extends PartitionReader[InternalRow] {

  private val needsBody =
    fields.exists(f => f == "payload" || f == "http_status" || f == "http_content_type")

  private var pos = 0L // position in the decompressed stream
  private val in: InputStream = {
    val hp = new Path(file)
    val raw = hp.getFileSystem(conf).open(hp)
    val buffered: InputStream =
      if (file.endsWith(".gz")) new GZIPInputStream(raw, 1 << 16)
      else if (file.endsWith(".zst") || file.endsWith(".zstd"))
        new BufferedInputStream(
          new com.github.luben.zstd.ZstdInputStreamNoFinalizer(raw), 1 << 16)
      else new BufferedInputStream(raw, 1 << 16)
    buffered
  }

  private var row: InternalRow = _

  private def read1(): Int = { val b = in.read(); if (b >= 0) pos += 1; b }

  /** One CRLF/LF-terminated line as ISO-8859-1 (header lines are ASCII);
    * null at EOF before any byte.
    */
  private def readLine(): String = {
    val sb = new java.lang.StringBuilder(64)
    var b = read1()
    if (b < 0) return null
    while (b >= 0 && b != '\n') { sb.append(b.toChar); b = read1() }
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\r') sb.setLength(sb.length - 1)
    sb.toString
  }

  private def readFully(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"warc: truncated block in $file at offset $pos")
      off += r; pos += r
    }
    buf
  }

  private def skipFully(n: Long): Unit = {
    var left = n
    while (left > 0) {
      val r = in.skip(left)
      if (r > 0) { left -= r; pos += r }
      else if (read1() >= 0) left -= 1
      else throw new EOFException(s"warc: truncated block in $file at offset $pos")
    }
  }

  override def next(): Boolean = {
    while (true) {
      // seek the record magic, tolerating inter-record blank lines
      var recordStart = pos
      var line = readLine()
      while (line != null && line.isEmpty) { recordStart = pos; line = readLine() }
      if (line == null) return false
      require(line.startsWith("WARC/"),
        s"warc: expected record header at $file:$recordStart, got '${line.take(40)}'")
      // WARC named fields to the blank line
      val headers = scala.collection.mutable.Map.empty[String, String]
      var h = readLine()
      while (h != null && h.nonEmpty) {
        val i = h.indexOf(':')
        if (i > 0) headers(h.substring(0, i).trim.toLowerCase) = h.substring(i + 1).trim
        h = readLine()
      }
      val len = headers.getOrElse("content-length",
        throw new IllegalArgumentException(
          s"warc: record at $file:$recordStart lacks Content-Length")).toLong
      val wtype = headers.getOrElse("warc-type", "")
      val wanted = types.forall(_.contains(wtype.toLowerCase))

      if (!wanted || !needsBody) skipFully(len)
      if (wanted) {
        // the skip path above streams past any length, but materializing a
        // body is bounded by the JVM array limit — reject loudly instead
        // of letting len.toInt wrap negative and kill the partition with a
        // NegativeArraySizeException
        require(!needsBody || len <= Int.MaxValue - 8,
          s"warc: record block of $len bytes at $file:$recordStart exceeds the " +
            "2 GiB JVM array limit — prune the payload/http_* columns to scan past it")
        val block = if (needsBody) readFully(len.toInt) else Array.emptyByteArray
        row = buildRow(headers.toMap, wtype, len, recordStart, block)
        // trailing CRLF CRLF is consumed lazily by the blank-line seek above
        return true
      }
    }
    false
  }

  private def buildRow(headers: Map[String, String], wtype: String, len: Long,
      offset: Long, block: Array[Byte]): InternalRow = {
    // application/http blocks: split status line + headers from the body
    var httpStatus: Option[Int] = None
    var httpCt: Option[String] = None
    var payload = block
    val isHttp = headers.get("content-type").exists(_.startsWith("application/http"))
    if (needsBody && isHttp && block.length > 0) {
      val sep = indexOfDoubleCrlf(block)
      val headBytes = if (sep >= 0) sep else block.length
      val head = new String(block, 0, headBytes, "ISO-8859-1")
      val lines = head.split("\r\n")
      if (lines.nonEmpty && lines(0).startsWith("HTTP/")) {
        val parts = lines(0).split(" ")
        if (parts.length >= 2) httpStatus = parts(1).toIntOption
        httpCt = lines.drop(1).collectFirst {
          case l if l.toLowerCase.startsWith("content-type:") =>
            l.substring(l.indexOf(':') + 1).trim
        }
        payload = if (sep >= 0) java.util.Arrays.copyOfRange(block, sep + 4, block.length)
                  else Array.emptyByteArray
      }
    }
    def s(v: Option[String]) = v.map(UTF8String.fromString).orNull
    val values: Array[Any] = fields.map {
      case "record_id"         => s(headers.get("warc-record-id"))
      case "warc_type"         => UTF8String.fromString(wtype)
      case "target_uri"        => s(headers.get("warc-target-uri"))
      case "warc_date"         => s(headers.get("warc-date"))
      case "content_type"      => s(headers.get("content-type"))
      case "content_length"    => len
      case "http_status"       => httpStatus.map(Int.box).orNull
      case "http_content_type" => s(httpCt)
      case "payload"           => payload
      case "warc_file"         => UTF8String.fromString(file)
      case "warc_offset"       => offset
      case other => throw new IllegalArgumentException(s"warc: unknown field $other")
    }
    InternalRow.fromSeq(values.toIndexedSeq)
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}
