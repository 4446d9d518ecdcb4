package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import scala.jdk.CollectionConverters._

import com.github.luben.zstd.{ZstdInputStreamNoFinalizer, ZstdOutputStreamNoFinalizer}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, Dataset, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** `spark.read.format("tar")` — a DataSource V2 reader for POSIX-ustar /
  * GNU tar shards, i.e. the **WebDataset** layout: the de-facto interchange
  * format for large-scale multimodal training corpora, where each "sample"
  * is a run of ADJACENT tar members sharing a basename key
  * (`000017.jpg` + `000017.txt` + `000017.json` = one image-text sample)
  * and a corpus is tens of thousands of ~1 GB `.tar` shards.
  *
  * Spark-first design and the 100 TB contract:
  *  - **one InputPartition per shard file** — tar has no block index and
  *    WebDataset corpora ship as many same-sized shards, so file-level
  *    parallelism saturates any executor count; readers stream member by
  *    member with O(member) memory;
  *  - **column pruning reaches the byte level**: when `payload` is not a
  *    required column the member's data blocks are `skip`ped, never read —
  *    a key/size census over a 100 TB image corpus touches only the
  *    512-byte headers;
  *  - **`exts` option pushes the sample-field selection into the scan**:
  *    `option("exts", "txt,json")` skips the payload bytes of every other
  *    member (the caption-only pass over an image corpus reads ~1% of the
  *    bytes);
  *  - **`group` option assembles samples inside the reader**: WebDataset
  *    guarantees a sample's members are adjacent within one shard, so
  *    grouping is a zero-shuffle streaming operation here — the Spark-level
  *    alternative (`groupBy(key)`) would shuffle the full corpus;
  *  - gzip (`.tar.gz`/`.tgz`) and zstd (`.tar.zst`) shards decompress
  *    transparently; Hadoop FileSystem API end to end (`file:`, `hdfs:`,
  *    `s3a:`).
  *
  * Schemas — flat (default), one row per regular-file member:
  * `(shard, offset, name, key, ext, size, payload)`; grouped
  * (`option("group", "true")`), one row per sample:
  * `(shard, offset, key, files map<string,binary>)`. The WebDataset key
  * convention splits at the FIRST dot of the basename, so multi-part
  * extensions survive (`a/b.seg.png` → key `a/b`, ext `seg.png`).
  *
  * Parser coverage (spec-pinned): ustar name+prefix, octal and GNU
  * base-256 sizes, checksum verification (unsigned, with the signed-sum
  * historical variant accepted), GNU 'L' long-name members, pax 'x'
  * extended headers (`path` override), directory/link/global members
  * skipped, end-of-archive zero blocks (including a lone zero block at
  * EOF).
  */
class TarDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "tar"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    if (options.getBoolean("group", false)) TarSource.groupedSchema else TarSource.flatSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new TarTable(WarcSource.resolvePaths(properties.asScala.toMap, "tar"),
      properties.asScala.get("group").exists(_.toBoolean))
}

object TarSource {
  val flatSchema: StructType = StructType(Seq(
    StructField("shard", StringType),    // provenance: shard file path
    StructField("offset", LongType),     // header offset in the DECOMPRESSED stream
    StructField("name", StringType),     // full member name
    StructField("key", StringType),      // WebDataset sample key (name minus .ext)
    StructField("ext", StringType),      // extension after the basename's first dot
    StructField("size", LongType),
    StructField("payload", BinaryType),
  ))

  val groupedSchema: StructType = StructType(Seq(
    StructField("shard", StringType),
    StructField("offset", LongType),     // first member's header offset
    StructField("key", StringType),
    StructField("files", MapType(StringType, BinaryType)), // ext -> payload
  ))

  /** (key, ext) under the WebDataset convention: split at the first dot of
    * the basename; directories stay in the key.
    */
  def splitKeyExt(name: String): (String, String) = {
    val slash = name.lastIndexOf('/')
    val dot = name.indexOf('.', slash + 1)
    if (dot < 0) (name, "") else (name.substring(0, dot), name.substring(dot + 1))
  }

  /** Open a shard stream, decompressing by extension. */
  def open(file: String, conf: Configuration): InputStream = {
    val raw = new Path(file).getFileSystem(conf).open(new Path(file))
    if (file.endsWith(".gz") || file.endsWith(".tgz"))
      new BufferedInputStream(new GZIPInputStream(raw, 1 << 16), 1 << 16)
    else if (file.endsWith(".zst") || file.endsWith(".zstd"))
      new BufferedInputStream(new ZstdInputStreamNoFinalizer(raw), 1 << 16)
    else new BufferedInputStream(raw, 1 << 16)
  }

  /** Wrap an OutputStream in the compressor the shard extension implies. */
  def wrapOut(file: String, raw: OutputStream): OutputStream =
    if (file.endsWith(".gz") || file.endsWith(".tgz")) new GZIPOutputStream(raw, 1 << 16)
    else if (file.endsWith(".zst") || file.endsWith(".zstd"))
      new ZstdOutputStreamNoFinalizer(raw, 3)
    else raw
}

/** Streaming tar walker: `next()` yields the next REGULAR-file member with
  * the stream positioned at its first payload byte; the caller MUST then
  * call exactly one of [[readPayload]] / [[skipPayload]] before the next
  * `next()`. Non-file members (dirs, links, GNU/pax metadata) are consumed
  * internally; 'L' long names and pax `path` overrides apply to the member
  * they precede, per the formats.
  */
final class TarReader(in: InputStream, file: String) {
  /** A regular-file member; `offset` is the header's position. */
  final case class Member(name: String, size: Long, offset: Long)

  private var pos = 0L
  private val hdr = new Array[Byte](512)

  private def readBlock(allowEof: Boolean): Boolean = {
    var off = 0
    while (off < 512) {
      val r = in.read(hdr, off, 512 - off)
      if (r < 0) {
        if (allowEof && off == 0) return false
        throw new EOFException(s"tar: truncated header in $file at offset ${pos + off}")
      }
      off += r
    }
    pos += 512
    true
  }

  private def isZeroBlock: Boolean = { var i = 0; while (i < 512) { if (hdr(i) != 0) return false; i += 1 }; true }

  private def cstr(off: Int, len: Int): String = {
    var end = off
    val max = off + len
    while (end < max && hdr(end) != 0) end += 1
    new String(hdr, off, end - off, UTF_8)
  }

  private def octal(off: Int, len: Int): Long = {
    var i = off
    val max = off + len
    while (i < max && (hdr(i) == ' ' || hdr(i) == 0)) i += 1
    var v = 0L
    while (i < max && hdr(i) >= '0' && hdr(i) <= '7') { v = (v << 3) | (hdr(i) - '0'); i += 1 }
    v
  }

  /** size field: octal, or GNU base-256 when the top bit of byte 0 is set. */
  private def sizeField(): Long =
    if ((hdr(124) & 0x80) != 0) {
      var v = (hdr(124) & 0x7F).toLong
      var i = 125
      while (i < 136) { v = (v << 8) | (hdr(i) & 0xFF); i += 1 }
      v
    } else octal(124, 12)

  private def verifyChecksum(offset: Long): Unit = {
    val stored = octal(148, 8)
    var unsigned = 0L
    var signed = 0L
    var i = 0
    while (i < 512) {
      val b = if (i >= 148 && i < 156) ' '.toByte else hdr(i)
      unsigned += b & 0xFF
      signed += b
      i += 1
    }
    require(stored == unsigned || stored == signed,
      s"tar: header checksum mismatch in $file at offset $offset " +
        s"(stored $stored, computed $unsigned) — corrupt or not a tar")
  }

  private def readFully(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) throw new EOFException(s"tar: truncated member data in $file at offset $pos")
      off += r; pos += r
    }
    buf
  }

  private def skipBytes(n: Long): Unit = {
    var left = n
    while (left > 0) {
      val r = in.skip(left)
      if (r > 0) { left -= r; pos += r }
      else if (in.read() >= 0) { left -= 1; pos += 1 }
      else throw new EOFException(s"tar: truncated member data in $file at offset $pos")
    }
  }

  private def pad(size: Long): Long = (512 - (size & 511)) & 511

  private var pending: Member = _
  private var pendingSize = 0L

  /** Parse pax "len key=value\n" records, returning the `path` override. */
  private def paxPath(data: Array[Byte]): Option[String] = {
    var i = 0
    var path: Option[String] = None
    while (i < data.length) {
      var j = i
      while (j < data.length && data(j) != ' ') j += 1
      val len = new String(data, i, j - i, ISO_8859_1).trim.toIntOption.getOrElse(return path)
      if (len <= 0 || i + len > data.length) return path
      val rec = new String(data, j + 1, i + len - j - 2, UTF_8) // minus trailing \n
      val eq = rec.indexOf('=')
      if (eq > 0 && rec.substring(0, eq) == "path") path = Some(rec.substring(eq + 1))
      i += len
    }
    path
  }

  /** Advance to the next regular-file member; false at end of archive. */
  def next(): Boolean = {
    var nameOverride: String = null
    while (true) {
      val offset = pos
      if (!readBlock(allowEof = true)) return false
      if (isZeroBlock) {
        // end-of-archive: second zero block or EOF both accepted
        if (readBlock(allowEof = true)) require(isZeroBlock,
          s"tar: lone zero block mid-archive in $file at offset $offset")
        return false
      }
      verifyChecksum(offset)
      val size = sizeField()
      require(size >= 0, s"tar: negative member size in $file at offset $offset")
      val typeflag = hdr(156).toChar
      val ustar = hdr(257) == 'u' && hdr(258) == 's' && hdr(259) == 't' &&
        hdr(260) == 'a' && hdr(261) == 'r'
      val prefix = if (ustar && typeflag != 'L') cstr(345, 155) else ""
      val base = cstr(0, 100)
      val name =
        if (nameOverride != null) nameOverride
        else if (prefix.nonEmpty) prefix + "/" + base
        else base

      typeflag match {
        case '0' | '\u0000' | '7' => // regular file ('7' = contiguous, treated as regular)
          pending = Member(name, size, offset)
          pendingSize = size
          return true
        case 'L' => // GNU long name: data = the next member's name, NUL-terminated
          require(size <= (1 << 20), s"tar: implausible long-name size $size in $file")
          val data = readFully(size.toInt); skipBytes(pad(size))
          var end = data.length
          while (end > 0 && data(end - 1) == 0) end -= 1
          nameOverride = new String(data, 0, end, UTF_8)
        case 'x' => // pax extended header for the next member
          require(size <= (1 << 20), s"tar: implausible pax-header size $size in $file")
          val data = readFully(size.toInt); skipBytes(pad(size))
          paxPath(data).foreach(nameOverride = _)
        case _ => // dirs, links, 'g' globals, 'K' long links, devices: skip
          skipBytes(size + pad(size))
          nameOverride = null
      }
    }
    false
  }

  def member: Member = pending

  def readPayload(): Array[Byte] = {
    require(pendingSize <= Int.MaxValue - 8,
      s"tar: member ${pending.name} of $pendingSize bytes in $file exceeds the " +
        "2 GiB JVM array limit — prune the payload column to scan past it")
    val data = readFully(pendingSize.toInt)
    skipBytes(pad(pendingSize))
    data
  }

  def skipPayload(): Unit = skipBytes(pendingSize + pad(pendingSize))

  def close(): Unit = in.close()
}

class TarTable(paths: Seq[String], grouped: Boolean) extends Table with SupportsRead {
  override def name(): String = s"tar(${paths.mkString(",")})"
  override def schema(): StructType =
    if (grouped) TarSource.groupedSchema else TarSource.flatSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TarScanBuilder(paths, grouped, options.asScala.toMap)
}

class TarScanBuilder(paths: Seq[String], grouped: Boolean, options: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType =
    if (grouped) TarSource.groupedSchema else TarSource.flatSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new TarScan(paths, grouped, required, options)
}

class TarScan(paths: Seq[String], grouped: Boolean, required: StructType,
    options: Map[String, String]) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    WarcSource.expand(paths, conf, "tar").map(f => TarInputPartition(f)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confGetter =
      GraftShims.serializableHadoopConf(SparkSession.active.sessionState.newHadoopConf())
    val exts = options.get("exts").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    TarReaderFactory(required.fieldNames, grouped, exts, confGetter)
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new TarMicroBatchStream(paths, required, grouped, options)
}

/** `spark.readStream.format("tar")` — micro-batch WebDataset ingest: each
  * trigger picks up newly arrived shard files; samples flow through the
  * same flat/grouped readers as the batch source.
  *
  * Offsets are the HIGHEST SHARD NAME processed (not a count), so a batch
  * is reproducible from its (start, end] name range alone — restart-safe
  * with zero source-side state. That makes monotonicity the source's one
  * contract: shards must arrive in lexicographically increasing name
  * order, which every log-structured producer (including
  * [[TarShards.write]]'s `part-<task>-<seq>` naming under a
  * task-per-epoch layout, Kafka-style shard dumpers, date-prefixed drops)
  * already satisfies. A shard arriving UNDER the committed high-water
  * name would be silently invisible to the range, so discovery fails
  * loudly when it sees one instead. `maxFilesPerTrigger` bounds admission
  * per batch by shard count, `maxBytesPerTrigger` by cumulative shard
  * size (both together compose; default: all new files).
  */
class TarMicroBatchStream(paths: Seq[String], required: StructType, grouped: Boolean,
    options: Map[String, String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  private val confGetter =
    GraftShims.serializableHadoopConf(SparkSession.active.sessionState.newHadoopConf())
  private val exts = options.get("exts").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    .filter(_.nonEmpty)
  private val maxFiles = options.get("maxfilespertrigger")
    .orElse(options.get("maxFilesPerTrigger")).map(_.toInt)
  // byte-budget admission next to the file-count one: real WebDataset
  // corpora mix shard sizes across orders of magnitude, so a file-count
  // bound alone lets one trigger pull a multi-GB batch
  private val maxBytes = options.get("maxbytespertrigger")
    .orElse(options.get("maxBytesPerTrigger")).map(_.toLong)

  /** Name-sorted `(path, length)` discovery; empty directories are normal
    * while streaming. Lengths ride along so byte-budget admission costs
    * no extra FS calls (the listing already carries them).
    */
  private def discover(): Seq[(String, Long)] = {
    val conf = confGetter()
    paths.flatMap { p =>
      val hp = new Path(p)
      val fs = hp.getFileSystem(conf)
      Option(fs.globStatus(hp)).toSeq.flatten.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith(".")
            && !s.getPath.getName.startsWith("_"))
          .map(s => (s.getPath.toString, s.getLen))
        else Seq((st.getPath.toString, st.getLen))
      }
    }.sortBy(_._1)
  }

  // best-effort loud-fail memory for the monotonicity contract: every
  // name this instance has ever discovered (names only — the same
  // driver-memory order as Spark's own FileStreamSource seen-map). A name
  // that appears for the FIRST time at or under the admitted high water
  // arrived late and would otherwise be silently invisible to the name
  // ranges. Restart resets the memory, so a late file landing exactly
  // across a restart is undetectable — documented best-effort, the
  // contract itself is the producer's.
  private val seen = scala.collection.mutable.HashSet.empty[String]
  @volatile private var highWater: String = ""
  // per-trigger listing memo: latestOffset's discovery serves the same
  // trigger's planInputPartitions/reportLatestOffset (each a fresh FS
  // listing otherwise — 3× the object-store LIST cost per trigger); a
  // replayed batch after restart sees the memo empty and lists fresh
  @volatile private var lastListing: Seq[(String, Long)] = Nil

  private def listing(): Seq[(String, Long)] =
    if (lastListing.nonEmpty) lastListing else discover()

  // the late check arms from the SECOND discovery of this instance's
  // lifetime: everything present at the first one is preexisting — a
  // fresh start (highWater empty, so the old check was vacuous anyway)
  // or committed history after a restart. Restarts previously failed
  // loudly on their own history whenever highWater was set before the
  // first discovery (a ProcessingTime trigger resuming from a checkpoint,
  // or a replayed pending batch whose planInputPartitions runs first);
  // AvailableNow restarts were shielded only by accident via the prepare
  // hook's early discovery. A genuinely-late file landing exactly across
  // a restart stays undetectable — the documented best-effort window.
  @volatile private var seeded = false

  private def discoverChecked(): Seq[(String, Long)] = {
    val all = discover()
    lastListing = all
    if (seeded && highWater.nonEmpty) {
      val late = all.filter { case (f, _) => f <= highWater && !seen.contains(f) }
      require(late.isEmpty,
        s"tar stream: shard(s) ${late.take(3).map(_._1).mkString(", ")} appeared at or under " +
          s"the admitted high-water name '$highWater' — shard names must arrive in " +
          "increasing order (they would be silently skipped otherwise)")
    }
    seeded = true
    seen ++= all.map(_._1)
    all
  }

  // Trigger.AvailableNow: snapshot the drain target once; admission then
  // never passes it, so the query terminates after catching up in
  // maxFilesPerTrigger/maxBytesPerTrigger-bounded batches
  @volatile private var availableNowCap: Option[String] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = Some(discoverChecked().lastOption.map(_._1).getOrElse(""))

  override def initialOffset(): Offset = TarNameOffset("")
  override def deserializeOffset(json: String): Offset = TarNameOffset.fromJson(json)

  override def getDefaultReadLimit: ReadLimit = (maxFiles, maxBytes) match {
    case (Some(f), Some(b)) => ReadLimit.compositeLimit(
      Array(ReadLimit.maxFiles(f), ReadLimit.maxBytes(b)))
    case (Some(f), None) => ReadLimit.maxFiles(f)
    case (None, Some(b)) => ReadLimit.maxBytes(b)
    case _ => ReadLimit.allAvailable()
  }

  /** Apply one admission bound. Byte budgets always admit the FIRST
    * fresh file even when it alone exceeds the budget — the standard
    * FileStreamSource behavior: a shard larger than the budget must
    * still flow (bounding is about batch sizing, not filtering), and
    * refusing it would stall the stream forever.
    */
  private def admit(fresh: Seq[(String, Long)], limit: ReadLimit): Seq[(String, Long)] =
    limit match {
      case mf: org.apache.spark.sql.connector.read.streaming.ReadMaxFiles =>
        fresh.take(mf.maxFiles())
      case mb: org.apache.spark.sql.connector.read.streaming.ReadMaxBytes =>
        var total = 0L
        var n = 0
        while (n < fresh.length && (n == 0 || total + fresh(n)._2 <= mb.maxBytes())) {
          total += fresh(n)._2
          n += 1
        }
        fresh.take(n)
      case c: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
        c.getReadLimits.foldLeft(fresh)(admit)
      case _ => fresh
    }

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is the admission-control entry point")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val startName = start.asInstanceOf[TarNameOffset].maxName
    if (startName > highWater) highWater = startName
    val fresh = discoverChecked().filter { case (f, _) =>
      f > startName && availableNowCap.forall(f <= _) }
    val admitted = admit(fresh, limit)
    if (admitted.isEmpty) start
    else {
      highWater = admitted.last._1
      TarNameOffset(admitted.last._1)
    }
  }

  override def reportLatestOffset(): Offset = {
    val all = listing()
    if (all.isEmpty) TarNameOffset("") else TarNameOffset(all.last._1)
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TarNameOffset].maxName
    val e = end.asInstanceOf[TarNameOffset].maxName
    if (e > highWater) highWater = e
    listing().map(_._1).filter(f => f > s && f <= e).map(TarInputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    TarReaderFactory(required.fieldNames, grouped, exts, confGetter)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Streaming offset: the highest shard NAME committed ("" = nothing). */
case class TarNameOffset(maxName: String)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = {
    val esc = maxName.replace("\\", "\\\\").replace("\"", "\\\"")
    s"""{"maxName":"$esc"}"""
  }
}

object TarNameOffset {
  def fromJson(json: String): TarNameOffset = {
    val m = "\"maxName\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findFirstMatchIn(json)
    TarNameOffset(m.map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
      .getOrElse(throw new IllegalArgumentException(s"tar stream: bad offset json $json")))
  }
}

case class TarInputPartition(file: String) extends InputPartition

case class TarReaderFactory(fields: Array[String], grouped: Boolean,
    exts: Option[Set[String]], confGetter: () => Configuration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[TarInputPartition].file
    if (grouped) new TarGroupedReader(file, fields, exts, confGetter())
    else new TarFlatReader(file, fields, exts, confGetter())
  }
}

/** One row per regular-file member. Payload bytes are skipped, not read,
  * when the `payload` column is pruned away or the member's ext is
  * filtered out by `exts`.
  */
class TarFlatReader(file: String, fields: Array[String], exts: Option[Set[String]],
    conf: Configuration) extends PartitionReader[InternalRow] {
  private val tar = new TarReader(TarSource.open(file, conf), file)
  private val needsPayload = fields.contains("payload")
  private val shardStr = UTF8String.fromString(file)
  private var row: InternalRow = _

  override def next(): Boolean = {
    while (tar.next()) {
      val m = tar.member
      val (key, ext) = TarSource.splitKeyExt(m.name)
      if (exts.forall(_.contains(ext))) {
        val payload = if (needsPayload) tar.readPayload() else { tar.skipPayload(); null }
        val values: Array[Any] = fields.map {
          case "shard"   => shardStr
          case "offset"  => m.offset
          case "name"    => UTF8String.fromString(m.name)
          case "key"     => UTF8String.fromString(key)
          case "ext"     => UTF8String.fromString(ext)
          case "size"    => m.size
          case "payload" => payload
          case other => throw new IllegalArgumentException(s"tar: unknown field $other")
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        return true
      }
      tar.skipPayload()
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = tar.close()
}

/** One row per SAMPLE: adjacent members sharing a key collapse into an
  * ext→payload map, streamed with O(sample) memory — the reader-side
  * realization of the WebDataset adjacency contract (a Spark `groupBy(key)`
  * would shuffle the corpus to do the same). Duplicate exts within a sample
  * fail loudly (a corrupt shard, not a choice to make silently).
  */
class TarGroupedReader(file: String, fields: Array[String], exts: Option[Set[String]],
    conf: Configuration) extends PartitionReader[InternalRow] {
  private val tar = new TarReader(TarSource.open(file, conf), file)
  private val shardStr = UTF8String.fromString(file)
  private var row: InternalRow = _
  private var done = false
  // one-member lookahead: the first member of the NEXT sample
  private var aheadKey: String = _
  private var aheadExt: String = _
  private var aheadOffset = 0L
  private var aheadPayload: Array[Byte] = _
  private var ahead = false

  private def advance(): Boolean = {
    while (tar.next()) {
      val m = tar.member
      val (key, ext) = TarSource.splitKeyExt(m.name)
      if (exts.forall(_.contains(ext))) {
        aheadKey = key; aheadExt = ext; aheadOffset = m.offset
        aheadPayload = tar.readPayload()
        return true
      }
      tar.skipPayload()
    }
    false
  }

  override def next(): Boolean = {
    if (done) return false
    if (!ahead && !advance()) { done = true; return false }
    ahead = true
    val key = aheadKey
    val offset = aheadOffset
    val extsBuf = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
    val payloads = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val seen = scala.collection.mutable.Set.empty[String]
    var more = true
    while (more && aheadKey == key) {
      require(seen.add(aheadExt),
        s"tar: duplicate member ext '$aheadExt' for sample key '$key' in $file — corrupt shard")
      extsBuf += UTF8String.fromString(aheadExt)
      payloads += aheadPayload
      more = advance()
    }
    if (!more) { ahead = false; done = true }
    val filesMap = new ArrayBasedMapData(
      new GenericArrayData(extsBuf.toArray[Any]), new GenericArrayData(payloads.toArray[Any]))
    val values: Array[Any] = fields.map {
      case "shard"  => shardStr
      case "offset" => offset
      case "key"    => UTF8String.fromString(key)
      case "files"  => filesMap
      case other => throw new IllegalArgumentException(s"tar: unknown field $other")
    }
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = tar.close()
}

/** One tar member exploded from a column-held archive ([[TarShards.members]]). */
case class TarMemberRow(doc_id: Long, member_ix: Int, name: String, key: String,
    ext: String, size: Long, payload: Array[Byte])

/** Writing WebDataset shards, and walking archives held in a BINARY column.
  *
  * The writer is the sink side of the 100 TB multimodal story: curated
  * samples leave Spark as WebDataset shards any training loader mounts
  * directly. Layout control is explicit — rows are hash-repartitioned by
  * key (so a sample's members land in ONE task) and sorted by (key, ext)
  * within the task, then streamed into fixed-size shards; shard names are
  * `part-<task>-<seq>.tar[.gz|.zst]`, deterministic under a fixed
  * partitioning. Entries are POSIX ustar (mtime 0, mode 0644 — byte-stable
  * output for a given input); names over 100 bytes emit a GNU 'L'
  * long-name member, which [[TarReader]] and every tar since 1990 read.
  */
object TarShards {

  /** Explode tar archives held in a binary COLUMN into their regular-file
    * members — the in-plan sibling of the `tar` file source, for archives
    * that arrive as payloads (an attachment column, a WARC response body)
    * rather than as files. Streams each archive once; order within a
    * document is the archive order (`member_ix`).
    */
  def members(df: DataFrame, idCol: String, payloadCol: String): Dataset[TarMemberRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else {
          val tar = new TarReader(new java.io.ByteArrayInputStream(bytes), s"doc:$id")
          Iterator.unfold(0) { ix =>
            if (tar.next()) {
              val m = tar.member
              val (key, ext) = TarSource.splitKeyExt(m.name)
              Some((TarMemberRow(id, ix, m.name, key, ext, m.size, tar.readPayload()), ix + 1))
            } else None
          }
        }
      })
  }

  /** Write `(key, ext, payload)` rows as WebDataset shards under `dir`.
    *
    * `samplesPerShard` bounds DISTINCT KEYS per shard (the unit training
    * loaders budget by). `compression`: "none" | "gzip" | "zstd".
    * `numTasks` sets the repartition width (0 = keep the session's shuffle
    * partitioning); total shard count ≈ numTasks × ceil(keys-per-task /
    * samplesPerShard), so size shards by sizing tasks — the standard Spark
    * output-sizing move.
    */
  def write(df: DataFrame, dir: String, samplesPerShard: Int = 1000,
      keyCol: String = "key", extCol: String = "ext", payloadCol: String = "payload",
      compression: String = "none", numTasks: Int = 0): Unit = {
    require(samplesPerShard > 0, s"samplesPerShard must be positive, got $samplesPerShard")
    val suffix = compression match {
      case "none" => ".tar"
      case "gzip" => ".tar.gz"
      case "zstd" => ".tar.zst"
      case other  => throw new IllegalArgumentException(
        s"tar: unknown compression '$other' (none|gzip|zstd)")
    }
    val spark = df.sparkSession
    import spark.implicits._
    val confGetter =
      GraftShims.serializableHadoopConf(spark.sessionState.newHadoopConf())
    val slim = df.select(col(keyCol).cast("string"), col(extCol).cast("string"),
      col(payloadCol).cast("binary"))
    val parted = (if (numTasks > 0) slim.repartition(numTasks, col(keyCol))
                  else slim.repartition(col(keyCol)))
      .sortWithinPartitions(col(keyCol), col(extCol))
    parted.as[(String, String, Array[Byte])].foreachPartition {
      rows: Iterator[(String, String, Array[Byte])] =>
        if (rows.hasNext) {
          val task = TaskContext.getPartitionId()
          // staging discipline: each shard streams into a dot-prefixed
          // attempt-unique name and RENAMES to its final name on close —
          // a speculative or zombie retry attempt never interleaves bytes
          // into the same open file, and a task that dies mid-write
          // leaves only dot-files every tar reader (and this source's own
          // discover()) already skips. If the final name exists, another
          // attempt won: drop the staging copy (attempts write identical
          // bytes — the input partition and sort are deterministic).
          val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
          val fs = new Path(dir).getFileSystem(confGetter())
          fs.mkdirs(new Path(dir))
          var shardIx = -1
          var out: OutputStream = null
          var staging: Path = null
          var finalPath: Path = null
          var keysInShard = 0
          var lastKey: String = null
          def closeCurrent(): Unit = if (out != null) {
            out.write(new Array[Byte](1024)) // two end-of-archive zero blocks
            out.close()
            if (!fs.rename(staging, finalPath)) {
              if (fs.exists(finalPath)) fs.delete(staging, false)
              else throw new java.io.IOException(
                s"tar: rename $staging -> $finalPath failed")
            }
            out = null
          }
          def roll(): Unit = {
            closeCurrent()
            shardIx += 1
            val name = f"part-$task%05d-$shardIx%05d$suffix"
            finalPath = new Path(dir, name)
            staging = new Path(dir, s".inprogress-$attempt-$name")
            out = TarSource.wrapOut(name, fs.create(staging, true))
            keysInShard = 0
          }
          roll()
          for ((key, ext, payload) <- rows) {
            require(key != null && payload != null,
              s"tar: null ${if (key == null) "key" else "payload"} row in task $task")
            if (key != lastKey) {
              if (keysInShard == samplesPerShard) roll()
              keysInShard += 1
              lastKey = key
            }
            val name = if (ext == null || ext.isEmpty) key else s"$key.$ext"
            writeEntry(out, name, payload)
          }
          closeCurrent()
        }
    }
    // job-level completion marker: a partial shard set (the job died
    // after some tasks committed) is now DISTINGUISHABLE from a complete
    // one — consumers that care check for _SUCCESS; the tar reader itself
    // skips underscore files, so the marker never reads as a shard.
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(dir)) // zero-partition writes still mark success
    // the job is complete: every shard that matters has renamed into its
    // final name, so any surviving '.inprogress-*' file is a dead task
    // attempt's orphan (killed mid-write, or a speculative loser whose
    // rename found the final name taken). Readers skip dot-files, but
    // retried jobs would otherwise accrete junk in the directory forever.
    // Best-effort: a zombie/speculative attempt still writing at
    // job-commit time can recreate its orphan after this sweep (deleting
    // its open file never corrupts committed output, since the final
    // names are already renamed in) — any later write job to the same
    // directory re-runs this sweep, so leftovers don't accrete.
    val stale = fs.listStatus(new Path(dir)).iterator
      .map(_.getPath).filter(_.getName.startsWith(".inprogress-"))
    stale.foreach(p => fs.delete(p, false))
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  /** One ustar entry (header + padded data); GNU 'L' member for long names. */
  def writeEntry(out: OutputStream, name: String, data: Array[Byte]): Unit = {
    val nameBytes = name.getBytes(UTF_8)
    if (nameBytes.length > 100) {
      // GNU long-name: an 'L' member whose data is the NUL-terminated name
      out.write(header("././@LongLink".getBytes(UTF_8), nameBytes.length + 1, 'L'))
      out.write(nameBytes); out.write(0)
      out.write(new Array[Byte]((512 - ((nameBytes.length + 1) & 511)) & 511))
      out.write(header(java.util.Arrays.copyOf(nameBytes, 100), data.length.toLong, '0'))
    } else out.write(header(nameBytes, data.length.toLong, '0'))
    out.write(data)
    out.write(new Array[Byte]((512 - (data.length & 511)) & 511))
  }

  private def header(nameBytes: Array[Byte], size: Long, typeflag: Char): Array[Byte] = {
    val h = new Array[Byte](512)
    System.arraycopy(nameBytes, 0, h, 0, math.min(nameBytes.length, 100))
    def octal(v: Long, off: Int, len: Int): Unit = {
      val s = java.lang.Long.toOctalString(v)
      val padded = ("0" * (len - 1 - s.length)) + s // len-1 digits + NUL
      System.arraycopy(padded.getBytes(ISO_8859_1), 0, h, off, len - 1)
    }
    octal(420, 100, 8)  // mode 0644
    octal(0, 108, 8)    // uid
    octal(0, 116, 8)    // gid
    octal(size, 124, 12)
    octal(0, 136, 12)   // mtime 0: byte-stable output
    h(156) = typeflag.toByte
    System.arraycopy("ustar\u000000".getBytes(ISO_8859_1), 0, h, 257, 8) // POSIX magic "ustar\\0" + version "00"
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // chksum as spaces for the sum
    var sum = 0L
    var i = 0
    while (i < 512) { sum += h(i) & 0xFF; i += 1 }
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes(ISO_8859_1), 0, h, 148, 6)
    h(154) = 0; h(155) = ' '
    h
  }
}
