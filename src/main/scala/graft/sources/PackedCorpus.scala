package graft.sources

import java.io.{DataOutputStream, EOFException, InputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Trainer-consumable packed-corpus shards: the public Megatron-LM
  * indexed-dataset layout (`.bin` + `.idx`), the format a GPT training
  * loader memory-maps directly — the last meter between this engine's
  * materialized token rows and an actual training job.
  *
  * Layout (Megatron-LM `indexed_dataset.py`, MMapIndexedDataset — public
  * knowledge, restated here from the published format):
  *
  *  - `part-NNNNN.bin`: every sequence's tokens back to back, each token
  *    one little-endian int32 (dtype code 4);
  *  - `part-NNNNN.idx`: magic `MMIDIDX\0\0` (9 bytes), version int64le=1,
  *    dtype uint8=4, sequence count int64le, document count int64le
  *    (= sequences + 1 — each sequence is one document here), then
  *    sizes int32le × n, pointers int64le × n (BYTE offset of each
  *    sequence in the `.bin` — the prefix sum of 4·sizes), and the
  *    document index int64le × (n + 1) = 0..n.
  *
  * Spark-first sharding, the [[TarShards.write]] discipline verbatim:
  * rows hash-repartition on the first order column and sort by
  * `orderCols` within the task, so shard bytes are DETERMINISTIC under a
  * fixed partitioning; each task streams one `.bin`/`.idx` pair into
  * dot-prefixed attempt-unique staging names and RENAMES on close
  * (speculative/zombie attempts never interleave; identical inputs write
  * identical bytes, so a lost rename race drops the duplicate ONLY after
  * a length check against the winner — a non-identical final file fails
  * loudly); a re-export first sweeps every prior final artifact so a
  * non-empty dir can never keep stale shards under a fresh `_SUCCESS`;
  * `_SUCCESS` marks job completion and stale `.inprogress-*` orphans are
  * swept at commit.
  */
object PackedCorpus {

  /** Megatron MMIDIDX magic + version; dtype codes per the published
    * table (4 = int32, 8 = uint16 — the halved-bytes layout trainers use
    * when the vocabulary fits 16 bits).
    */
  private val Magic: Array[Byte] =
    "MMIDIDX".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0, 0)
  private val Version = 1L
  private val DtypeInt32: Byte = 4
  private val DtypeUint16: Byte = 8

  private def dtypeCode(dtype: String): Byte = dtype.toLowerCase match {
    case "int32"  => DtypeInt32
    case "uint16" => DtypeUint16
    case other => throw new IllegalArgumentException(
      s"PackedCorpus: unknown dtype '$other' (int32 | uint16)")
  }
  private[sources] def tokenBytes(code: Int): Int = if (code == DtypeUint16) 2 else 4

  /** Remove a previous export's final artifacts (part files, _SUCCESS)
    * and any stale staging orphans from `dir` so a re-export can never
    * publish a stale shard under a fresh _SUCCESS. Driver-side, BEFORE
    * the write job.
    */
  private def preClean(dir: String, conf: Configuration): Unit = {
    val path = new Path(dir)
    val fs = path.getFileSystem(conf)
    if (fs.exists(path)) {
      fs.listStatus(path).iterator.map(_.getPath).filter { p =>
        val n = p.getName
        n == "_SUCCESS" || n.startsWith(".inprogress-") ||
          (n.startsWith("part-") &&
            (n.endsWith(".bin") || n.endsWith(".idx")))
      }.foreach(p => fs.delete(p, false))
    }
  }

  private def writeLongLE(out: DataOutputStream, v: Long): Unit =
    out.writeLong(java.lang.Long.reverseBytes(v))
  private def writeIntLE(out: DataOutputStream, v: Int): Unit =
    out.writeInt(Integer.reverseBytes(v))
  private def writeShortLE(out: DataOutputStream, v: Int): Unit =
    out.writeShort(java.lang.Short.reverseBytes(v.toShort))

  /** Write `idsCol` (array&lt;int&gt;) as packed shards under `dir`. One
    * `.bin`/`.idx` pair per task; `numTasks` 0 keeps the session's
    * shuffle width. Null/empty arrays are rejected loudly — a trainer
    * shard with zero-length documents breaks samplers downstream, so an
    * upstream bug must not serialize. `dtype` "uint16" halves shard
    * bytes and rejects any token outside [0, 65535] loudly (a silent
    * wrap would corrupt every downstream batch).
    */
  def write(df: DataFrame, dir: String, idsCol: String = "input_ids",
      orderCols: Seq[String] = Seq("shard", "seq_id"),
      numTasks: Int = 0, dtype: String = "int32"): Unit = {
    require(orderCols.nonEmpty, "PackedCorpus.write: orderCols must be non-empty")
    val code = dtypeCode(dtype)
    val spark = df.sparkSession
    import spark.implicits._
    val confGetter =
      GraftShims.serializableHadoopConf(spark.sessionState.newHadoopConf())
    val slim = df.select(
      struct(orderCols.map(col): _*).as("__ord"),
      col(idsCol).cast("array<int>").as("__ids"))
    val parted = (if (numTasks > 0) slim.repartition(numTasks, col("__ord." + orderCols.head))
                  else slim.repartition(col("__ord." + orderCols.head)))
      .sortWithinPartitions(col("__ord"))
      .select(col("__ids")).as[Seq[Int]]
    // Re-export into a non-empty dir must never publish STALE shards
    // under a fresh _SUCCESS: a previous job's part files that this job's
    // task layout doesn't overwrite (fewer tasks, different names) would
    // otherwise survive and read back as data. Clean every prior final
    // artifact BEFORE the job — overwrite semantics, stated loudly here
    // rather than diverging by filesystem (raw-local rename overwrites,
    // HDFS refuses).
    preClean(dir, spark.sessionState.newHadoopConf())
    parted.foreachPartition { rows: Iterator[Seq[Int]] =>
      if (rows.hasNext) {
        val task = TaskContext.getPartitionId()
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val fs = new Path(dir).getFileSystem(confGetter())
        fs.mkdirs(new Path(dir))
        val base = f"part-$task%05d"
        val binFinal = new Path(dir, s"$base.bin")
        val idxFinal = new Path(dir, s"$base.idx")
        val binStaging = new Path(dir, s".inprogress-$attempt-$base.bin")
        val idxStaging = new Path(dir, s".inprogress-$attempt-$base.idx")
        val bin = new DataOutputStream(new java.io.BufferedOutputStream(
          fs.create(binStaging, true), 1 << 16))
        val sizes = new scala.collection.mutable.ArrayBuffer[Int]()
        try {
          for (ids <- rows) {
            require(ids != null && ids.nonEmpty,
              "PackedCorpus.write: null/empty token sequence - filter " +
                "upstream (a zero-length document breaks trainer samplers)")
            sizes += ids.length
            if (code == DtypeUint16) ids.foreach { t =>
              require(t >= 0 && t <= 0xFFFF,
                s"PackedCorpus.write: token id $t outside uint16 - use " +
                  "dtype int32 (a silent wrap would corrupt every batch)")
              writeShortLE(bin, t)
            }
            else ids.foreach(t => writeIntLE(bin, t))
          }
        } finally bin.close()
        val idx = new DataOutputStream(new java.io.BufferedOutputStream(
          fs.create(idxStaging, true), 1 << 16))
        try {
          idx.write(Magic)
          writeLongLE(idx, Version)
          idx.writeByte(code)
          writeLongLE(idx, sizes.length.toLong)
          writeLongLE(idx, sizes.length.toLong + 1)
          sizes.foreach(writeIntLE(idx, _))
          var ptr = 0L
          sizes.foreach { s =>
            writeLongLE(idx, ptr); ptr += tokenBytes(code).toLong * s
          }
          (0L to sizes.length.toLong).foreach(writeLongLE(idx, _))
        } finally idx.close()
        def commit(staging: Path, fin: Path): Unit =
          if (!fs.rename(staging, fin)) {
            if (fs.exists(fin)) {
              // a lost rename race is benign ONLY for byte-identical
              // speculative attempts of this very job (the layout is
              // deterministic under a fixed partitioning); anything else
              // — a concurrent foreign writer, a stale survivor the
              // pre-clean missed — must fail loudly, never silently drop
              // this task's bytes. Length equality is the cheap witness:
              // identical attempts write identical byte counts.
              val stagedLen = fs.getFileStatus(staging).getLen
              val finalLen = fs.getFileStatus(fin).getLen
              require(stagedLen == finalLen,
                s"PackedCorpus: $fin exists with $finalLen bytes but this " +
                  s"attempt staged $stagedLen - refusing to drop a " +
                  "non-identical shard (foreign or stale writer?)")
              fs.delete(staging, false)
            }
            else throw new java.io.IOException(
              s"PackedCorpus: rename $staging -> $fin failed")
          }
        commit(binStaging, binFinal)
        commit(idxStaging, idxFinal)
      }
    }
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(dir))
    fs.listStatus(new Path(dir)).iterator.map(_.getPath)
      .filter(_.getName.startsWith(".inprogress-"))
      .foreach(p => fs.delete(p, false))
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  private[sources] def readLongLE(in: InputStream): Long = {
    var v = 0L
    var i = 0
    while (i < 8) {
      val b = in.read()
      if (b < 0) throw new EOFException("PackedCorpus: truncated idx")
      v |= (b.toLong & 0xFF) << (8 * i)
      i += 1
    }
    v
  }
  private[sources] def readIntLE(in: InputStream): Int = {
    var v = 0
    var i = 0
    while (i < 4) {
      val b = in.read()
      if (b < 0) throw new EOFException("PackedCorpus: truncated file")
      v |= (b & 0xFF) << (8 * i)
      i += 1
    }
    v
  }

  /** Parsed `.idx` sidecar: (sizes, pointers, dtype code). Loud on a
    * foreign magic, version or dtype — a corrupt sidecar must never read
    * as data.
    */
  private[graft] def parseIdx(in: InputStream): (Array[Int], Array[Long], Int) = {
    val magic = new Array[Byte](9)
    var got = 0
    while (got < 9) {
      val n = in.read(magic, got, 9 - got)
      if (n < 0) throw new EOFException("PackedCorpus: truncated idx header")
      got += n
    }
    require(java.util.Arrays.equals(magic, Magic),
      s"PackedCorpus: bad idx magic ${magic.toSeq}")
    val version = readLongLE(in)
    require(version == Version, s"PackedCorpus: unsupported idx version $version")
    val dtype = in.read()
    require(dtype == DtypeInt32 || dtype == DtypeUint16,
      s"PackedCorpus: unsupported dtype code $dtype (4 = int32, 8 = uint16)")
    val nSeqLong = readLongLE(in)
    // bounds BEFORE the narrowing cast: a wrapped count would read the
    // wrong sizes/pointers region as data — the exact silent-misparse the
    // "corrupt sidecar must never read as data" contract forbids
    require(nSeqLong >= 0L && nSeqLong <= Int.MaxValue.toLong,
      s"PackedCorpus: sequence count $nSeqLong outside [0, 2^31)")
    val nSeq = nSeqLong.toInt
    val nDoc = readLongLE(in) // read + discard: each sequence is one doc
    require(nDoc >= 0L && nDoc <= Int.MaxValue.toLong,
      s"PackedCorpus: document count $nDoc outside [0, 2^31)")
    require(nDoc == nSeq + 1L,
      s"PackedCorpus: unexpected document count $nDoc for $nSeq sequences")
    val sizes = Array.fill(nSeq)(readIntLE(in))
    val pointers = Array.fill(nSeq)(readLongLE(in))
    (sizes, pointers, dtype)
  }

  private[sources] def readShortLE(in: InputStream): Int = {
    val lo = in.read(); val hi = in.read()
    if (lo < 0 || hi < 0) throw new EOFException("PackedCorpus: truncated file")
    (hi << 8) | lo
  }

  /** Read shards back as (file, seq_ix, ptr, input_ids) — one row per
    * sequence, `seq_ix` the sequence's ordinal within its file, `ptr`
    * its byte offset in the `.bin`. A thin wrapper over the
    * `packedcorpus` DataSource V2 (ONE reading path — the roundtrip
    * specs, the oracle rows and any user scan all exercise the same
    * partition reader), minus the `n_tokens` convenience column.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("packedcorpus").load(dir)
      .select("file", "seq_ix", "ptr", "input_ids")
}

/** `spark.read.format("packedcorpus")` — the DataSource V2 face of the
  * shard layout, for auditing/accounting/decontaminating packed corpora
  * at scale: one InputPartition per `.bin`/`.idx` pair (trainer corpora
  * ship thousands of shard files), schema
  * `(file, seq_ix, ptr, n_tokens, input_ids)`, and COLUMN PRUNING that
  * never opens the `.bin` at all when `input_ids` is pruned away — a
  * token-accounting pass over a 100 TB shard corpus reads only the
  * 12-bytes-per-sequence sidecars. Both dtypes (int32/uint16) read
  * transparently; `_SUCCESS`/dot files are skipped like every source
  * here.
  */
class PackedCorpusDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "packedcorpus"
  override def supportsExternalMetadata(): Boolean = false
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PackedCorpusSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    new PackedCorpusTable(
      WarcSource.resolvePaths(properties.asScala.toMap, "packedcorpus"))
}

object PackedCorpusSource {
  val schema: StructType = StructType(Seq(
    StructField("file", StringType),      // shard .bin name (provenance)
    StructField("seq_ix", LongType),      // ordinal within its shard
    StructField("ptr", LongType),         // byte offset in the .bin
    StructField("n_tokens", IntegerType), // sidecar size entry
    StructField("input_ids", ArrayType(IntegerType, containsNull = false)),
  ))
}

class PackedCorpusTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"packedcorpus(${paths.mkString(",")})"
  override def schema(): StructType = PackedCorpusSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PackedCorpusScanBuilder(paths)
}

class PackedCorpusScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = PackedCorpusSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new PackedCorpusScan(paths, required)
}

class PackedCorpusScan(paths: Seq[String], required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    WarcSource.expand(paths, conf, "packedcorpus")
      .filter(_.endsWith(".idx"))
      .map(f => PackedCorpusInputPartition(f)).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confGetter = GraftShims.serializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    PackedCorpusReaderFactory(required.fieldNames, confGetter)
  }
}

case class PackedCorpusInputPartition(idxFile: String) extends InputPartition

case class PackedCorpusReaderFactory(fields: Array[String],
    confGetter: () => Configuration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PackedCorpusReader(
      partition.asInstanceOf[PackedCorpusInputPartition].idxFile,
      fields, confGetter())
}

/** One row per sequence of one shard pair. The `.bin` opens ONLY when
  * `input_ids` is required — sidecar-only scans (counts, token totals,
  * pointer audits) touch 12 B/sequence of metadata and zero token bytes.
  */
class PackedCorpusReader(idxFile: String, fields: Array[String],
    conf: Configuration) extends PartitionReader[InternalRow] {
  private val fs = new Path(idxFile).getFileSystem(conf)
  private val (sizes, pointers, dtype) = {
    val in = new java.io.BufferedInputStream(fs.open(new Path(idxFile)), 1 << 16)
    try PackedCorpus.parseIdx(in) finally in.close()
  }
  private val needIds = fields.contains("input_ids")
  private val binPath = new Path(idxFile.stripSuffix(".idx") + ".bin")
  private val bin =
    if (needIds) new java.io.BufferedInputStream(fs.open(binPath), 1 << 16)
    else null
  private val fileStr = UTF8String.fromString(binPath.getName)
  private var ix = -1
  private var pos = 0L
  private var row: InternalRow = _

  override def next(): Boolean = {
    ix += 1
    if (ix >= sizes.length) return false
    val n = sizes(ix)
    // the forward stream only reads the right bytes if pointers are the
    // exact prefix sums — a corrupt sidecar must fail, never shift every
    // downstream sequence silently
    require(pointers(ix) == pos,
      s"PackedCorpus: non-contiguous pointer ${pointers(ix)} " +
        s"(expected $pos) in $binPath")
    pos += PackedCorpus.tokenBytes(dtype).toLong * n
    val ids: GenericArrayData =
      if (!needIds) null
      else {
        val arr = new Array[Int](n)
        var i = 0
        while (i < n) {
          arr(i) = if (dtype == 8) PackedCorpus.readShortLE(bin)
            else PackedCorpus.readIntLE(bin)
          i += 1
        }
        new GenericArrayData(arr)
      }
    val values: Array[Any] = fields.map {
      case "file"      => fileStr
      case "seq_ix"    => ix.toLong
      case "ptr"       => pointers(ix)
      case "n_tokens"  => n
      case "input_ids" => ids
      case other => throw new IllegalArgumentException(
        s"packedcorpus: unknown field $other")
    }
    row = InternalRow.fromSeq(values.toIndexedSeq)
    true
  }

  override def get(): InternalRow = row
  override def close(): Unit = if (bin != null) bin.close()
}
