package graft.sources

import java.io.{DataOutputStream, EOFException, InputStream}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame, GraftShims, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, IsNotNull, LessThan, LessThanOrEqual}
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
  *    dtype uint8, sequence count int64le, document count int64le, then
  *    sizes int32le × n, pointers int64le × n (BYTE offset of each
  *    sequence in the `.bin` — the prefix sum of width·sizes), and the
  *    document index int64le × docCount: the sequence indices where a new
  *    DOCUMENT begins, terminated by n. Rows that carry no document
  *    structure get the identity index 0..n (each sequence is one
  *    document); rows from the concat-then-chunk packer carry the REAL
  *    boundaries (`doc_start` — where the first token of the sequence
  *    begins a document), so document-level sampling/shuffling groups
  *    sequences without ever splitting a document.
  *
  * SIDE CHANNELS (the SFT-export surface): the loss mask and segment ids
  * the packers materialize survive export as parallel pairs next to the
  * token pair — `part-NNNNN.mask.bin`/`.mask.idx` (uint8, dtype code 1:
  * 1 = train on this position) and `part-NNNNN.seg.bin`/`.seg.idx`
  * (int32: the packer's 0-based document ordinal, −1 on padding) — the
  * same MMIDIDX sidecar form, sizes identical to the token channel's, the
  * public parallel-channel convention for mask/label streams (the token
  * `.bin`/`.idx` format itself has no mask channel). A trainer that
  * mounts only the token pair sees a standard corpus; an SFT trainer maps
  * the mask pair beside it and computes loss on real targets only.
  *
  * Spark-first sharding, the [[TarShards.write]] discipline verbatim:
  * rows hash-repartition on the first order column and sort by
  * `orderCols` within the task, so shard bytes are DETERMINISTIC under a
  * fixed partitioning; each task streams its `.bin`/`.idx` pairs into
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
    * table (1 = uint8 — the mask channel; 4 = int32; 8 = uint16 — the
    * halved-bytes layout trainers use when the vocabulary fits 16 bits).
    */
  private val Magic: Array[Byte] =
    "MMIDIDX".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0, 0)
  private val Version = 1L
  private[sources] val DtypeUint8: Byte = 1
  private[sources] val DtypeInt32: Byte = 4
  private[sources] val DtypeUint16: Byte = 8

  private def dtypeCode(dtype: String): Byte = dtype.toLowerCase match {
    case "int32"  => DtypeInt32
    case "uint16" => DtypeUint16
    case other => throw new IllegalArgumentException(
      s"PackedCorpus: unknown dtype '$other' (int32 | uint16)")
  }
  private[sources] def tokenBytes(code: Int): Int = code match {
    case DtypeUint8  => 1
    case DtypeUint16 => 2
    case _           => 4
  }

  /** Remove a previous export's final artifacts (part files of every
    * channel, _SUCCESS) and any stale staging orphans from `dir` so a
    * re-export can never publish a stale shard under a fresh _SUCCESS.
    * Driver-side, BEFORE the write job.
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

  /** One MMIDIDX sidecar: header + sizes + width-scaled pointers + the
    * document index (`docStarts` = ascending sequence indices where a
    * document begins; the terminating n entry is appended here).
    */
  private def writeIdx(out: DataOutputStream, code: Byte, sizes: Seq[Int],
      docStarts: Seq[Long]): Unit = {
    out.write(Magic)
    writeLongLE(out, Version)
    out.writeByte(code)
    writeLongLE(out, sizes.length.toLong)
    writeLongLE(out, docStarts.length.toLong + 1)
    sizes.foreach(writeIntLE(out, _))
    var ptr = 0L
    sizes.foreach { s =>
      writeLongLE(out, ptr); ptr += tokenBytes(code).toLong * s
    }
    docStarts.foreach(writeLongLE(out, _))
    writeLongLE(out, sizes.length.toLong)
  }

  /** Write `idsCol` (array&lt;int&gt;) as packed shards under `dir`. One
    * `.bin`/`.idx` pair per task; `numTasks` 0 keeps the session's
    * shuffle width. Null/empty arrays are rejected loudly — a trainer
    * shard with zero-length documents breaks samplers downstream, so an
    * upstream bug must not serialize. `dtype` "uint16" halves shard
    * bytes and rejects any token outside [0, 65535] loudly (a silent
    * wrap would corrupt every downstream batch).
    *
    * `maskCol`/`segCol` (array&lt;boolean&gt; / array&lt;int&gt;, same
    * length as the ids — loud on misalignment) export as parallel
    * `.mask`/`.seg` channel pairs; `docStartCol` (boolean: this
    * sequence's FIRST token begins a document — [[graft.llm.Pack
    * .packTokens]] emits it) turns the identity document index into the
    * real one. The first sequence of every shard file must start a
    * document (packing streams never open a file mid-document); loud
    * otherwise.
    */
  def write(df: DataFrame, dir: String, idsCol: String = "input_ids",
      orderCols: Seq[String] = Seq("shard", "seq_id"),
      numTasks: Int = 0, dtype: String = "int32",
      maskCol: Option[String] = None, segCol: Option[String] = None,
      docStartCol: Option[String] = None): Unit = {
    require(orderCols.nonEmpty, "PackedCorpus.write: orderCols must be non-empty")
    val code = dtypeCode(dtype)
    val spark = df.sparkSession
    val confGetter =
      GraftShims.serializableHadoopConf(spark.sessionState.newHadoopConf())
    val nullArr = (t: String) => lit(null).cast(s"array<$t>")
    val slim = df.select(
      struct(orderCols.map(col): _*).as("__ord"),
      col(idsCol).cast("array<int>").as("__ids"),
      maskCol.map(c => col(c).cast("array<boolean>"))
        .getOrElse(nullArr("boolean")).as("__msk"),
      segCol.map(c => col(c).cast("array<int>"))
        .getOrElse(nullArr("int")).as("__seg"),
      docStartCol.map(c => col(c).cast("boolean"))
        .getOrElse(lit(true)).as("__ds"))
    val parted = (if (numTasks > 0) slim.repartition(numTasks, col("__ord." + orderCols.head))
                  else slim.repartition(col("__ord." + orderCols.head)))
      .sortWithinPartitions(col("__ord"))
      .select("__ids", "__msk", "__seg", "__ds")
    val writeMask = maskCol.isDefined
    val writeSeg = segCol.isDefined
    val realDocIdx = docStartCol.isDefined
    // Re-export into a non-empty dir must never publish STALE shards
    // under a fresh _SUCCESS: a previous job's part files that this job's
    // task layout doesn't overwrite (fewer tasks, different names) would
    // otherwise survive and read back as data. Clean every prior final
    // artifact BEFORE the job — overwrite semantics, stated loudly here
    // rather than diverging by filesystem (raw-local rename overwrites,
    // HDFS refuses).
    preClean(dir, spark.sessionState.newHadoopConf())
    parted.foreachPartition { rows: Iterator[Row] =>
      if (rows.hasNext) {
        val task = TaskContext.getPartitionId()
        val attempt = Option(TaskContext.get()).map(_.taskAttemptId()).getOrElse(0L)
        val fs = new Path(dir).getFileSystem(confGetter())
        fs.mkdirs(new Path(dir))
        val base = f"part-$task%05d"
        def staging(suffix: String) =
          new Path(dir, s".inprogress-$attempt-$base$suffix")
        def fin(suffix: String) = new Path(dir, s"$base$suffix")
        def open(suffix: String) = new DataOutputStream(
          new java.io.BufferedOutputStream(fs.create(staging(suffix), true), 1 << 16))
        val bin = open(".bin")
        val maskBin = if (writeMask) open(".mask.bin") else null
        val segBin = if (writeSeg) open(".seg.bin") else null
        val sizes = new scala.collection.mutable.ArrayBuffer[Int]()
        val docStarts = new scala.collection.mutable.ArrayBuffer[Long]()
        try {
          for (r <- rows) {
            val ids = if (r.isNullAt(0)) null else r.getSeq[Int](0)
            require(ids != null && ids.nonEmpty,
              "PackedCorpus.write: null/empty token sequence - filter " +
                "upstream (a zero-length document breaks trainer samplers)")
            if (realDocIdx) {
              require(!r.isNullAt(3),
                "PackedCorpus.write: null doc_start - the doc-start flag " +
                  "must be present on every row when docStartCol is given")
              if (r.getBoolean(3)) docStarts += sizes.length.toLong
              else require(sizes.nonEmpty,
                "PackedCorpus.write: a shard file's FIRST sequence must " +
                  "start a document (doc_start=false at sequence 0 means " +
                  "the packing stream was split mid-document)")
            } else docStarts += sizes.length.toLong
            sizes += ids.length
            if (code == DtypeUint16) ids.foreach { t =>
              require(t >= 0 && t <= 0xFFFF,
                s"PackedCorpus.write: token id $t outside uint16 - use " +
                  "dtype int32 (a silent wrap would corrupt every batch)")
              writeShortLE(bin, t)
            }
            else ids.foreach(t => writeIntLE(bin, t))
            if (writeMask) {
              val m = if (r.isNullAt(1)) null else r.getSeq[Boolean](1)
              require(m != null && m.length == ids.length,
                s"PackedCorpus.write: mask/ids length mismatch (" +
                  s"${if (m == null) "null" else m.length} vs ${ids.length})")
              m.foreach(b => maskBin.writeByte(if (b) 1 else 0))
            }
            if (writeSeg) {
              val g = if (r.isNullAt(2)) null else r.getSeq[Int](2)
              require(g != null && g.length == ids.length,
                s"PackedCorpus.write: segment/ids length mismatch (" +
                  s"${if (g == null) "null" else g.length} vs ${ids.length})")
              g.foreach(writeIntLE(segBin, _))
            }
          }
        } finally {
          bin.close()
          if (maskBin != null) maskBin.close()
          if (segBin != null) segBin.close()
        }
        def sidecar(suffix: String, dcode: Byte): Unit = {
          val idx = open(suffix)
          try writeIdx(idx, dcode, sizes.toSeq, docStarts.toSeq)
          finally idx.close()
        }
        sidecar(".idx", code)
        if (writeMask) sidecar(".mask.idx", DtypeUint8)
        if (writeSeg) sidecar(".seg.idx", DtypeInt32)
        def commit(suffix: String): Unit = {
          val st = staging(suffix)
          val f = fin(suffix)
          if (!fs.rename(st, f)) {
            if (fs.exists(f)) {
              // a lost rename race is benign ONLY for byte-identical
              // speculative attempts of this very job (the layout is
              // deterministic under a fixed partitioning); anything else
              // — a concurrent foreign writer, a stale survivor the
              // pre-clean missed — must fail loudly, never silently drop
              // this task's bytes. Length is the fast pre-filter; the
              // identity witness is a FULL streaming byte compare (a
              // same-length foreign shard must not be accepted as the
              // winner) — the race path is exceptional, so the extra
              // read costs nothing in the steady state.
              val stagedLen = fs.getFileStatus(st).getLen
              val finalLen = fs.getFileStatus(f).getLen
              require(stagedLen == finalLen,
                s"PackedCorpus: $f exists with $finalLen bytes but this " +
                  s"attempt staged $stagedLen - refusing to drop a " +
                  "non-identical shard (foreign or stale writer?)")
              require(sameBytes(fs, st, f),
                s"PackedCorpus: $f exists with the same length but " +
                  s"DIFFERENT bytes than this attempt's staged $st - " +
                  "refusing to drop a non-identical shard (foreign or " +
                  "stale writer?)")
              fs.delete(st, false)
            }
            else throw new java.io.IOException(
              s"PackedCorpus: rename $st -> $f failed")
          }
        }
        commit(".bin")
        commit(".idx")
        if (writeMask) { commit(".mask.bin"); commit(".mask.idx") }
        if (writeSeg) { commit(".seg.bin"); commit(".seg.idx") }
      }
    }
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    fs.mkdirs(new Path(dir))
    fs.listStatus(new Path(dir)).iterator.map(_.getPath)
      .filter(_.getName.startsWith(".inprogress-"))
      .foreach(p => fs.delete(p, false))
    fs.create(new Path(dir, "_SUCCESS"), true).close()
  }

  /** Streaming byte-equality of two files, short-circuiting on the first
    * differing chunk — the rename-race identity witness ([[write]]'s
    * commit step). Only ever runs on the exceptional lost-race path.
    */
  private def sameBytes(fs: org.apache.hadoop.fs.FileSystem,
      a: Path, b: Path): Boolean = {
    val ia = new java.io.BufferedInputStream(fs.open(a), 1 << 16)
    val ib = new java.io.BufferedInputStream(fs.open(b), 1 << 16)
    try {
      val ba = new Array[Byte](1 << 16)
      val bb = new Array[Byte](1 << 16)
      var same = true
      var eof = false
      while (same && !eof) {
        def fill(in: InputStream, buf: Array[Byte]): Int = {
          var off = 0
          var n = 0
          while (off < buf.length && n >= 0) {
            n = in.read(buf, off, buf.length - off)
            if (n > 0) off += n
          }
          off
        }
        val na = fill(ia, ba)
        val nb = fill(ib, bb)
        if (na != nb ||
            !java.util.Arrays.equals(ba, 0, na, bb, 0, nb)) same = false
        else if (na < ba.length) eof = true
      }
      same
    } finally { ia.close(); ib.close() }
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

  /** Parsed `.idx` sidecar: (sizes, pointers, docStarts, dtype code) —
    * `docStarts` the document index WITHOUT its terminating n entry, so
    * `docStarts.contains(i)` ⟺ sequence i begins a document. Loud on a
    * foreign magic, version, dtype, count, or a non-monotone document
    * index — a corrupt sidecar must never read as data.
    */
  private[graft] def parseIdx(in: InputStream): (Array[Int], Array[Long], Array[Long], Int) = {
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
    require(dtype == DtypeUint8 || dtype == DtypeInt32 || dtype == DtypeUint16,
      s"PackedCorpus: unsupported dtype code $dtype (1 = uint8, 4 = int32, 8 = uint16)")
    val nSeqLong = readLongLE(in)
    // bounds BEFORE the narrowing cast: a wrapped count would read the
    // wrong sizes/pointers region as data — the exact silent-misparse the
    // "corrupt sidecar must never read as data" contract forbids
    require(nSeqLong >= 0L && nSeqLong <= Int.MaxValue.toLong,
      s"PackedCorpus: sequence count $nSeqLong outside [0, 2^31)")
    val nSeq = nSeqLong.toInt
    val nDoc = readLongLE(in)
    require(nDoc >= 1L && nDoc <= nSeq + 1L,
      s"PackedCorpus: document count $nDoc outside [1, $nSeq + 1]")
    val sizes = Array.fill(nSeq)(readIntLE(in))
    val pointers = Array.fill(nSeq)(readLongLE(in))
    val docIdx = Array.fill(nDoc.toInt)(readLongLE(in))
    require(docIdx.headOption.contains(0L) && docIdx.last == nSeq.toLong &&
        docIdx.iterator.sliding(2).withPartial(false).forall(w => w(0) < w(1)),
      s"PackedCorpus: document index must ascend 0..$nSeq")
    (sizes, pointers, docIdx.dropRight(1), dtype)
  }

  private[sources] def readShortLE(in: InputStream): Int = {
    val lo = in.read(); val hi = in.read()
    if (lo < 0 || hi < 0) throw new EOFException("PackedCorpus: truncated file")
    (hi << 8) | lo
  }

  /** Input-corpus layout probe shared by the corpus-to-corpus rewrites
    * ([[reshuffle]], [[rewriteExcluding]]): which channels exist, and the
    * token width sniffed off the first sidecar (so a uint16 corpus never
    * silently doubles to int32 on rewrite).
    */
  private def corpusLayout(fs: org.apache.hadoop.fs.FileSystem,
      inDir: String, dtype: String): (Boolean, Boolean, String) = {
    // glob-aware expansion (the DSv2 Path contract is "directory or
    // glob", so the rewrite utilities must not FileNotFound on a glob) —
    // but the rewrites key sequences by BASENAME `file`, so inputs
    // spanning MULTIPLE directories would collide duplicate
    // (file, seq_ix) keys (e.g. daemon batch=N dirs all holding
    // part-00000.bin). Reject those loudly with the single-flat-dir
    // requirement instead of corrupting the rewrite.
    val conf = fs.getConf
    val files = WarcSource.expand(Seq(inDir), conf, "packedcorpus")
    val parents = files.map(f => new Path(f).getParent.toUri.getPath).distinct
    require(parents.length == 1,
      s"PackedCorpus: corpus rewrites (reshuffle/rewriteExcluding) require " +
        s"a SINGLE flat shard directory - '$inDir' resolves to files under " +
        s"${parents.length} directories [${parents.take(5).mkString(", ")}" +
        s"${if (parents.length > 5) ", ..." else ""}]; sequence identity is " +
        "the shard BASENAME, so multi-directory inputs would collide " +
        "duplicate (file, seq_ix) keys")
    val present = files.map(f => new Path(f).getName)
    val hasMask = present.exists(_.endsWith(".mask.idx"))
    val hasSeg = present.exists(_.endsWith(".seg.idx"))
    val outDtype = if (dtype.nonEmpty) dtype else {
      val first = present.filter(PackedCorpusSource.isTokenIdx).sorted.headOption
        .getOrElse(throw new IllegalArgumentException(
          s"PackedCorpus: no .idx sidecars under $inDir"))
      val in = new java.io.BufferedInputStream(
        fs.open(new Path(parents.head, first)), 1 << 16)
      val code = try parseIdx(in)._4 finally in.close()
      if (code == DtypeUint16) "uint16" else "int32"
    }
    (hasMask, hasSeg, outDtype)
  }

  /** Refuse corpus-to-corpus rewrites whose target aliases the source:
    * [[write]] pre-cleans the TARGET before the lazy read job plans, so
    * an aliased pair would DELETE the input. Paths canonicalize through
    * the filesystem when they exist (symlinks) and through URI
    * normalization otherwise (`..` segments) — `makeQualified` alone
    * resolves neither.
    */
  private def requireDistinctDirs(fs: org.apache.hadoop.fs.FileSystem,
      inDir: String, outDir: String, op: String): Unit = {
    def canon(d: String): java.net.URI = {
      val q = fs.makeQualified(new Path(d))
      val resolved = try fs.resolvePath(q)
        catch { case _: java.io.IOException => q } // target may not exist yet
      resolved.toUri.normalize()
    }
    require(canon(inDir) != canon(outDir),
      s"PackedCorpus.$op: outDir must differ from inDir ($inDir) - " +
        "the writer sweeps the target before the read job runs")
  }

  /** Per-file document-group numbering over a corpus frame: `__grp` =
    * the cumulative `doc_start` count in `seq_ix` order — the
    * document-integrity invariant both corpus rewrites depend on, stated
    * once. The window partitions by `file`, so the exchange it induces
    * carries exactly the columns of the frame it is applied to (apply it
    * to a sidecar-only projection when the payload isn't needed).
    */
  private def withDocGroups(df: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("file").orderBy("seq_ix")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    df.withColumn("__grp", sum(col("doc_start").cast("long")).over(w))
  }

  /** Deterministic at-rest EPOCH SHUFFLE of a packed corpus, the
    * document-group-preserving kind the doc index exists for: sequences
    * between consecutive `doc_start` marks tile whole documents, so the
    * shuffle permutes those GROUPS (a seeded md5 key per group — the
    * engine's restatable-randomness idiom) and keeps intra-group order;
    * no document is ever split across the permutation, mask/segment
    * channels ride along when the input corpus carries them, and the
    * rewritten doc index stays REAL (each group lands contiguously with
    * its `doc_start` marks intact). A trainer mounts a freshly shuffled
    * epoch without any loader-side shuffling state.
    *
    * Scale shape: one DSv2 scan, then exactly TWO corpus exchanges — the
    * per-file group-numbering window and the writer's key partition (the
    * group key is a per-row window product, so it cannot be derived
    * without the first exchange; an epoch shuffle inherently pays the
    * second). Shuffle keys are uniform md5 bits partitioned DIRECTLY, so
    * output shards balance regardless of input skew. `dtype` defaults to
    * the INPUT corpus's token width (sniffed off the first sidecar);
    * pass it explicitly to re-width.
    */
  def reshuffle(spark: SparkSession, inDir: String, outDir: String,
      numShards: Int, seed: String, dtype: String = ""): Unit = {
    require(numShards > 0, s"PackedCorpus.reshuffle: numShards $numShards")
    val fs = new Path(inDir).getFileSystem(spark.sessionState.newHadoopConf())
    requireDistinctDirs(fs, inDir, outDir, "reshuffle")
    val (hasMask, hasSeg, outDtype) = corpusLayout(fs, inDir, dtype)
    val keyed = withDocGroups(spark.read.format("packedcorpus").load(inDir))
      // md5 over (seed | file | group): deterministic, uniform, and an
      // external SQL engine recomputes it verbatim (the q_mix_sample
      // restatable-shuffle idiom — never a JVM-private RNG)
      .withColumn("__key",
        md5(concat_ws("|", lit(seed), col("file"), col("__grp").cast("string"))))
    // partition DIRECTLY on the md5 key (distinct per group, uniform):
    // deriving a small shard ordinal first and re-hashing it would
    // co-locate shard ids at small numShards (murmur3 over {0..k−1} is
    // not a bijection mod k) — one output file holding everything is
    // exactly the imbalance an epoch shuffle must not produce
    write(keyed, outDir, idsCol = "input_ids",
      orderCols = Seq("__key", "seq_ix"), numTasks = numShards,
      dtype = outDtype,
      maskCol = if (hasMask) Some("loss_mask") else None,
      segCol = if (hasSeg) Some("segment_ids") else None,
      docStartCol = Some("doc_start"))
  }

  /** Rewrite a packed corpus EXCLUDING the given sequences — the
    * right-to-be-forgotten / decontamination surgery for immutable
    * trainer shards (the [[graft.streaming.StoreLayout]] RTBF stance
    * carried to the export format): `drop` is a (file, seq_ix) frame
    * (e.g. the flagged set from an id-n-gram decontamination pass or a
    * takedown list), survivors re-export into `outDir` (immutable
    * corpora are versioned, never patched in place) with channels and
    * the document index carried. Sequences keep their original
    * (file, seq_ix) order, so the rewrite is reproducible byte for byte.
    *
    * Every drop row MUST match a corpus sequence — a stale or mistyped
    * takedown list (renamed files, renumbered seq_ix from an earlier
    * rewrite) silently shipping the flagged content under a fresh
    * _SUCCESS is the one failure a compliance rewrite may never have, so
    * unmatched rows fail loudly BEFORE anything writes.
    *
    * Document-group integrity: dropping a MID-document sequence would
    * leave a truncated document whose next sequence claims continuation
    * — so the drop set is widened to WHOLE groups (any group with one
    * dropped sequence drops entirely), the same never-split-a-document
    * contract as [[reshuffle]].
    *
    * Plan: group widening runs on a SIDECAR-ONLY projection (file,
    * seq_ix, doc_start — the DSv2 never opens a data file for it), the
    * widened (file, seq_ix) drop set collects and broadcasts (bounded by
    * dropped GROUPS × their sequences — takedown-scale), and the full
    * payload then flows through ONE scan, a broadcast anti-join, and the
    * writer's single exchange — token bytes shuffle exactly once.
    */
  def rewriteExcluding(spark: SparkSession, inDir: String, outDir: String,
      drop: DataFrame, numShards: Int = 0, dtype: String = "",
      maxDrop: Int = 1000000): Unit = {
    val fs = new Path(inDir).getFileSystem(spark.sessionState.newHadoopConf())
    requireDistinctDirs(fs, inDir, outDir, "rewriteExcluding")
    val (hasMask, hasSeg, outDtype) = corpusLayout(fs, inDir, dtype)
    // the caller's drop frame evaluates EXACTLY ONCE (this collect) — the
    // [[graft.streaming.StoreLayout.deleteIds]] bounded-collect
    // discipline: a takedown list is often DERIVED (an id-n-gram audit
    // over the corpus), and the count-then-broadcast shape would re-run
    // that audit once per consumer. Takedown-scale bound, loud beyond.
    val dropKeys = drop.select(col("file").cast("string").as("__df"),
      col("seq_ix").cast("long").as("__ds")).distinct()
    val collected = dropKeys.limit(maxDrop + 1).collect()
    require(collected.length <= maxDrop,
      s"PackedCorpus.rewriteExcluding: more than $maxDrop distinct drop " +
        "rows - a drop set of corpus scale should re-export the KEEP side " +
        "from its own frame instead of a takedown anti-join")
    val doomed = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(collected: _*), dropKeys.schema))
    // sidecar-only widening pass: zero data bytes read
    val grouped = withDocGroups(spark.read.format("packedcorpus").load(inDir)
      .select("file", "seq_ix", "doc_start"))
    val matched = grouped.join(doomed,
      col("file") === col("__df") && col("seq_ix") === col("__ds"))
    val dropGroups = matched.select(col("file").as("__gf"),
      col("__grp").as("__gg")).distinct()
    // widened drop set: bounded by dropped GROUPS × their sequences
    // (takedown-scale) — collected once, so the final anti-join's build
    // side is a local relation, not a window re-computation
    val dropSeqRows = grouped.join(broadcast(dropGroups),
        col("file") === col("__gf") && col("__grp") === col("__gg"))
      .select(col("file").as("__xf"), col("seq_ix").as("__xs"))
      .limit(maxDrop + 1).collect()
    require(dropSeqRows.length <= maxDrop,
      s"PackedCorpus.rewriteExcluding: widened drop set exceeds $maxDrop " +
        "sequences - the flagged document groups cover too much of the " +
        "corpus for a takedown anti-join; re-export the keep side instead")
    val dropSeqs = broadcast(spark.createDataFrame(
      java.util.Arrays.asList(dropSeqRows: _*),
      StructType(Seq(StructField("__xf", StringType),
        StructField("__xs", LongType)))))
    // loud completeness check on the drop list itself (cheap: sidecar
    // cardinalities), before any write touches the target
    val nDrop = collected.length.toLong
    val nMatched = matched.count()
    require(nMatched == nDrop,
      s"PackedCorpus.rewriteExcluding: ${nDrop - nMatched} of $nDrop drop " +
        "rows match no (file, seq_ix) in the corpus - a stale or mistyped " +
        "takedown list must never no-op into a fresh _SUCCESS")
    val survivors = spark.read.format("packedcorpus").load(inDir)
      .join(dropSeqs,
        col("file") === col("__xf") && col("seq_ix") === col("__xs"),
        "left_anti")
    write(survivors, outDir, idsCol = "input_ids",
      orderCols = Seq("file", "seq_ix"), numTasks = numShards,
      dtype = outDtype,
      maskCol = if (hasMask) Some("loss_mask") else None,
      segCol = if (hasSeg) Some("segment_ids") else None,
      docStartCol = Some("doc_start"))
  }

  /** Read shards back as (file, seq_ix, ptr, input_ids) — one row per
    * sequence, `seq_ix` the sequence's ordinal within its file, `ptr`
    * its byte offset in the `.bin`. A thin wrapper over the
    * `packedcorpus` DataSource V2 (ONE reading path — the roundtrip
    * specs, the oracle rows and any user scan all exercise the same
    * partition reader), minus the convenience columns.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("packedcorpus").load(dir)
      .select("file", "seq_ix", "ptr", "input_ids")
}

/** `spark.read.format("packedcorpus")` — the DataSource V2 face of the
  * shard layout, for auditing/accounting/decontaminating packed corpora
  * at scale: one InputPartition per `.bin`/`.idx` pair (trainer corpora
  * ship thousands of shard files), schema `(file, seq_ix, ptr, n_tokens,
  * doc_start, input_ids, loss_mask, segment_ids)`, and COLUMN PRUNING
  * that never opens a data file it doesn't need — a token-accounting
  * pass over a 100 TB shard corpus reads only the sidecars; the `.bin`
  * opens only when `input_ids` is required, the `.mask.bin`/`.seg.bin`
  * channels only when `loss_mask`/`segment_ids` are (null columns when a
  * corpus was exported without the channel). FILTER PUSHDOWN: `file`
  * equality/IN prunes whole shard pairs at planning (untargeted shards
  * never open — the "read one shard of thousands" audit is one pair of
  * file opens), and `n_tokens` range/equality filters evaluate on the
  * sidecar entry BEFORE any data bytes are read (positioned reads skip
  * filtered-out sequences entirely). Both dtypes (int32/uint16) read
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
    StructField("doc_start", BooleanType), // document index: begins a doc
    StructField("input_ids", ArrayType(IntegerType, containsNull = false)),
    // side channels — null when the corpus was exported without them
    StructField("loss_mask", ArrayType(BooleanType, containsNull = false)),
    StructField("segment_ids", ArrayType(IntegerType, containsNull = false)),
  ))

  /** The channel sidecars ride the same `.idx` suffix; only the TOKEN
    * sidecar defines a shard pair.
    */
  private[sources] def isTokenIdx(name: String): Boolean =
    name.endsWith(".idx") && !name.endsWith(".mask.idx") &&
      !name.endsWith(".seg.idx")
}

class PackedCorpusTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"packedcorpus(${paths.mkString(",")})"
  override def schema(): StructType = PackedCorpusSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PackedCorpusScanBuilder(paths)
}

/** Pushdown surface: `file` equality/IN (shard-pair pruning at planning)
  * and `n_tokens` =/&lt;/&le;/&gt;/&ge; (sidecar-entry evaluation before
  * any data read). Both are evaluated EXACTLY by the source, so accepted
  * filters do not re-evaluate above the scan; everything else stays
  * residual.
  */
class PackedCorpusScanBuilder(paths: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = PackedCorpusSource.schema
  private var accepted: Array[Filter] = Array.empty
  private var fileSet: Option[Set[String]] = None
  // LONG bounds: strict comparisons adjust by ±1, and an Int.MaxValue
  // literal must push an IMPOSSIBLE bound, not overflow back to
  // everything-matches (the accepted filter is dropped from the plan,
  // so an unenforced bound would return wrong rows)
  private var minTok: Long = Int.MinValue.toLong
  private var maxTok: Long = Int.MaxValue.toLong

  private def intersect(vs: Set[String]): Unit =
    fileSet = Some(fileSet.map(_.intersect(vs)).getOrElse(vs))

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition {
      case EqualTo("file", _: String) => true
      case In("file", vs) if vs.forall(_.isInstanceOf[String]) => true
      case IsNotNull("file") | IsNotNull("n_tokens") => true // never null
      case EqualTo("n_tokens", _: Number) => true
      case GreaterThan("n_tokens", _: Number) => true
      case GreaterThanOrEqual("n_tokens", _: Number) => true
      case LessThan("n_tokens", _: Number) => true
      case LessThanOrEqual("n_tokens", _: Number) => true
      case _ => false
    }
    sup.foreach {
      case EqualTo("file", v: String) => intersect(Set(v))
      case In("file", vs) => intersect(vs.map(_.asInstanceOf[String]).toSet)
      case EqualTo("n_tokens", v: Number) =>
        minTok = math.max(minTok, v.longValue)
        maxTok = math.min(maxTok, v.longValue)
      case GreaterThan("n_tokens", v: Number) =>
        minTok = math.max(minTok, v.longValue + 1L)
      case GreaterThanOrEqual("n_tokens", v: Number) =>
        minTok = math.max(minTok, v.longValue)
      case LessThan("n_tokens", v: Number) =>
        maxTok = math.min(maxTok, v.longValue - 1L)
      case LessThanOrEqual("n_tokens", v: Number) =>
        maxTok = math.min(maxTok, v.longValue)
      case _ => ()
    }
    accepted = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new PackedCorpusScan(paths, required, fileSet, minTok, maxTok)
}

class PackedCorpusScan(paths: Seq[String], required: StructType,
    fileSet: Option[Set[String]], minTok: Long, maxTok: Long)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def tokenIdxFiles(): Seq[String] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    WarcSource.expand(paths, conf, "packedcorpus")
      .filter(f => PackedCorpusSource.isTokenIdx(new Path(f).getName))
      .filter(f => fileSet.forall(_.contains(
        new Path(f).getName.stripSuffix(".idx") + ".bin")))
  }

  override def planInputPartitions(): Array[InputPartition] =
    tokenIdxFiles().map(f => PackedCorpusInputPartition(f)).toArray

  /** Size estimate for the optimizer (broadcast decisions over shard
    * corpora): the pruned shards' `.bin` byte lengths from the LISTING —
    * one metadata call per shard, never an `.idx` parse at planning.
    * Pushed `file` filters shrink the estimate, so a one-shard audit
    * joined against a big table broadcasts. Row count stays unknown
    * (knowing it would cost a sidecar read per shard).
    */
  override def estimateStatistics(): Statistics = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val bytes = tokenIdxFiles().map { f =>
      val bin = new Path(f.stripSuffix(".idx") + ".bin")
      val fs = bin.getFileSystem(conf)
      try fs.getFileStatus(bin).getLen catch { case _: java.io.IOException => 0L }
    }.sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(math.max(bytes, 1L))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val confGetter = GraftShims.serializableHadoopConf(
      SparkSession.active.sessionState.newHadoopConf())
    PackedCorpusReaderFactory(required.fieldNames, minTok, maxTok, confGetter)
  }

  override def description(): String =
    s"packedcorpus files=${fileSet.map(_.mkString(",")).getOrElse("*")} " +
      s"n_tokens=[${if (minTok == Int.MinValue.toLong) "" else minTok}, " +
      s"${if (maxTok == Int.MaxValue.toLong) "" else maxTok}]"
}

case class PackedCorpusInputPartition(idxFile: String) extends InputPartition

case class PackedCorpusReaderFactory(fields: Array[String],
    minTok: Long, maxTok: Long,
    confGetter: () => Configuration) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new PackedCorpusReader(
      partition.asInstanceOf[PackedCorpusInputPartition].idxFile,
      fields, minTok, maxTok, confGetter())
}

/** One row per sequence of one shard pair. Data files open LAZILY and
  * only when their column is required — sidecar-only scans (counts,
  * token totals, pointer audits) touch ~12 B/sequence of metadata and
  * zero data bytes; a pushed `n_tokens` filter that matches nothing
  * never opens a data file at all. Decoding is BULK over SEQUENTIAL
  * buffered streams: one `readFully` of the sequence's byte extent into
  * a reused buffer (filtered-out sequences skip forward, never decode),
  * then a `ByteBuffer` little-endian bulk get — no per-token virtual
  * calls, so a full-corpus back-scan runs at IO speed, not decode speed
  * (SCALE.md r17 pins the measurement).
  */
class PackedCorpusReader(idxFile: String, fields: Array[String],
    minTok: Long, maxTok: Long,
    conf: Configuration) extends PartitionReader[InternalRow] {
  private val fs = new Path(idxFile).getFileSystem(conf)
  private def parse(p: Path): (Array[Int], Array[Long], Array[Long], Int) = {
    val in = new java.io.BufferedInputStream(fs.open(p), 1 << 16)
    try PackedCorpus.parseIdx(in) finally in.close()
  }
  private val (sizes, pointers, docStarts, dtype) = parse(new Path(idxFile))
  private val docStartSet: java.util.HashSet[Long] = {
    val s = new java.util.HashSet[Long](docStarts.length * 2)
    docStarts.foreach(s.add)
    s
  }
  private val stem = idxFile.stripSuffix(".idx")
  private val binPath = new Path(stem + ".bin")
  private val fileStr = UTF8String.fromString(binPath.getName)

  /** One sequential data stream read in pointer order with tracked
    * position: sequences a pushed filter skipped are SKIPPED in the
    * stream (buffered skip — no bytes decoded, no seek storm), everything
    * else is one bulk `readFully` per sequence. Sequential buffered IO
    * beats per-sequence positioned reads ~40× on a checksummed local FS
    * (measured: pread-per-sequence scanned 34 MB/s single-thread; the
    * sequential form runs at page-cache speed) and is also the friendly
    * pattern for object stores at 100 TB — one ranged GET per shard, not
    * one per sequence.
    */
  private class SeqStream(path: Path) {
    private var in: java.io.DataInputStream = _
    private var at = 0L
    def readFullyAt(ptr: Long, buf: Array[Byte], len: Int): Unit = {
      if (in == null) {
        in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(fs.open(path), 1 << 16))
        at = 0L
      }
      require(ptr >= at,
        s"PackedCorpus: backward read $ptr < $at in $path") // never happens: ix ascends
      var gap = ptr - at
      while (gap > 0) {
        val skipped = in.skip(gap)
        if (skipped <= 0) throw new EOFException(
          s"PackedCorpus: truncated $path (skip at $at)")
        gap -= skipped
      }
      in.readFully(buf, 0, len)
      at = ptr + len
    }
    def close(): Unit = if (in != null) in.close()
  }

  /** One side channel: its own sidecar (sizes must equal the token
    * channel's — a torn export must fail, never misalign every mask) and
    * a lazily-opened sequential data stream.
    */
  private class Channel(suffix: String, expectCode: Int) {
    private val idxPath = new Path(stem + suffix + ".idx")
    // lazy: a scan that never asks for this channel's column must not
    // pay a namenode existence probe per partition
    lazy val present: Boolean = fs.exists(idxPath)
    private lazy val (chSizes, chPointers, _, chCode) = parse(idxPath)
    private val in = new SeqStream(new Path(stem + suffix + ".bin"))
    private var checked = false
    private var buf: Array[Byte] = Array.emptyByteArray
    def readBytes(ix: Int): (Array[Byte], Int) = {
      if (!checked) {
        require(chCode == expectCode,
          s"PackedCorpus: channel $suffix dtype $chCode (expected $expectCode)")
        require(chSizes.length == sizes.length,
          s"PackedCorpus: channel $suffix has ${chSizes.length} sequences " +
            s"vs ${sizes.length} token sequences in $binPath")
        checked = true
      }
      require(chSizes(ix) == sizes(ix),
        s"PackedCorpus: channel $suffix sequence $ix has ${chSizes(ix)} " +
          s"entries vs ${sizes(ix)} tokens in $binPath")
      // same contiguity contract as the token channel: the channel
      // pointer must be the width-scaled image of the (already-verified)
      // token pointer — a forward-jumping corrupt channel sidecar must
      // fail, never read shifted bytes as mask/segment data
      require(chPointers(ix) * PackedCorpus.tokenBytes(dtype).toLong ==
          pointers(ix) * PackedCorpus.tokenBytes(expectCode).toLong,
        s"PackedCorpus: channel $suffix pointer ${chPointers(ix)} at " +
          s"sequence $ix disagrees with token pointer ${pointers(ix)} " +
          s"in $binPath")
      val len = chSizes(ix) * PackedCorpus.tokenBytes(expectCode)
      if (buf.length < len) buf = new Array[Byte](len)
      in.readFullyAt(chPointers(ix), buf, len)
      (buf, len)
    }
    def close(): Unit = in.close()
  }

  private val needIds = fields.contains("input_ids")
  private val needMask = fields.contains("loss_mask")
  private val needSeg = fields.contains("segment_ids")
  private val bin = new SeqStream(binPath)
  private var binBuf: Array[Byte] = Array.emptyByteArray
  private val mask = new Channel(".mask", PackedCorpus.DtypeUint8)
  private val seg = new Channel(".seg", PackedCorpus.DtypeInt32)
  private var ix = -1
  private var pos = 0L
  private var row: InternalRow = _

  private def readIds(ix: Int): GenericArrayData = {
    val n = sizes(ix)
    val width = PackedCorpus.tokenBytes(dtype)
    val len = n * width
    if (binBuf.length < len) binBuf = new Array[Byte](len)
    bin.readFullyAt(pointers(ix), binBuf, len)
    val bb = java.nio.ByteBuffer.wrap(binBuf, 0, len)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val arr = new Array[Int](n)
    if (dtype == PackedCorpus.DtypeUint16) {
      val sb = bb.asShortBuffer()
      var i = 0
      while (i < n) { arr(i) = sb.get(i) & 0xFFFF; i += 1 }
    } else {
      bb.asIntBuffer().get(arr)
    }
    new GenericArrayData(arr)
  }

  override def next(): Boolean = {
    while (true) {
      ix += 1
      if (ix >= sizes.length) return false
      val n = sizes(ix)
      // pointers must be the exact prefix sums — a corrupt sidecar must
      // fail, never shift every downstream sequence silently
      require(pointers(ix) == pos,
        s"PackedCorpus: non-contiguous pointer ${pointers(ix)} " +
          s"(expected $pos) in $binPath")
      pos += PackedCorpus.tokenBytes(dtype).toLong * n
      if (n >= minTok && n <= maxTok) {
        val values: Array[Any] = fields.map {
          case "file"      => fileStr
          case "seq_ix"    => ix.toLong
          case "ptr"       => pointers(ix)
          case "n_tokens"  => n
          case "doc_start" => docStartSet.contains(ix.toLong)
          case "input_ids" => if (needIds) readIds(ix) else null
          case "loss_mask" =>
            if (!needMask || !mask.present) null
            else {
              val (b, len) = mask.readBytes(ix)
              val arr = new Array[Boolean](len)
              var i = 0
              while (i < len) { arr(i) = b(i) != 0; i += 1 }
              new GenericArrayData(arr)
            }
          case "segment_ids" =>
            if (!needSeg || !seg.present) null
            else {
              val (b, len) = seg.readBytes(ix)
              val arr = new Array[Int](len / 4)
              java.nio.ByteBuffer.wrap(b, 0, len)
                .order(java.nio.ByteOrder.LITTLE_ENDIAN)
                .asIntBuffer().get(arr)
              new GenericArrayData(arr)
            }
          case other => throw new IllegalArgumentException(
            s"packedcorpus: unknown field $other")
        }
        row = InternalRow.fromSeq(values.toIndexedSeq)
        return true
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = {
    bin.close()
    mask.close()
    seg.close()
  }
}
