package graft.sources

import java.io.{InputStream, OutputStream}

import com.github.luben.zstd.{ZstdInputStreamNoFinalizer, ZstdOutputStreamNoFinalizer}
import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.io.compress._

/** Hadoop `CompressionCodec` for `.zst` files backed by zstd-jni (already on
  * Spark's classpath for shuffle compression). Hadoop's own ZStandardCodec
  * needs libhadoop native, which this environment lacks; registering this
  * codec makes `spark.read.csv("*.csv.zst")` and
  * `df.write.option("compression", classOf[ZstdCodec].getName)` work —
  * matching the reference's first-class zstd IO
  * (reference: input/inpututils/compressedstream.go:271-283 shells out to
  * external zstd for the same reason).
  *
  * Register with [[ZstdCodec.register]] (adds to `io.compression.codecs`).
  * Level is read from `graft.zstd.level` (default 3, the reference's
  * FileWriter default, output/filewriter.go:26-100).
  */
class ZstdCodec extends CompressionCodec with Configurable {

  private var conf: Configuration = new Configuration(false)
  override def setConf(c: Configuration): Unit = conf = c
  override def getConf: Configuration = conf

  private def level: Int = if (conf == null) 3 else conf.getInt("graft.zstd.level", 3)
  // long-distance matching window (2^N bytes); 0 = off. Matches the
  // reference FileWriter's ZstdWindowLog (output/filewriter.go:26-100).
  private def windowLog: Int =
    if (conf == null) 0 else conf.getInt("graft.zstd.windowLog", 0)

  override def getDefaultExtension: String = ".zst"

  override def createOutputStream(rawOut: OutputStream): CompressionOutputStream =
    new CompressionOutputStream(rawOut) {
      private val z = {
        val s = new ZstdOutputStreamNoFinalizer(rawOut, level)
        if (windowLog > 0) s.setLong(windowLog)
        s
      }
      private var finished = false
      override def write(b: Int): Unit = z.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = z.write(b, off, len)
      override def finish(): Unit = if (!finished) { finished = true; z.close() }
      override def resetState(): Unit = ()
      override def flush(): Unit = if (!finished) z.flush()
      override def close(): Unit = { finish() }
    }

  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(rawIn: InputStream): CompressionInputStream =
    new CompressionInputStream(rawIn) {
      // accept any window size on read: files written with long-distance
      // matching (large window logs) would otherwise fail to decode
      private val z = new ZstdInputStreamNoFinalizer(rawIn)
        .setContinuous(true).setLongMax(31)
      override def read(): Int = z.read()
      override def read(b: Array[Byte], off: Int, len: Int): Int = z.read(b, off, len)
      override def resetState(): Unit = ()
      override def available(): Int = z.available()
      override def close(): Unit = z.close()
    }

  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  // CodecPool instantiates these via reflection; our streams never use
  // them, so they are inert placeholders.
  override def getCompressorType: Class[_ <: Compressor] = classOf[ZstdNoopCompressor]
  override def createCompressor(): Compressor = new ZstdNoopCompressor
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[ZstdNoopDecompressor]
  override def createDecompressor(): Decompressor = new ZstdNoopDecompressor
}

object ZstdCodec {
  /** Add this codec to a Hadoop conf's codec list (idempotent). */
  def register(conf: Configuration): Unit = {
    val key = "io.compression.codecs"
    val name = classOf[ZstdCodec].getName
    val cur = Option(conf.get(key)).getOrElse("")
    if (!cur.contains(name))
      conf.set(key, if (cur.isEmpty) name else s"$cur,$name")
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    register(spark.sparkContext.hadoopConfiguration)
}

/** Inert Compressor: exists only so CodecPool reflection succeeds. */
class ZstdNoopCompressor extends Compressor {
  override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
  override def needsInput(): Boolean = true
  override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
  override def getBytesRead: Long = 0
  override def getBytesWritten: Long = 0
  override def finish(): Unit = ()
  override def finished(): Boolean = true
  override def compress(b: Array[Byte], off: Int, len: Int): Int = 0
  override def reset(): Unit = ()
  override def end(): Unit = ()
  override def reinit(conf: Configuration): Unit = ()
}

/** Inert Decompressor: exists only so CodecPool reflection succeeds. */
class ZstdNoopDecompressor extends Decompressor {
  override def setInput(b: Array[Byte], off: Int, len: Int): Unit = ()
  override def needsInput(): Boolean = true
  override def setDictionary(b: Array[Byte], off: Int, len: Int): Unit = ()
  override def needsDictionary(): Boolean = false
  override def getRemaining: Int = 0
  override def finished(): Boolean = true
  override def decompress(b: Array[Byte], off: Int, len: Int): Int = 0
  override def reset(): Unit = ()
  override def end(): Unit = ()
}
