package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.PackedCorpus
import graft.topology.Topology

/** Trainer-shard export: the Megatron-style .bin/.idx writer/reader —
  * roundtrip equality, the idx prefix-sum pointer arithmetic checked
  * against the raw bytes, byte-determinism across re-writes, the staging
  * discipline (no orphans, _SUCCESS), loud corrupt-sidecar and
  * empty-sequence errors, and the PackedShards TOML output end to end.
  */
class PackedCorpusSpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def fixture() = {
    import spark.implicits._
    Seq(
      (0L, 7L, Seq(1, 2, 3)),
      (0L, 8L, Seq(4)),
      (1L, 0L, Seq(5, 6)),
      (1L, 1L, Seq(-4, 1000000, -2147483648)))
      .toDF("shard", "seq_id", "input_ids")
  }

  test("write → read roundtrip: arrays equal, seq_ix in order, pointers " +
      "are the exact 4-byte prefix sums") {
    val dir = tmp("packed") + "/shards"
    PackedCorpus.write(fixture(), dir, numTasks = 1)
    val back = PackedCorpus.read(spark, dir)
      .orderBy("file", "seq_ix").collect()
    assert(back.length == 4)
    // one task → one file; sequences sort by (shard, seq_id)
    assert(back.map(_.getString(0)).distinct.toSeq == Seq("part-00000.bin"))
    assert(back.map(_.getSeq[Int](3)).toSeq == Seq(
      Seq(1, 2, 3), Seq(4), Seq(5, 6), Seq(-4, 1000000, -2147483648)))
    // ptr = 4 × running token count (int32 stream)
    assert(back.map(_.getLong(2)).toSeq == Seq(0L, 12L, 16L, 24L))
    assert(back.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
  }

  test("the .idx sidecar is the published MMIDIDX layout: magic, version " +
      "1, dtype 4, counts, sizes, pointers, doc index") {
    val dir = tmp("packedidx") + "/shards"
    PackedCorpus.write(fixture(), dir, numTasks = 1)
    val idx = Files.readAllBytes(Paths.get(dir, "part-00000.idx"))
    assert(new String(idx.take(7), "US-ASCII") == "MMIDIDX")
    assert(idx(7) == 0 && idx(8) == 0)
    val bb = java.nio.ByteBuffer.wrap(idx)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.position(9)
    assert(bb.getLong == 1L) // version
    assert(bb.get == 4) // dtype int32
    assert(bb.getLong == 4L) // sequences
    assert(bb.getLong == 5L) // documents (one per sequence + 1)
    assert(Seq.fill(4)(bb.getInt) == Seq(3, 1, 2, 3)) // sizes
    assert(Seq.fill(4)(bb.getLong) == Seq(0L, 12L, 16L, 24L)) // pointers
    assert(Seq.fill(5)(bb.getLong) == Seq(0L, 1L, 2L, 3L, 4L)) // doc idx
    assert(!bb.hasRemaining)
    // and the bin is the flat little-endian token stream
    val bin = java.nio.ByteBuffer.wrap(
        Files.readAllBytes(Paths.get(dir, "part-00000.bin")))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(Seq.fill(9)(bin.getInt) ==
      Seq(1, 2, 3, 4, 5, 6, -4, 1000000, -2147483648))
    assert(!bin.hasRemaining)
  }

  test("byte-deterministic under a fixed partitioning; staging discipline " +
      "leaves _SUCCESS and no orphans") {
    val dir = tmp("packeddet") + "/shards"
    PackedCorpus.write(fixture(), dir, numTasks = 2)
    val first = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bin"))
      .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    assert(first.nonEmpty)
    PackedCorpus.write(fixture(), dir, numTasks = 2)
    val second = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".bin"))
      .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    assert(first == second)
    val names = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(names.contains("_SUCCESS"))
    assert(!names.exists(_.startsWith(".inprogress-")), names.toString)
    // multi-file read reassembles everything
    assert(PackedCorpus.read(spark, dir).count() == 4)
  }

  test("uint16 dtype: half-width stream roundtrips, idx pointers step by " +
      "2 bytes, out-of-range ids fail loudly") {
    import spark.implicits._
    val df = Seq((0L, 0L, Seq(0, 1, 65535)), (0L, 1L, Seq(7, 8)))
      .toDF("shard", "seq_id", "input_ids")
    val dir = tmp("packedu16") + "/shards"
    PackedCorpus.write(df, dir, numTasks = 1, dtype = "uint16")
    val back = PackedCorpus.read(spark, dir).orderBy("seq_ix").collect()
    assert(back.map(_.getSeq[Int](3)).toSeq == Seq(Seq(0, 1, 65535), Seq(7, 8)))
    assert(back.map(_.getLong(2)).toSeq == Seq(0L, 6L)) // 3 tokens × 2 B
    val bin = Files.readAllBytes(Paths.get(dir, "part-00000.bin"))
    assert(bin.length == 10) // 5 tokens × 2 B
    // dtype code 8 at idx offset 17 (magic 9 + version 8)
    assert(Files.readAllBytes(Paths.get(dir, "part-00000.idx"))(17) == 8)
    val neg = Seq((0L, 0L, Seq(-1))).toDF("shard", "seq_id", "input_ids")
    val e = intercept[Exception](
      PackedCorpus.write(neg, tmp("packedneg") + "/s", dtype = "uint16"))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("uint16")), chain(e).mkString(" | "))
  }

  test("empty sequences fail loudly; a corrupt idx fails loudly") {
    import spark.implicits._
    val bad = Seq((0L, 0L, Seq.empty[Int])).toDF("shard", "seq_id", "input_ids")
    val dir = tmp("packedbad") + "/shards"
    val e = intercept[Exception](PackedCorpus.write(bad, dir))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("zero-length")), chain(e).mkString(" | "))
    val dir2 = tmp("packedcorrupt") + "/shards"
    Files.createDirectories(Paths.get(dir2))
    Files.write(Paths.get(dir2, "part-00000.idx"),
      "NOTANIDX0".getBytes("US-ASCII"))
    Files.write(Paths.get(dir2, "part-00000.bin"), Array[Byte]())
    val e2 = intercept[Exception](PackedCorpus.read(spark, dir2).collect())
    assert(chain(e2).exists(_.contains("magic")), chain(e2).mkString(" | "))
  }

  test("PackedShards TOML output: PackRows rows land as readable shards") {
    import spark.implicits._
    val dir = tmp("packedtoml")
    Seq((0L, "alpha beta gamma delta"), (1L, "epsilon zeta"),
      (2L, "eta theta iota"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/docs")
    val toml =
      s"""[fields]
         |names = ["doc_id", "text"]
         |[input]
         |name = "Parquet"
         |  [input.config]
         |  Path = "$dir/docs"
         |[[filter]]
         |name = "SqlExpr"
         |  [filter.config]
         |  DstField = "ids"
         |  Expr = "array_join(transform(split(trim(text), ' '), w -> cast(length(w) as string)), ',')"
         |[[filter]]
         |name = "PackRows"
         |  [filter.config]
         |  IdsField = "ids"
         |  OrderField = "doc_id"
         |  Budget = 8
         |  Shards = 1
         |  EosId = -4
         |[output]
         |name = "PackedShards"
         |fields = ["shard", "seq_id", "input_ids", "segment_ids", "loss_mask", "n_real"]
         |  [output.config]
         |  Path = "$dir/shards"
         |  NumTasks = 1
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    assert(result.paths == Seq(s"$dir/shards"))
    val back = PackedCorpus.read(spark, s"$dir/shards")
      .orderBy("seq_ix").collect()
    assert(back.nonEmpty)
    // every sequence is a full budget row (PackRows pads), EOS present
    assert(back.forall(_.getSeq[Int](3).length == 8))
    assert(back.exists(_.getSeq[Int](3).contains(-4)))
  }
}
