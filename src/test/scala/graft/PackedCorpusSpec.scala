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

  test("spark.read.format(\"packedcorpus\"): DSv2 scan equals the reader, " +
      "both dtypes; pruning input_ids never opens the .bin") {
    import org.apache.spark.sql.functions._
    val dir = tmp("packedsv2") + "/shards"
    PackedCorpus.write(fixture(), dir, numTasks = 2)
    val sdf = spark.read.format("packedcorpus").load(dir)
    assert(sdf.schema.fieldNames.toSeq ==
      Seq("file", "seq_ix", "ptr", "n_tokens", "input_ids"))
    val viaSource = sdf.select("file", "seq_ix", "ptr", "input_ids")
      .orderBy("file", "seq_ix").collect().map(_.toSeq).toSeq
    val viaReader = PackedCorpus.read(spark, dir)
      .orderBy("file", "seq_ix").collect().map(_.toSeq).toSeq
    assert(viaSource == viaReader)
    // sidecar-only scan: token totals with input_ids pruned — the plan's
    // ReadSchema must not carry input_ids (the reader then never opens
    // the .bin; enforced physically below by deleting it)
    val slim = sdf.groupBy("file").agg(sum("n_tokens").as("t"))
    val scanLine = slim.queryExecution.executedPlan.toString
      .split("\n").find(_.contains("ReadSchema")).getOrElse("")
    assert(!scanLine.contains("input_ids"), s"pruning failed: $scanLine")
    val binless = tmp("packedsv2nb") + "/shards"
    PackedCorpus.write(fixture(), binless, numTasks = 1)
    Files.delete(Paths.get(binless, "part-00000.bin"))
    val got = spark.read.format("packedcorpus").load(binless)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(got == 9L) // metadata flows with the token bytes GONE
    // uint16 pair reads transparently through the source
    val u16 = tmp("packedsv2u") + "/shards"
    import spark.implicits._
    PackedCorpus.write(Seq((0L, 0L, Seq(1, 65535)))
      .toDF("shard", "seq_id", "input_ids"), u16, numTasks = 1,
      dtype = "uint16")
    assert(spark.read.format("packedcorpus").load(u16)
      .select("input_ids").collect()(0).getSeq[Int](0) == Seq(1, 65535))
  }

  test("property roundtrip: 60 random corpora (lengths 1-40, full int32 " +
      "range / uint16 boundary values, 1-3 tasks) read back exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260816L)
    for (trial <- 0 until 60) {
      val u16 = trial % 2 == 1
      val nDocs = 1 + rnd.nextInt(12)
      val docs = (0 until nDocs).map { i =>
        val n = 1 + rnd.nextInt(40)
        val ids = Seq.fill(n)(
          if (u16) (if (rnd.nextInt(8) == 0) 65535 else rnd.nextInt(65536))
          else rnd.nextInt()) // full int32 incl. negatives
        (i.toLong % 3, i.toLong, ids)
      }
      val df = docs.toDF("shard", "seq_id", "input_ids")
      val dir = tmp(s"packedprop$trial") + "/shards"
      PackedCorpus.write(df, dir, numTasks = 1 + rnd.nextInt(3),
        dtype = if (u16) "uint16" else "int32")
      // multiset compare (duplicate singleton arrays are possible)
      val back = PackedCorpus.read(spark, dir)
        .select("input_ids").collect().map(_.getSeq[Int](0).toList)
        .sortBy(_.mkString(",")).toList
      assert(back == docs.map(_._3.toList).sortBy(_.mkString(",")).toList,
        s"trial $trial (u16=$u16)")
    }
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

  test("PackedShards as a DAEMON sink: per-micro-batch greedy packing " +
      "(PackBudget), each batch lands its own batch={{.Rotation}} shard " +
      "dir; checkpointed restart loses and duplicates nothing") {
    import graft.streaming.Streaming
    val dir = java.nio.file.Files.createTempDirectory("graft-pshards").toFile
    val shards = new java.io.File(dir, "in"); shards.mkdirs()
    def shard(name: String, entries: (String, String)*): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      entries.foreach { case (n, txt) =>
        graft.sources.TarShards.writeEntry(bos, n, txt.getBytes("UTF-8"))
      }
      bos.write(new Array[Byte](1024))
      val out = new java.io.FileOutputStream(new java.io.File(shards, name))
      out.write(bos.toByteArray); out.close()
    }
    shard("s0.tar", "10.txt" -> "alpha beta gamma", "11.txt" -> "delta ep")
    val toml =
      s"""[fields]
         |names = ["key", "txt", "ids"]
         |[input]
         |name = "WebDataset"
         |  [input.config]
         |  Path = "${shards.getAbsolutePath}"
         |  MaxFilesPerTrigger = 1
         |[[filter]]
         |name = "SqlExpr"
         |  [filter.config]
         |  DstField = "ids"
         |  Expr = "array_join(transform(split(trim(txt), ' '), w -> cast(length(w) as string)), ',')"
         |[output]
         |name = "PackedShards"
         |fields = ["key", "ids"]
         |  [output.config]
         |  Path = "$dir/out/batch={{.Rotation}}"
         |  IdsField = "ids"
         |  PackBudget = 8
         |  PackShards = 1
         |  PackOrderField = "key"
         |  EosId = -4
         |  NumTasks = 1
         |""".stripMargin
    val d1 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d1.processAllAvailable(); d1.stop()
    def batches(): Seq[String] = Option(new java.io.File(s"$dir/out")
      .listFiles()).toSeq.flatten.map(_.getName).sorted
    assert(batches() == Seq("batch=0"))
    // doc 10 → [5,4,5,-4] (9 > 8 with doc 11's [5,2,-4]? 4+3=7 ≤ 8: one
    // sequence [5,4,5,-4,5,2,-4,pad])
    val b0 = PackedCorpus.read(spark, s"$dir/out/batch=0")
      .orderBy("seq_ix").collect()
    assert(b0.map(_.getSeq[Int](3)).toSeq ==
      Seq(Seq(5, 4, 5, -4, 5, 2, -4, -2)))
    // a new shard arrives; the RESTARTED daemon resumes from the
    // checkpoint — shard 0 is not reprocessed, batch=1 appears alone
    shard("s1.tar", "20.txt" -> "zz yy xx ww")
    val d2 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d2.processAllAvailable(); d2.stop()
    assert(batches() == Seq("batch=0", "batch=1"))
    val b1 = PackedCorpus.read(spark, s"$dir/out/batch=1")
      .orderBy("seq_ix").collect()
    assert(b1.map(_.getSeq[Int](3)).toSeq ==
      Seq(Seq(2, 2, 2, 2, -4, -2, -2, -2)))
    // batch 0's bytes are untouched by the restart
    val again = PackedCorpus.read(spark, s"$dir/out/batch=0").collect()
    assert(again.length == 1)
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
