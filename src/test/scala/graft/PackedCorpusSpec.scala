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
      Seq("file", "seq_ix", "ptr", "n_tokens", "doc_start", "input_ids",
        "loss_mask", "segment_ids"))
    // a mask-less corpus reads null channels and identity doc starts
    assert(sdf.select("loss_mask", "segment_ids").collect()
      .forall(r => r.isNullAt(0) && r.isNullAt(1)))
    assert(sdf.select("doc_start").collect().forall(_.getBoolean(0)))
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
         |  # the explicit per-batch opt-out: daemons default to
         |  # cross-batch tail carry (PackCarrySpec pins that posture);
         |  # THIS spec pins the legacy independent-batches shape
         |  CarryDir = ""
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

  test("mask + segment channels: parallel .mask/.seg MMIDIDX pairs " +
      "roundtrip through the DSv2, each prunable independently of the " +
      "tokens (proven physically by deleting the other channels' bins)") {
    import spark.implicits._
    val df = Seq(
      (0L, 0L, Seq(1, 2, 3), Seq(true, false, true), Seq(0, 0, 1), true),
      (0L, 1L, Seq(4, 5), Seq(false, true), Seq(0, 0), false),
      (1L, 0L, Seq(6), Seq(true), Seq(0), true))
      .toDF("shard", "seq_id", "input_ids", "loss_mask", "segment_ids",
        "doc_start")
    val dir = tmp("packedch") + "/shards"
    PackedCorpus.write(df, dir, numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"),
      docStartCol = Some("doc_start"))
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet // drop local-FS .crc shadows
    assert(names == Set("part-00000.bin", "part-00000.idx",
      "part-00000.mask.bin", "part-00000.mask.idx",
      "part-00000.seg.bin", "part-00000.seg.idx", "_SUCCESS"))
    // the mask .bin is the raw uint8 stream; its sidecar dtype code is 1
    assert(Files.readAllBytes(Paths.get(dir, "part-00000.mask.bin")).toSeq ==
      Seq[Byte](1, 0, 1, 0, 1, 1))
    assert(Files.readAllBytes(Paths.get(dir, "part-00000.mask.idx"))(17) == 1)
    val back = spark.read.format("packedcorpus").load(dir)
      .orderBy("seq_ix")
      .select("input_ids", "loss_mask", "segment_ids", "doc_start").collect()
    assert(back.map(_.getSeq[Int](0)).toSeq ==
      Seq(Seq(1, 2, 3), Seq(4, 5), Seq(6)))
    assert(back.map(_.getSeq[Boolean](1)).toSeq ==
      Seq(Seq(true, false, true), Seq(false, true), Seq(true)))
    assert(back.map(_.getSeq[Int](2)).toSeq == Seq(Seq(0, 0, 1), Seq(0, 0), Seq(0)))
    assert(back.map(_.getBoolean(3)).toSeq == Seq(true, false, true))
    // channel independence, physically: token + seg bins GONE, the mask
    // still reads; then mask + seg gone, tokens still read
    val d2 = tmp("packedch2") + "/shards"
    PackedCorpus.write(df, d2, numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"))
    Files.delete(Paths.get(d2, "part-00000.bin"))
    Files.delete(Paths.get(d2, "part-00000.seg.bin"))
    assert(spark.read.format("packedcorpus").load(d2)
      .select("loss_mask").collect().map(_.getSeq[Boolean](0)).toSeq
      .map(_.count(identity)).sum == 4)
    val d3 = tmp("packedch3") + "/shards"
    PackedCorpus.write(df, d3, numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"))
    Files.delete(Paths.get(d3, "part-00000.mask.bin"))
    Files.delete(Paths.get(d3, "part-00000.seg.bin"))
    assert(spark.read.format("packedcorpus").load(d3)
      .agg(sum(size(col("input_ids")))).collect()(0).getLong(0) == 6L)
    // a misaligned mask fails loudly at write
    val bad = Seq((0L, 0L, Seq(1, 2), Seq(true)))
      .toDF("shard", "seq_id", "input_ids", "loss_mask")
    val e = intercept[Exception](PackedCorpus.write(bad,
      tmp("packedchbad") + "/s", maskCol = Some("loss_mask")))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("mask/ids length mismatch")))
  }

  test("document index: packTokens doc_start flags write the REAL " +
      "Megatron doc boundaries (identity only when every sequence starts " +
      "a doc); a doc_start=false first sequence fails loudly") {
    import spark.implicits._
    // one shard, docs of 3+5+2 tokens, budget 4: sequences are
    // [d0 d0 d0 d1], [d1 d1 d1 d1], [d2 d2 pad pad] — doc starts at
    // sequences 0 and 2 only (sequence 1 continues d1)
    val docs = Seq((0L, Seq(1, 1, 1)), (1L, Seq(2, 2, 2, 2, 2)),
      (2L, Seq(3, 3))).toDF("doc_id", "toks")
    val packed = graft.llm.Pack.packTokens(docs, col("doc_id"), col("toks"),
      transform(col("toks"), _ => lit(true)), 4, lit(0L), padId = -1)
    assert(packed.orderBy("seq_id").select("doc_start").collect()
      .map(_.getBoolean(0)).toSeq == Seq(true, false, true))
    val dir = tmp("packeddoc") + "/shards"
    PackedCorpus.write(packed, dir, numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"),
      docStartCol = Some("doc_start"))
    val idx = java.nio.ByteBuffer.wrap(
        Files.readAllBytes(Paths.get(dir, "part-00000.idx")))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    idx.position(9 + 8 + 1) // magic, version, dtype
    assert(idx.getLong == 3L) // sequences
    assert(idx.getLong == 3L) // documents: starts {0, 2} + terminator
    idx.position(idx.position() + 3 * 4 + 3 * 8) // skip sizes + pointers
    assert(Seq.fill(3)(idx.getLong) == Seq(0L, 2L, 3L))
    assert(!idx.hasRemaining)
    // the DSv2 surfaces the same bits back
    assert(spark.read.format("packedcorpus").load(dir)
      .orderBy("seq_ix").select("doc_start").collect()
      .map(_.getBoolean(0)).toSeq == Seq(true, false, true))
    // a shard file whose first sequence continues a document is a split
    // packing stream — loud, never a silently wrong doc index
    val torn = Seq((0L, 0L, Seq(9), false))
      .toDF("shard", "seq_id", "input_ids", "doc_start")
    val e = intercept[Exception](PackedCorpus.write(torn,
      tmp("packedtorn") + "/s", docStartCol = Some("doc_start")))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("FIRST sequence must start a document")))
  }

  test("filter pushdown: file equality prunes untargeted shard pairs at " +
      "planning (their files never open — proven by deleting them); an " +
      "n_tokens filter evaluates on the sidecar before any data read") {
    import spark.implicits._
    val dir = tmp("packedpush") + "/shards"
    // numTasks=3 with shard values 0/1/2 → three part files
    val df = (0 until 3).map(i => (i.toLong, 0L, Seq.fill(i + 1)(i)))
      .toDF("shard", "seq_id", "input_ids")
    PackedCorpus.write(df, dir, numTasks = 3)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filter(_.endsWith(".bin")).sorted
    // hash partitioning may co-locate shard keys; ≥2 files is what the
    // pruning proof needs
    assert(files.length >= 2, files.toSeq.toString)
    // n_tokens range on the intact corpus first: exactly the 1-token row
    assert(spark.read.format("packedcorpus").load(dir)
      .filter(col("n_tokens") >= 1 && col("n_tokens") <= 1)
      .select("input_ids").collect().map(_.getSeq[Int](0)).toSeq ==
      Seq(Seq(0)))
    val keep = spark.read.format("packedcorpus").load(dir)
      .filter(col("file") === files.head).select("file", "input_ids")
      .collect()
    assert(keep.nonEmpty && keep.forall(_.getString(0) == files.head))
    // physical proof: delete every OTHER pair — the pushed filter plans
    // only the targeted shard, so the scan still succeeds
    files.tail.foreach { f =>
      Files.delete(Paths.get(dir, f))
      Files.delete(Paths.get(dir, f.stripSuffix(".bin") + ".idx"))
    }
    val again = spark.read.format("packedcorpus").load(dir)
      .filter(col("file") === files.head).select("input_ids").collect()
    assert(again.map(_.getSeq[Int](0)).toSeq == keep.map(_.getSeq[Int](1)).toSeq)
    // n_tokens range: sidecar-only evaluation — with the .bin GONE, a
    // filter matching nothing completes even though input_ids is required
    val d2 = tmp("packedpush2") + "/shards"
    PackedCorpus.write(Seq((0L, 0L, Seq(1, 2, 3)))
      .toDF("shard", "seq_id", "input_ids"), d2, numTasks = 1)
    Files.delete(Paths.get(d2, "part-00000.bin"))
    assert(spark.read.format("packedcorpus").load(d2)
      .filter(col("n_tokens") > 100).select("input_ids").count() == 0L)
  }

  test("re-export into a non-empty dir sweeps every stale artifact: a " +
      "narrower task layout leaves no orphan shard pair behind") {
    import spark.implicits._
    val dir = tmp("packedresweep") + "/shards"
    val wide = (0 until 8).map(i => (i.toLong, 0L, Seq(i)))
      .toDF("shard", "seq_id", "input_ids")
    PackedCorpus.write(wide, dir, numTasks = 8)
    assert(new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".bin")) >= 2)
    // re-export DIFFERENT data at width 1: every stale pair must go
    PackedCorpus.write(Seq((0L, 0L, Seq(42))).toDF("shard", "seq_id", "input_ids"),
      dir, numTasks = 1)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).toSet // drop local-FS .crc shadows
    assert(names == Set("part-00000.bin", "part-00000.idx", "_SUCCESS"))
    assert(PackedCorpus.read(spark, dir).select("input_ids")
      .collect().map(_.getSeq[Int](0)).toSeq == Seq(Seq(42)))
  }

  test("reshuffle: a seeded at-rest epoch shuffle permutes DOCUMENT GROUPS " +
      "without splitting one, carries the channels, is byte-deterministic " +
      "under a seed, and moves under a different seed") {
    import spark.implicits._
    // 12 docs of varied sizes through the concat-chunk packer: real
    // cross-sequence documents, so group preservation is non-trivial
    val docs = (0 until 12).map(i => (i.toLong, Seq.fill(2 + (i * 7) % 9)(i)))
      .toDF("doc_id", "toks")
    val packed = graft.llm.Pack.packTokens(docs, col("doc_id"), col("toks"),
      transform(col("toks"), x => x % 2 === 0), 8, pmod(col("doc_id"), lit(2)),
      padId = -1)
    val base = tmp("packedshuf")
    PackedCorpus.write(packed, s"$base/in", numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"),
      docStartCol = Some("doc_start"))
    PackedCorpus.reshuffle(spark, s"$base/in", s"$base/e1", 2, "epoch-1")
    PackedCorpus.reshuffle(spark, s"$base/in", s"$base/e1b", 2, "epoch-1")
    PackedCorpus.reshuffle(spark, s"$base/in", s"$base/e2", 2, "epoch-2")
    def groups(dir: String): Seq[Seq[(Seq[Int], Seq[Boolean], Seq[Int])]] = {
      val rows = spark.read.format("packedcorpus").load(dir)
        .orderBy("file", "seq_ix")
        .select("file", "doc_start", "input_ids", "loss_mask", "segment_ids")
        .collect()
      val out = scala.collection.mutable.ArrayBuffer[scala.collection.mutable
        .ArrayBuffer[(Seq[Int], Seq[Boolean], Seq[Int])]]()
      var lastFile: String = null
      for (r <- rows) {
        if (r.getString(0) != lastFile || r.getBoolean(1)) {
          out += scala.collection.mutable.ArrayBuffer()
          lastFile = r.getString(0)
        }
        out.last += ((r.getSeq[Int](2), r.getSeq[Boolean](3), r.getSeq[Int](4)))
      }
      out.map(_.toSeq).toSeq
    }
    val orig = groups(s"$base/in")
    val e1 = groups(s"$base/e1")
    // same multiset of intact groups (channels included), different order
    assert(e1.sortBy(_.hashCode) == orig.sortBy(_.hashCode))
    assert(e1.flatten.map(_._1).toSet == orig.flatten.map(_._1).toSet)
    // deterministic under the seed: identical bytes file by file
    val b1 = new java.io.File(s"$base/e1").listFiles()
      .filter(_.getName.endsWith(".bin"))
      .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    val b1b = new java.io.File(s"$base/e1b").listFiles()
      .filter(_.getName.endsWith(".bin"))
      .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    assert(b1 == b1b)
    // a different seed produces a different permutation (12 groups — the
    // chance of an identical order is negligible)
    val e2 = groups(s"$base/e2")
    assert(e2.sortBy(_.hashCode) == orig.sortBy(_.hashCode))
    assert(e1.flatten != e2.flatten)
    // every group still starts on a doc_start mark by construction: the
    // reader surfaces exactly one doc_start=true per group
    assert(spark.read.format("packedcorpus").load(s"$base/e1")
      .agg(sum(col("doc_start").cast("long"))).collect()(0).getLong(0) ==
      orig.length.toLong)
    // shuffling a corpus ONTO ITSELF would pre-clean (delete) the input
    // before the lazy read plans — refused loudly, corpus untouched
    val eSelf = intercept[Exception](
      PackedCorpus.reshuffle(spark, s"$base/in", s"$base/in", 2, "x"))
    assert(eSelf.getMessage.contains("outDir must differ"))
    assert(spark.read.format("packedcorpus").load(s"$base/in").count() > 0)
    // a uint16 corpus reshuffles at its own width (dtype sniffed, code 8)
    val u16 = tmp("packedshufu16")
    PackedCorpus.write(Seq((0L, 0L, Seq(1, 65535)), (0L, 1L, Seq(7)))
      .toDF("shard", "seq_id", "input_ids"), s"$u16/in", numTasks = 1,
      dtype = "uint16")
    PackedCorpus.reshuffle(spark, s"$u16/in", s"$u16/e1", 1, "s")
    val outIdx = new java.io.File(s"$u16/e1").listFiles()
      .filter(f => f.getName.endsWith(".idx") && !f.getName.startsWith("."))
      .head
    assert(Files.readAllBytes(outIdx.toPath)(17) == 8, "dtype code must stay uint16")
    assert(spark.read.format("packedcorpus").load(s"$u16/e1")
      .select("input_ids").collect().map(_.getSeq[Int](0).toList)
      .sortBy(_.toString).toSeq ==
      Seq(List(1, 65535), List(7)).sortBy(_.toString))
  }

  test("rewriteExcluding: drops widen to WHOLE document groups (never a " +
      "truncated document), survivors keep order and channels, and " +
      "in-place rewrite is refused") {
    import spark.implicits._
    // doc sizes 3/5/2 at budget 4 (the doc-index fixture): groups are
    // {seq0, seq1} (d0+d1) and {seq2} (d2)
    val docs = Seq((0L, Seq(1, 1, 1)), (1L, Seq(2, 2, 2, 2, 2)),
      (2L, Seq(3, 3))).toDF("doc_id", "toks")
    val packed = graft.llm.Pack.packTokens(docs, col("doc_id"), col("toks"),
      transform(col("toks"), _ => lit(true)), 4, lit(0L), padId = -1)
    val base = tmp("packedrtbf")
    PackedCorpus.write(packed, s"$base/in", numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"),
      docStartCol = Some("doc_start"))
    // dropping seq 1 (MID-document: d1 spans seqs 0-1) must take seq 0
    // with it — the whole first group — leaving only d2's group
    val drop = Seq(("part-00000.bin", 1L)).toDF("file", "seq_ix")
    PackedCorpus.rewriteExcluding(spark, s"$base/in", s"$base/out", drop,
      numShards = 1)
    val out = spark.read.format("packedcorpus").load(s"$base/out")
      .orderBy("seq_ix")
      .select("seq_ix", "input_ids", "loss_mask", "doc_start").collect()
    assert(out.length == 1)
    assert(out(0).getLong(0) == 0L)
    assert(out(0).getSeq[Int](1) == Seq(3, 3, -1, -1))
    assert(out(0).getSeq[Boolean](2) == Seq(true, true, false, false))
    assert(out(0).getBoolean(3))
    // in-place surgery refused (the writer sweeps the target first),
    // including an outDir that merely ALIASES inDir through ".." — the
    // qualified-Path compare alone would miss it
    val e = intercept[Exception](PackedCorpus.rewriteExcluding(
      spark, s"$base/in", s"$base/in", drop))
    assert(e.getMessage.contains("outDir must differ"))
    val e2 = intercept[Exception](PackedCorpus.rewriteExcluding(
      spark, s"$base/in", s"$base/other/../in", drop))
    assert(e2.getMessage.contains("outDir must differ"))
    // a drop row matching NO corpus sequence is a stale/mistyped
    // takedown list — loud, and nothing is written
    val stale = Seq(("part-99999.bin", 0L)).toDF("file", "seq_ix")
    val e3 = intercept[Exception](PackedCorpus.rewriteExcluding(
      spark, s"$base/in", s"$base/out2", stale))
    assert(e3.getMessage.contains("match no (file, seq_ix)"))
    assert(!new java.io.File(s"$base/out2", "_SUCCESS").exists())
  }

  test("property: 12 random corpora (docs split by the packer, both " +
      "dtypes, channels on/off) survive reshuffle + rewriteExcluding — " +
      "group multisets preserved, dropped groups gone, channels intact") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    for (trial <- 0 until 12) {
      val u16 = trial % 3 == 0
      val channels = trial % 2 == 0
      val budget = 4 + rnd.nextInt(6)
      val nDocs = 4 + rnd.nextInt(10)
      val docs = (0 until nDocs).map { i =>
        val n = 1 + rnd.nextInt(2 * budget)
        (i.toLong, Seq.fill(n)(if (u16) rnd.nextInt(65536) else rnd.nextInt()))
      }.toDF("doc_id", "toks")
      val packed = graft.llm.Pack.packTokens(docs, col("doc_id"), col("toks"),
        transform(col("toks"), x => pmod(x, lit(3)) === 0), budget,
        pmod(col("doc_id"), lit(2)), padId = 0)
      val base = tmp(s"packedprop2-$trial")
      PackedCorpus.write(packed, s"$base/in", numTasks = 1,
        dtype = if (u16) "uint16" else "int32",
        maskCol = if (channels) Some("loss_mask") else None,
        segCol = if (channels) Some("segment_ids") else None,
        docStartCol = Some("doc_start"))
      def groups(dir: String): Seq[Seq[Seq[Int]]] = {
        val rows = spark.read.format("packedcorpus").load(dir)
          .orderBy("file", "seq_ix")
          .select("file", "doc_start", "input_ids").collect()
        val out = scala.collection.mutable.ArrayBuffer[
          scala.collection.mutable.ArrayBuffer[Seq[Int]]]()
        var lastFile: String = null
        for (r <- rows) {
          if (r.getString(0) != lastFile || r.getBoolean(1)) {
            out += scala.collection.mutable.ArrayBuffer()
            lastFile = r.getString(0)
          }
          out.last += r.getSeq[Int](2)
        }
        out.map(_.toSeq).toSeq
      }
      val orig = groups(s"$base/in")
      // reshuffle: same group multiset, shuffled
      PackedCorpus.reshuffle(spark, s"$base/in", s"$base/e", 2, s"t$trial")
      assert(groups(s"$base/e").sortBy(_.hashCode) ==
        orig.sortBy(_.hashCode), s"trial $trial reshuffle")
      // rewriteExcluding: drop one random existing sequence — its whole
      // group disappears, every other group survives verbatim
      val all = spark.read.format("packedcorpus").load(s"$base/in")
        .select("file", "seq_ix").collect()
      val victim = all(rnd.nextInt(all.length))
      PackedCorpus.rewriteExcluding(spark, s"$base/in", s"$base/c",
        Seq((victim.getString(0), victim.getLong(1))).toDF("file", "seq_ix"),
        numShards = 1)
      val after = groups(s"$base/c")
      assert(after.length == orig.length - 1, s"trial $trial drop count")
      val origSet = orig.map(_.toList).groupBy(identity).view.mapValues(_.size).toMap
      val afterSet = after.map(_.toList).groupBy(identity).view.mapValues(_.size).toMap
      assert(afterSet.forall { case (g, c) => origSet.getOrElse(g, 0) >= c },
        s"trial $trial survivors subset")
    }
  }

  test("daemon pad-waste bound: per-batch packing wastes at most ~shards x " +
      "budget tokens per micro-batch, so batches sized >> shards*budget " +
      "keep the pad fraction small and tiny batches pay the whole budget") {
    import spark.implicits._
    val budget = 64
    val shards = 2
    def padBp(nDocs: Int): Long = {
      // the daemon path packs each micro-batch independently: simulate
      // one batch of docs (sizes 3..7 words) through the same
      // packTokensGreedy the sink runs, then read the report
      val docs = (0 until nDocs).map(i => (i.toLong, Seq.fill(3 + i % 5)(1)))
        .toDF("doc_id", "toks")
      val shard = pmod(col("doc_id"), lit(shards))
      val packed = graft.llm.Pack.packTokensGreedy(docs, col("doc_id"),
        col("toks"), transform(col("toks"), _ => lit(true)), budget, shard,
        padId = -2)
      val st = graft.llm.Pack.packingStats(packed, budget)
        .agg(sum("n_pad").as("p"), sum(col("n_seqs") * budget).as("t"))
        .collect()(0)
      st.getLong(0) * 10000L / st.getLong(1)
    }
    // analytic bound for docs of ≤ 7 tokens: every non-final sequence
    // has fill > budget − 7 (else the next doc would fit), and each
    // shard's final sequence wastes < budget — so waste_bp ≤
    // 10000·(6/budget + shards·budget/total). A large batch sits well
    // under 15%; a batch of ~one doc per shard pays most of the budget.
    val large = padBp(600) // ≫ shards·budget tokens
    assert(large < 1500L, s"large-batch pad $large bp")
    val tiny = padBp(2) // one ~5-token doc per shard
    assert(tiny > 8000L, s"tiny-batch pad $tiny bp")
    assert(large < tiny / 5, s"sizing rule inverted: $large vs $tiny")
  }

  test("PackedCorpus TOML input: exported shards read back into the " +
      "record model (arrays comma-joined, mask as 1/0); a sidecar-only " +
      "field list never opens the data files (proven by deleting them)") {
    import spark.implicits._
    val dir = tmp("packedtomlin")
    val df = Seq(
      (0L, 0L, Seq(1, 2, 3), Seq(true, false, true)),
      (0L, 1L, Seq(9, 9), Seq(false, false)))
      .toDF("shard", "seq_id", "input_ids", "loss_mask")
    PackedCorpus.write(df, s"$dir/shards", numTasks = 1,
      maskCol = Some("loss_mask"))
    val toml =
      s"""[fields]
         |names = ["seq_ix", "n_tokens", "input_ids", "loss_mask"]
         |[input]
         |name = "PackedCorpus"
         |  [input.config]
         |  Path = "$dir/shards"
         |[output]
         |name = "Nop"
         |""".stripMargin
    val rows = Topology.compileToml(spark, toml).projected
      .orderBy(col("seq_ix").cast("long")).collect()
    assert(rows.map(_.toSeq).toSeq == Seq(
      Seq("0", "3", "1,2,3", "1,0,1"),
      Seq("1", "2", "9,9", "0,0")))
    // sidecar-only TOML accounting: with every data file GONE, a field
    // list of (seq_ix, n_tokens) still reads — the DSv2 pruning flows
    // through the record-model projection
    Files.delete(Paths.get(s"$dir/shards", "part-00000.bin"))
    Files.delete(Paths.get(s"$dir/shards", "part-00000.mask.bin"))
    val slim =
      s"""[fields]
         |names = ["seq_ix", "n_tokens"]
         |[input]
         |name = "PackedCorpus"
         |  [input.config]
         |  Path = "$dir/shards"
         |[output]
         |name = "Nop"
         |""".stripMargin
    assert(Topology.compileToml(spark, slim).projected
      .agg(sum(col("n_tokens").cast("long"))).collect()(0).getLong(0) == 5L)
    // an unknown field fails loudly at compile
    val bad = toml.replace("\"loss_mask\"", "\"no_such_field\"")
    val e = intercept[Exception](
      Topology.compileToml(spark, bad).projected.collect())
    assert(e.getMessage != null)
  }

  test("config-only shard surgery end to end: PackedCorpus input → " +
      "SqlWhere → PackedShards output rewrites a corpus with channels " +
      "and doc starts intact, zero Scala") {
    import spark.implicits._
    val dir = tmp("packedcfg")
    val df = Seq(
      (0L, 0L, Seq(1, 2, 3), Seq(true, false, true), Seq(0, 0, 0), true),
      (0L, 1L, Seq(9), Seq(false), Seq(0), true),
      (0L, 2L, Seq(4, 5, 6, 7), Seq(true, true, false, false), Seq(0, 0, 1, 1),
        true))
      .toDF("shard", "seq_id", "input_ids", "loss_mask", "segment_ids",
        "doc_start")
    PackedCorpus.write(df, s"$dir/in", numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"),
      docStartCol = Some("doc_start"))
    val toml =
      s"""[fields]
         |names = ["seq_ix", "n_tokens", "input_ids", "loss_mask", "segment_ids", "doc_start"]
         |[input]
         |name = "PackedCorpus"
         |  [input.config]
         |  Path = "$dir/in"
         |[[filter]]
         |name = "SqlWhere"
         |  [filter.config]
         |  Where = "cast(n_tokens as int) >= 3"
         |[output]
         |name = "PackedShards"
         |fields = ["seq_ix", "input_ids", "loss_mask", "segment_ids", "doc_start"]
         |  [output.config]
         |  Path = "$dir/out"
         |  OrderFields = ["seq_ix"]
         |  NumTasks = 1
         |""".stripMargin
    val (result, _) = Topology.compileToml(spark, toml).run()
    assert(result.paths == Seq(s"$dir/out"))
    val back = spark.read.format("packedcorpus").load(s"$dir/out")
      .orderBy("seq_ix")
      .select("input_ids", "loss_mask", "segment_ids", "doc_start").collect()
    assert(back.map(_.getSeq[Int](0)).toSeq ==
      Seq(Seq(1, 2, 3), Seq(4, 5, 6, 7)))
    assert(back.map(_.getSeq[Boolean](1)).toSeq ==
      Seq(Seq(true, false, true), Seq(true, true, false, false)))
    assert(back.map(_.getSeq[Int](2)).toSeq ==
      Seq(Seq(0, 0, 0), Seq(0, 0, 1, 1)))
    assert(back.forall(_.getBoolean(3)))
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

  test("[reshuffle] TOML job section ≡ the reshuffle API, byte for byte — " +
      "and a reshuffle-only TOML (no [input]/[output]) is a complete job") {
    import spark.implicits._
    val docs = (0 until 10).map(i => (i.toLong, Seq.fill(2 + (i * 5) % 7)(i)))
      .toDF("doc_id", "toks")
    val packed = graft.llm.Pack.packTokens(docs, col("doc_id"), col("toks"),
      transform(col("toks"), _ => lit(true)), 8, pmod(col("doc_id"), lit(2)),
      padId = -1)
    val base = tmp("packedshuftoml")
    PackedCorpus.write(packed, s"$base/in", numTasks = 1,
      maskCol = Some("loss_mask"), segCol = Some("segment_ids"),
      docStartCol = Some("doc_start"))
    PackedCorpus.reshuffle(spark, s"$base/in", s"$base/api", 2, "epoch-7")
    val toml =
      s"""[reshuffle]
         |InDir = "$base/in"
         |OutDir = "$base/toml"
         |Shards = 2
         |Seed = "epoch-7"
         |""".stripMargin
    Topology.compileToml(spark, toml)
    def bytes(dir: String): Map[String, Seq[Byte]] =
      new java.io.File(dir).listFiles()
        .filter(f => !f.getName.startsWith(".") && f.getName != "_SUCCESS")
        .map(f => f.getName -> Files.readAllBytes(f.toPath).toSeq).toMap
    assert(bytes(s"$base/toml") == bytes(s"$base/api"))
    // a bad key is loud at compile, before anything touches the target
    val e = intercept[Exception](Topology.compileToml(spark,
      s"""[reshuffle]
         |InDir = "$base/in"
         |OutDir = "$base/x"
         |Shards = 2
         |Sead = "typo"
         |""".stripMargin))
    assert(e.getMessage.toLowerCase.contains("sead"))
    assert(!new java.io.File(s"$base/x", "_SUCCESS").exists())
  }

  test("rewriteExcluding evaluates the caller's drop frame EXACTLY ONCE " +
      "(an audit-derived takedown list never re-runs its audit)") {
    import spark.implicits._
    val docs = Seq((0L, Seq(1, 1)), (1L, Seq(2, 2)), (2L, Seq(3, 3)))
      .toDF("doc_id", "toks")
    val packed = graft.llm.Pack.packTokens(docs, col("doc_id"), col("toks"),
      transform(col("toks"), _ => lit(true)), 2, lit(0L), padId = -1)
    val base = tmp("packedonceeval")
    PackedCorpus.write(packed, s"$base/in", numTasks = 1,
      docStartCol = Some("doc_start"))
    val acc = spark.sparkContext.longAccumulator("dropEvaluations")
    val drop = Seq(("part-00000.bin", 1L)).toDF("file", "seq_ix")
      .coalesce(1).as[(String, Long)]
      .mapPartitions { it => acc.add(1); it }.toDF("file", "seq_ix")
    PackedCorpus.rewriteExcluding(spark, s"$base/in", s"$base/out", drop,
      numShards = 1)
    assert(acc.value == 1L,
      s"drop frame evaluated ${acc.value} times (must be exactly 1)")
    assert(spark.read.format("packedcorpus").load(s"$base/out").count() == 2L)
  }

  test("corpus rewrites accept a GLOB resolving to one flat directory and " +
      "reject multi-directory inputs loudly (basename identity)") {
    import spark.implicits._
    val base = tmp("packedglob")
    PackedCorpus.write(Seq((0L, 0L, Seq(1, 2))).toDF("shard", "seq_id", "input_ids"),
      s"$base/in", numTasks = 1)
    // a glob that resolves to the single flat dir works (the DSv2 Path
    // contract is 'directory or glob' — the rewrites must not
    // FileNotFound on it)
    PackedCorpus.reshuffle(spark, s"$base/i*", s"$base/e1", 1, "s")
    assert(spark.read.format("packedcorpus").load(s"$base/e1").count() == 1L)
    // two shard dirs under one glob: duplicate (file, seq_ix) basenames
    // would collide — refused with the single-flat-dir requirement
    PackedCorpus.write(Seq((0L, 0L, Seq(9))).toDF("shard", "seq_id", "input_ids"),
      s"$base/in2", numTasks = 1)
    val e = intercept[Exception](
      PackedCorpus.reshuffle(spark, s"$base/i*", s"$base/e2", 1, "s"))
    assert(e.getMessage.contains("SINGLE flat shard directory"))
  }

  test("PackedCorpus TOML input fails LOUDLY when a requested channel " +
      "field has no sidecars in the corpus (never null-as-empty masks)") {
    import spark.implicits._
    val base = tmp("packedchantoml")
    PackedCorpus.write(Seq((0L, 0L, Seq(1, 2))).toDF("shard", "seq_id", "input_ids"),
      s"$base/in", numTasks = 1) // no mask/seg channels
    def toml(fields: String) =
      s"""[fields]
         |names = [$fields]
         |[input]
         |name = "PackedCorpus"
         |  [input.config]
         |  Path = "$base/in"
         |[output]
         |name = "Nop"
         |""".stripMargin
    val e = intercept[Exception](
      Topology.compileToml(spark, toml("\"seq_ix\", \"loss_mask\"")))
    assert(e.getMessage.contains(".mask.idx"))
    val e2 = intercept[Exception](
      Topology.compileToml(spark, toml("\"seq_ix\", \"segment_ids\"")))
    assert(e2.getMessage.contains(".seg.idx"))
    // channel-free fields still compile and read
    assert(Topology.compileToml(spark, toml("\"seq_ix\", \"n_tokens\""))
      .projected.count() == 1L)
  }
}
