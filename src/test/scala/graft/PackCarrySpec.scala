package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.llm.Pack
import graft.sources.TarShards
import graft.streaming.Streaming

/** Cross-batch packing tail-carry ([[graft.llm.Pack.packTokensGreedyCarry]]
  * + the PackedShards CarryDir surface): the carry LAW (closed sequences
  * across ascending-order batches + one final tail ≡ the one-shot greedy
  * layout), batch-size-independent pad fraction via Pack.packingStats,
  * and the daemon path — checkpointed restart carries the tail across
  * micro-batches AND process restarts.
  */
class PackCarrySpec extends SparkSpec {

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Deterministic corpus: doc i has 1 + (i·7 % 9) tokens of value i,
    * mask alternating — enough length variety that tails are non-trivial.
    */
  private def corpus(n: Int): Seq[(Long, Seq[Int], Seq[Boolean])] =
    (0 until n).map { i =>
      val len = 1 + (i * 7) % 9
      (i.toLong, Seq.fill(len)(i), (0 until len).map(_ % 2 == 0))
    }

  private def toDf(rows: Seq[(Long, Seq[Int], Seq[Boolean])]): DataFrame = {
    import spark.implicits._
    rows.toDF("__ord", "__tok", "__msk")
  }

  private val budget = 16
  private def shardOf = pmod(col("__ord"), lit(2))

  /** Content signature of a packed row — seq_id is per-batch, so the
    * law compares the multiset of (shard, ids, segs, mask, n_real).
    */
  private def sig(df: DataFrame): Seq[String] =
    df.select(concat_ws("|", col("shard").cast("string"),
        array_join(transform(col("input_ids"), _.cast("string")), ","),
        array_join(transform(col("segment_ids"), _.cast("string")), ","),
        array_join(transform(col("loss_mask"),
          m => m.cast("int").cast("string")), ","),
        col("n_real").cast("string")).as("s"))
      .collect().map(_.getString(0)).toSeq.sorted

  private def oneShot(rows: Seq[(Long, Seq[Int], Seq[Boolean])],
      sep: Option[Int], eos: Option[Int], bos: Option[Int]): DataFrame =
    Pack.packTokensGreedy(toDf(rows), col("__ord"), col("__tok"),
      col("__msk"), budget, shardOf, padId = -7,
      sepId = sep, eosId = eos, bosId = bos)

  private def carryRound(batch: DataFrame, sep: Option[Int],
      eos: Option[Int], bos: Option[Int]): (DataFrame, DataFrame) = {
    val all = Pack.packTokensGreedyCarry(batch, col("__ord"), col("__tok"),
      col("__msk"), budget, shardOf, padId = -7,
      sepId = sep, eosId = eos, bosId = bos).cache()
    val seqs = all.filter(col("kind") === "seq")
      .select("shard", "seq_id", "input_ids", "segment_ids", "loss_mask",
        "n_real", "doc_start")
    val carry = all.filter(col("kind") === "carry")
      .select(col("ord").as("__ord"), col("input_ids").as("__tok"),
        col("loss_mask").as("__msk"))
    (seqs, carry)
  }

  for ((sep, eos, bos) <- Seq(
      (None, None, None),
      (Some(-6), Some(-4), Some(-5)): (Option[Int], Option[Int], Option[Int])))
    test(s"carry law (sep=$sep eos=$eos bos=$bos): closed sequences across " +
        "ascending batches + final tail ≡ the one-shot greedy layout") {
      val docs = corpus(40)
      val batches = docs.grouped(13).toSeq // uneven ascending batches
      var carried: DataFrame = toDf(Nil)
      var closed = Seq.empty[String]
      for (b <- batches) {
        val (seqs, carry) = carryRound(carried.unionByName(toDf(b)),
          sep, eos, bos)
        closed ++= sig(seqs)
        carried = toDf(carry.collect().map(r =>
          (r.getLong(0), r.getSeq[Int](1), r.getSeq[Boolean](2))).toSeq)
      }
      // final flush: the remaining tail packs exactly like a last batch
      val flushed = sig(oneShot(carried.collect().map(r =>
        (r.getLong(0), r.getSeq[Int](1), r.getSeq[Boolean](2))).toSeq,
        sep, eos, bos))
      assert((closed ++ flushed).sorted == sig(oneShot(docs, sep, eos, bos)))
      assert(closed.nonEmpty && flushed.nonEmpty,
        "fixture must exercise both closed and tail sequences")
    }

  test("pad fraction of SHIPPED sequences is batch-size-independent: " +
      "packingStats over closed rows is identical for a 2-batch and a " +
      "7-batch split of the same stream") {
    val docs = corpus(60)
    def closedStats(batchSize: Int): Seq[(Long, Long, Long, Long)] = {
      var carried = Seq.empty[(Long, Seq[Int], Seq[Boolean])]
      var closed: Option[DataFrame] = None
      for (b <- docs.grouped(batchSize)) {
        val (seqs, carry) = carryRound(toDf(carried ++ b), None, None, None)
        closed = Some(closed.map(_.unionByName(seqs)).getOrElse(seqs))
        carried = carry.collect().map(r =>
          (r.getLong(0), r.getSeq[Int](1), r.getSeq[Boolean](2))).toSeq
      }
      Pack.packingStats(closed.get, budget)
        .orderBy("shard")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(4))).toSeq // shard, n_seqs, n_tokens, pad_frac_bp
    }
    val two = closedStats(30)
    val seven = closedStats(9)
    assert(two == seven,
      s"closed-sequence pad stats must not depend on batch sizing: $two vs $seven")
  }

  test("an EMPTY carry partition (every shard closed exactly at budget) " +
      "reads back as zero rows — never a schema error, never a fall-through " +
      "to an older, already-consumed tail") {
    val dir = tmp("packcarry-empty")
    Pack.Carry.write(toDf(Seq((5L, Seq(1, 2), Seq(true, true)))), dir, 0)
    Pack.Carry.write(toDf(Nil), dir, 1) // zero tails: possibly zero part files
    val r = Pack.Carry.read(spark, dir, 2)
    assert(r.isDefined, "batch 1's empty tail must be FOUND, not skipped")
    assert(r.get.count() == 0,
      "batch 2 must see batch 1's EMPTY tail, not batch 0's consumed one")
    // and the newest-strictly-before rule still picks batch 0 for batch 1
    assert(Pack.Carry.read(spark, dir, 1).get.count() == 1)
  }

  test("daemon PackedShards with CarryDir: tails carry across micro-batches " +
      "AND a checkpointed restart; batch dirs + final carry reproduce the " +
      "one-shot layout") {
    val dir = tmp("packcarry-daemon")
    val shards = new java.io.File(dir, "wds"); shards.mkdirs()
    val docs = corpus(24)
    def shard(name: String, rows: Seq[(Long, Seq[Int], Seq[Boolean])],
        mtimeAgoMs: Long): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      rows.foreach { case (ord, toks, _) =>
        TarShards.writeEntry(bos, f"$ord%08d.txt",
          toks.mkString(",").getBytes("UTF-8"))
      }
      bos.write(new Array[Byte](1024))
      val f = new java.io.File(shards, name)
      val out = new java.io.FileOutputStream(f)
      out.write(bos.toByteArray); out.close()
      // FileStreamSource batches in timestamp order — pin it so ords
      // ascend across micro-batches (the carry-law precondition)
      f.setLastModified(System.currentTimeMillis() - mtimeAgoMs)
    }
    // ascending ords across shard files (the carry-law precondition)
    shard("s0.tar", docs.slice(0, 9), 30000)
    shard("s1.tar", docs.slice(9, 17), 20000)
    val toml =
      s"""[fields]
         |names = ["key", "txt"]
         |[input]
         |name = "WebDataset"
         |  [input.config]
         |  Path = "${shards.getAbsolutePath}"
         |  MaxFilesPerTrigger = 1
         |[output]
         |name = "PackedShards"
         |fields = ["key", "txt"]
         |  [output.config]
         |  Path = "$dir/out/batch={{.Rotation}}"
         |  IdsField = "txt"
         |  PackBudget = $budget
         |  PackOrderField = "key"
         |  PackShards = 2
         |  PadId = -7
         |  NumTasks = 1
         |  CarryDir = "$dir/carry"
         |  CarryRotation = "{{.Rotation}}"
         |""".stripMargin
    val d1 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d1.processAllAvailable()
    d1.stop()
    // restart with a NEW shard: the checkpoint resumes rotation numbering
    // and the carry reader picks the newest tail < the next rotation
    shard("s2.tar", docs.slice(17, 24), 0)
    val d2 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d2.processAllAvailable()
    d2.stop()
    // every batch dir is a complete _SUCCESS-marked corpus of CLOSED rows
    val batchDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getAbsolutePath).sorted
    assert(batchDirs.length == 3)
    batchDirs.foreach(b =>
      assert(new java.io.File(b, "_SUCCESS").exists(), s"no _SUCCESS in $b"))
    val closed = batchDirs.map(b =>
        spark.read.format("packedcorpus").load(b)
          .select(col("input_ids"), col("loss_mask"), col("segment_ids"),
            col("n_tokens")))
      .reduce(_ unionByName _)
    // shipped sequences are all FULL-budget rows with real masks/segments
    assert(closed.count() > 0)
    // final carry + closed rows reproduce the one-shot pack (mask in the
    // daemon path defaults to all-true; compare ids only)
    val carryRows = graft.llm.Pack.Carry.read(spark, s"$dir/carry",
      Long.MaxValue).get.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Boolean](2))).toSeq
    val flushedIds = oneShot(carryRows, None, None, None)
      .select("input_ids").collect().map(_.getSeq[Int](0)).toSeq
    val closedIds = closed.select("input_ids").collect()
      .map(_.getSeq[Int](0)).toSeq
    val wholeIds = oneShot(docs.map { case (o, t, m) =>
        (o, t, t.map(_ => true)) }, None, None, None)
      .select("input_ids").collect().map(_.getSeq[Int](0)).toSeq
    assert((closedIds ++ flushedIds).map(_.toString).sorted ==
      wholeIds.map(_.toString).sorted)
  }

  test("daemon PackedShards WITHOUT CarryDir: carry is the DEFAULT " +
      "posture — a rotation-independent <Path>/_carry appears, tails " +
      "carry, and a static explicit CarryRotation is refused") {
    val dir = tmp("packcarry-default")
    val shards = new java.io.File(dir, "wds"); shards.mkdirs()
    val docs = corpus(17)
    def shard(name: String, rows: Seq[(Long, Seq[Int], Seq[Boolean])],
        mtimeAgoMs: Long): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      rows.foreach { case (ord, toks, _) =>
        TarShards.writeEntry(bos, f"$ord%08d.txt",
          toks.mkString(",").getBytes("UTF-8"))
      }
      bos.write(new Array[Byte](1024))
      val f = new java.io.File(shards, name)
      val out = new java.io.FileOutputStream(f)
      out.write(bos.toByteArray); out.close()
      f.setLastModified(System.currentTimeMillis() - mtimeAgoMs)
    }
    shard("s0.tar", docs.slice(0, 9), 30000)
    shard("s1.tar", docs.slice(9, 17), 20000)
    def toml(extra: String): String =
      s"""[fields]
         |names = ["key", "txt"]
         |[input]
         |name = "WebDataset"
         |  [input.config]
         |  Path = "${shards.getAbsolutePath}"
         |  MaxFilesPerTrigger = 1
         |[output]
         |name = "PackedShards"
         |fields = ["key", "txt"]
         |  [output.config]
         |  Path = "$dir/out/batch={{.Rotation}}"
         |  IdsField = "txt"
         |  PackBudget = $budget
         |  PackOrderField = "key"
         |  PackShards = 2
         |  PadId = -7
         |  NumTasks = 1
         |$extra
         |""".stripMargin
    val d1 = Streaming.runDaemon(spark, toml(""), s"$dir/ckpt",
      triggerMs = 100, env = Map.empty)
    d1.processAllAvailable()
    d1.stop()
    // the default carry dir sits BESIDE the per-batch output dirs (the
    // {{.Rotation}} segment stripped — carry state is shared), and the
    // closed rows + final tail reproduce the one-shot layout
    assert(new java.io.File(s"$dir/out/_carry").exists(),
      "default CarryDir <Path-sans-rotation>/_carry must exist")
    val batchDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("batch=")).map(_.getAbsolutePath).sorted
    val closedIds = batchDirs.toSeq.map(b =>
        spark.read.format("packedcorpus").load(b).select("input_ids"))
      .reduce(_ unionByName _).collect().map(_.getSeq[Int](0)).toSeq
    val carryRows = Pack.Carry.read(spark, s"$dir/out/_carry", Long.MaxValue)
      .get.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Boolean](2))).toSeq
    val flushedIds = oneShot(carryRows, None, None, None)
      .select("input_ids").collect().map(_.getSeq[Int](0)).toSeq
    val wholeIds = oneShot(docs.map { case (o, t, _) =>
        (o, t, t.map(_ => true)) }, None, None, None)
      .select("input_ids").collect().map(_.getSeq[Int](0)).toSeq
    assert((closedIds ++ flushedIds).map(_.toString).sorted ==
      wholeIds.map(_.toString).sorted)
    // a static CarryRotation under a daemon is refused at START — each
    // batch would re-read and overwrite one carry partition
    val e = intercept[Exception] {
      Streaming.runDaemon(spark,
        toml(s"""  CarryDir = "$dir/carry2"
                |  CarryRotation = "7"""".stripMargin),
        s"$dir/ckpt2", triggerMs = 100, env = Map.empty)
    }
    assert(e.getMessage.contains("CarryRotation"))
  }

  test("a micro-batch that closes ZERO sequences exports NOTHING: no " +
      "_SUCCESS-marked empty corpus dir appears; the tokens ride the " +
      "stashed tail and ship in a later batch") {
    val dir = tmp("packcarry-empty")
    val shards = new java.io.File(dir, "wds"); shards.mkdirs()
    val docs = corpus(9)
    def shard(name: String, rows: Seq[(Long, Seq[Int], Seq[Boolean])],
        mtimeAgoMs: Long): Unit = {
      val bos = new java.io.ByteArrayOutputStream()
      rows.foreach { case (ord, toks, _) =>
        TarShards.writeEntry(bos, f"$ord%08d.txt",
          toks.mkString(",").getBytes("UTF-8"))
      }
      bos.write(new Array[Byte](1024))
      val f = new java.io.File(shards, name)
      val out = new java.io.FileOutputStream(f)
      out.write(bos.toByteArray); out.close()
      f.setLastModified(System.currentTimeMillis() - mtimeAgoMs)
    }
    val toml =
      s"""[fields]
         |names = ["key", "txt"]
         |[input]
         |name = "WebDataset"
         |  [input.config]
         |  Path = "${shards.getAbsolutePath}"
         |  MaxFilesPerTrigger = 1
         |[output]
         |name = "PackedShards"
         |fields = ["key", "txt"]
         |  [output.config]
         |  Path = "$dir/out/batch={{.Rotation}}"
         |  IdsField = "txt"
         |  PackBudget = $budget
         |  PackOrderField = "key"
         |  PackShards = 2
         |  PadId = -7
         |  NumTasks = 1
         |  CarryDir = "$dir/carry"
         |  CarryRotation = "{{.Rotation}}"
         |""".stripMargin
    // batch 0: ONE one-token document — far under budget, everything
    // rides the tail, and the export must not run at all
    shard("s0.tar", docs.slice(0, 1), 30000)
    val d1 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d1.processAllAvailable()
    d1.stop()
    def batchDirs(): Seq[String] =
      Option(new java.io.File(s"$dir/out").listFiles())
        .map(_.filter(_.getName.startsWith("batch=")).toSeq)
        .getOrElse(Seq.empty).map(_.getName).sorted
    assert(batchDirs().isEmpty,
      s"zero-closed batch must export nothing, found ${batchDirs()}")
    val stashed = Pack.Carry.read(spark, s"$dir/carry", Long.MaxValue)
      .get.count()
    assert(stashed == 1, "the un-shipped document must be in the tail")
    // batch 1: enough tokens that sequences close — the earlier tokens
    // ship now, and closed + final tail ≡ the one-shot layout
    shard("s1.tar", docs.slice(1, 9), 0)
    val d2 = Streaming.runDaemon(spark, toml, s"$dir/ckpt", triggerMs = 100,
      env = Map.empty)
    d2.processAllAvailable()
    d2.stop()
    assert(batchDirs() == Seq("batch=1"))
    val closedIds = spark.read.format("packedcorpus")
      .load(s"$dir/out/batch=1").select("input_ids").collect()
      .map(_.getSeq[Int](0)).toSeq
    assert(closedIds.nonEmpty)
    val carryRows = Pack.Carry.read(spark, s"$dir/carry", Long.MaxValue)
      .get.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1), r.getSeq[Boolean](2))).toSeq
    val flushedIds = oneShot(carryRows, None, None, None)
      .select("input_ids").collect().map(_.getSeq[Int](0)).toSeq
    val wholeIds = oneShot(docs.map { case (o, t, _) =>
        (o, t, t.map(_ => true)) }, None, None, None)
      .select("input_ids").collect().map(_.getSeq[Int](0)).toSeq
    assert((closedIds ++ flushedIds).map(_.toString).sorted ==
      wholeIds.map(_.toString).sorted)
  }
}
