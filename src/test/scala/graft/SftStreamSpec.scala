package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.functions.TextFunctions
import graft.llm.Pack
import graft.sources.TarShards

/** The streaming SFT topology end to end under micro-batch semantics:
  * tar shard stream → FIM transform → token ids → greedy no-split
  * packing (materialized training rows), with checkpointed restart —
  * the daemon form of q_pack_ids_greedy's batch capstone.
  */
class SftStreamSpec extends SparkSpec {
  import spark.implicits._

  private def shard(dir: java.io.File, name: String,
      entries: (String, String)*): Unit = {
    val bos = new ByteArrayOutputStream()
    entries.foreach { case (n, d) =>
      TarShards.writeEntry(bos, n, d.getBytes(UTF_8)) }
    bos.write(new Array[Byte](1024))
    val out = new FileOutputStream(new java.io.File(dir, name))
    out.write(bos.toByteArray); out.close()
  }

  private def tmp(prefix: String): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d
  }

  // the per-batch SFT transform: FIM at rate 1.0 (deterministic in the
  // sample key), char-code token ids, mask all-real, shard 0, budget 64
  private def sftTransform(batch: DataFrame): DataFrame = {
    val fimmed = batch
      .select(col("key"), col("payload").cast("string").as("text"))
      .withColumn("__fim", TextFunctions.fimTransform(
        col("text"), col("key"), seed = "sft", rate = 1.0))
    val ids = fimmed.withColumn("__ids",
      transform(filter(split(col("__fim"), ""), c => c =!= ""),
        c => ascii(c)))
    Pack.packTokensGreedy(ids, col("key"), col("__ids"),
      transform(col("__ids"), _ => lit(true)),
      budget = 64, shard = lit(0), padId = 0)
  }

  private def runOnce(dir: java.io.File, ckpt: java.io.File,
      out: java.io.File): Unit = {
    val q = spark.readStream.format("tar").load(dir.getAbsolutePath)
      .writeStream
      .option("checkpointLocation", ckpt.getAbsolutePath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sftTransform(batch).write.mode("append")
          .parquet(out.getAbsolutePath)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(!q.isActive)
  }

  /** Rebuild each packed document's text from (input_ids, segment_ids,
    * loss_mask): per sequence, real positions grouped by segment, ids
    * back to chars.
    */
  private def reconstruct(out: java.io.File): Seq[String] =
    spark.read.parquet(out.getAbsolutePath)
      .select("input_ids", "segment_ids", "loss_mask").collect().toSeq
      .flatMap { r =>
        val ids = r.getSeq[Int](0); val seg = r.getSeq[Int](1)
        val msk = r.getSeq[Boolean](2)
        ids.indices.filter(msk)
          .groupBy(seg(_)).toSeq.sortBy(_._1)
          .map { case (_, ix) => ix.map(i => ids(i).toChar).mkString }
      }

  test("tar stream -> FIM -> ids -> packed training rows, checkpointed restart") {
    val dir = tmp("sft-tar"); val ckpt = tmp("sft-ckpt"); val out = tmp("sft-out")
    val batch1 = Seq("a.txt" -> "def add(x, y): return x + y",
      "b.txt" -> "for i in range(10): print(i)")
    shard(dir, "part-00000.tar", batch1: _*)
    runOnce(dir, ckpt, out)
    // expected = the SAME transform applied in batch mode to the same docs
    def expected(docs: Seq[(String, String)]): Seq[String] =
      docs.toDF("key", "text")
        .select(TextFunctions.fimTransform(col("text"), col("key"),
          seed = "sft", rate = 1.0).as("f"))
        .as[String].collect().toSeq
    assert(reconstruct(out).sorted == expected(batch1.map {
      case (n, t) => (n.stripSuffix(".txt"), t) }).sorted)
    // every FIM output carries the sentinels (rate 1.0 selects all)
    assert(reconstruct(out).forall(s =>
      s.contains("<PRE>") && s.contains("<SUF>") && s.contains("<MID>")))
    // a new shard lands; the restarted query packs ONLY the new doc
    val batch2 = Seq("c.txt" -> "while True: pass")
    shard(dir, "part-00001.tar", batch2: _*)
    runOnce(dir, ckpt, out)
    val all = (batch1 ++ batch2).map { case (n, t) => (n.stripSuffix(".txt"), t) }
    assert(reconstruct(out).sorted == expected(all).sorted)
    // no-split law survives streaming: each doc's chars are contiguous
    // within one sequence (reconstruct would otherwise interleave), and
    // rows pad to the budget
    val rows = spark.read.parquet(out.getAbsolutePath).collect()
    assert(rows.forall(_.getSeq[Int](rows.head.fieldIndex("input_ids")).size == 64))
  }
}
