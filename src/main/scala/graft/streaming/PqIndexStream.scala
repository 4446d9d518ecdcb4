package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.{IvfPq, Opq, Pq}

/** Streaming maintenance of the at-rest PQ-compressed ANN tiers: every
  * micro-batch of new embeddings is encoded under a FIXED trained model
  * (train once on a bootstrap sample — codes are only comparable under
  * one codebook, so the model must stay pinned for the store's lifetime;
  * re-training means re-encoding the store as a batch job) and appended
  * as an idempotent `batch=<runTag>-<batchId>` partition of the
  * [[StoreLayout]] contract. Completes the streaming symmetry: the
  * MinHash store ([[IncrementalDedupStream]]), the BM25 index
  * ([[LexicalIndexStream]]) and the IVF cell assignment
  * ([[DenseIndexStream]]) already stream; this adds the PQ, OPQ and
  * IVF-PQ code tables, so every at-rest search tier can ingest
  * incrementally.
  *
  * The encode step is map-only per batch (the same codegen'd expressions
  * as the batch path), so a stream-appended store holds EXACTLY the rows
  * a one-shot batch encode would — search parity is structural, and
  * PqIndexStreamSpec pins it. Vectors themselves are NOT stored: the
  * store is the 32×-compressed code table the `adcTopKEncoded` entry
  * points scan.
  *
  * 100 TB posture: per-batch partitions accumulate — [[compactStore]]
  * (the shared crash-safe two-phase [[StoreLayout.compact]]) folds them;
  * promote an IVF-PQ snapshot to the serving layout by rewriting
  * partitioned by `cell` when probe-time partition pruning matters.
  */
object PqIndexStream {

  /** The idempotent `foreachBatch` function over any map-only encoder —
    * plain `(DataFrame, Long) => Unit`, directly callable from batch
    * jobs and tests. Use the [[pq]]/[[opq]]/[[ivfPq]] constructors for
    * the standard tiers.
    */
  def batchFunction(encode: DataFrame => DataFrame, indexDir: String,
      runTag: String = "run"): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      // lease protocol: fail loudly while maintenance holds the store
      StoreLayout.writing(batchDf.sparkSession, indexDir, runTag) {
        encode(batchDf).write.mode("overwrite")
          .parquet(s"$indexDir/batch=$runTag-$batchId")
      }

  /** (id, pq_codes) appends for [[Pq.adcTopKEncoded]]. */
  def pq(idCol: String, vecCol: String, model: Pq.PqModel): DataFrame => DataFrame =
    df => Pq.encode(df, idCol, vecCol, model)

  /** (id, pq_codes) appends in the rotated space for
    * [[Opq.adcTopKEncoded]] — rotation and model both pinned.
    */
  def opq(idCol: String, vecCol: String, rotation: Array[Array[Double]],
      model: Pq.PqModel): DataFrame => DataFrame =
    df => Opq.encode(df, idCol, vecCol, rotation, model)

  /** (id, cell, pq_codes) appends for [[IvfPq.adcTopKEncoded]] — coarse
    * quantizer and residual model both pinned.
    */
  def ivfPq(idCol: String, vecCol: String, coarse: Array[Array[Double]],
      model: Pq.PqModel): DataFrame => DataFrame =
    df => IvfPq.encode(df, idCol, vecCol, coarse, model)

  /** Int8 scalar tier under PINNED per-dimension [min, max] calibration
    * (from a bootstrap [[graft.llm.Quantize.int8Stats]] — like a PQ
    * codebook, the ranges must stay fixed for the store's lifetime; new
    * out-of-range values clamp).
    */
  def int8(idCol: String, vecCol: String, mins: Array[Double],
      maxs: Array[Double]): DataFrame => DataFrame =
    df => graft.llm.Quantize.int8Encode(df, idCol, vecCol, mins, maxs)

  /** Binary (1-bit sign) tier — model-free, so nothing to pin. */
  def binary(idCol: String, vecCol: String, dim: Int): DataFrame => DataFrame =
    df => graft.llm.Quantize.binaryEncode(df, idCol, vecCol, dim)

  /** All committed code rows — feed to the matching `adcTopKEncoded`.
    * None until a first batch commits (the schema lives in the data).
    */
  def loadEncoded(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val parts = StoreLayout.committed(spark, indexDir)
    if (parts.isEmpty) None else Some(spark.read.parquet(parts: _*))
  }

  /** Crash-safe offline fold of the per-batch partitions — see
    * [[StoreLayout.compact]]. Run while no stream is writing.
    */
  def compactStore(spark: SparkSession, indexDir: String,
      targetFiles: Int = 1): Unit =
    StoreLayout.compact(spark, indexDir, targetFiles)

  /** Promote an IVF-PQ code-table snapshot to the SERVING layout: the
    * committed `(id, cell, pq_codes)` rows rewritten partitioned by
    * `cell` under the versioned [[StoreLayout.publishServing]] contract,
    * so a probe's cell filter prunes whole hive partitions statically —
    * [[graft.llm.IvfPq.adcTopKServing]] over [[loadServing]] reads
    * `nprobe/nlist` of the store's files instead of all of them. The
    * ingest store keeps streaming; re-promote (cheap no-op when nothing
    * landed) to refresh the snapshot. Returns the committed version name,
    * None if the store is empty.
    */
  def promoteServing(spark: SparkSession, indexDir: String,
      servingDir: String): Option[String] =
    StoreLayout.publishServing(spark, indexDir, servingDir, Seq("cell"))

  /** The live cell-partitioned snapshot — feed to
    * [[graft.llm.IvfPq.adcTopKServing]]. None until a promotion commits.
    */
  def loadServing(spark: SparkSession, servingDir: String): Option[DataFrame] =
    StoreLayout.servingSnapshot(spark, servingDir)

  /** Right-to-be-forgotten: remove `ids`' code rows from the table via
    * the partition-granular crash-safe [[StoreLayout.delete]] — deleted
    * vectors can never again surface as ANN candidates, and no re-encode
    * of the survivors is needed (codes are row-independent under the
    * pinned model). Run while no stream is writing. Returns rows removed.
    */
  def deleteVectors(spark: SparkSession, indexDir: String, idCol: String,
      ids: DataFrame): Long =
    StoreLayout.deleteIds(spark, indexDir, idCol, ids)

  /** Start the maintenance query over a streaming embedding frame. */
  def start(docs: DataFrame, encode: DataFrame => DataFrame, indexDir: String,
      checkpointDir: String): StreamingQuery = {
    val runTag = StoreLayout.runTagFor(docs.sparkSession, checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(batchFunction(encode, indexDir, runTag))
      .start()
  }
}
