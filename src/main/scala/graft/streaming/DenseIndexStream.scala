package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.llm.Ivf

/** Streaming maintenance of the dense at-rest ANN index: every
  * micro-batch of new embeddings is cell-assigned under a FIXED coarse
  * quantizer (train once on a bootstrap sample; the assignment must stay
  * stable across batches or old cells would go stale) and appended as an
  * idempotent `batch=<runTag>-<batchId>` partition of (id, cell, vector)
  * rows — the dense sibling of [[LexicalIndexStream]], under the same
  * [[StoreLayout]] commit contract. [[loadAssigned]] recombines committed
  * partitions for [[Ivf.ivfTopKAssigned]] search; promote a snapshot to
  * the serving layout by rewriting partitioned by `cell` (the IvfPq
  * partition-pruning pattern) when read amplification matters.
  */
object DenseIndexStream {

  def batchFunction(idCol: String, vecCol: String, indexDir: String,
      cents: Array[Array[Double]], runTag: String = "run"): (DataFrame, Long) => Unit =
    (batchDf, batchId) =>
      // lease protocol: fail loudly while maintenance holds the store
      StoreLayout.writing(batchDf.sparkSession, indexDir, runTag) {
        Ivf.assign(batchDf, idCol, vecCol, cents)
          .write.mode("overwrite").parquet(s"$indexDir/batch=$runTag-$batchId")
      }

  /** All committed (id, cell, vec) rows — feed to [[Ivf.ivfTopKAssigned]].
    * Empty store → empty frame with the right schema is impossible
    * without a sample row, so this returns None until a batch commits.
    */
  def loadAssigned(spark: SparkSession, indexDir: String): Option[DataFrame] = {
    val parts = StoreLayout.committed(spark, indexDir)
    if (parts.isEmpty) None else Some(spark.read.parquet(parts: _*))
  }

  /** Promote the assigned-vector store to the SERVING layout: committed
    * `(id, cell, vec)` rows rewritten partitioned by `cell` under the
    * versioned [[StoreLayout.publishServing]] contract, so a probe's
    * literal cell filter prunes whole hive partitions statically —
    * [[graft.llm.Ivf.ivfTopKServing]] over [[loadServing]] reads
    * `nprobe/nlist` of the store's files instead of all of them (the
    * same promotion IVF-PQ got; unlike PQ the raw vector rides along for
    * the exact-cosine score). The ingest store keeps streaming;
    * re-promote (cheap no-op when nothing landed) to refresh. Returns
    * the committed version name, None if the store is empty.
    */
  def promoteServing(spark: SparkSession, indexDir: String,
      servingDir: String): Option[String] =
    StoreLayout.publishServing(spark, indexDir, servingDir, Seq("cell"))

  /** The live cell-partitioned snapshot — feed to
    * [[graft.llm.Ivf.ivfTopKServing]]. None until a promotion commits.
    */
  def loadServing(spark: SparkSession, servingDir: String): Option[DataFrame] =
    StoreLayout.servingSnapshot(spark, servingDir)

  /** Right-to-be-forgotten: remove `ids`' assigned-vector rows from the
    * store via the partition-granular crash-safe [[StoreLayout.delete]].
    * Run while no stream is writing. Returns rows removed.
    */
  def deleteVectors(spark: SparkSession, indexDir: String, idCol: String,
      ids: DataFrame): Long =
    StoreLayout.deleteIds(spark, indexDir, idCol, ids)

  def start(docs: DataFrame, idCol: String, vecCol: String, indexDir: String,
      checkpointDir: String, cents: Array[Array[Double]]): StreamingQuery = {
    val runTag = StoreLayout.runTagFor(docs.sparkSession, checkpointDir)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(batchFunction(idCol, vecCol, indexDir, cents, runTag))
      .start()
  }
}
