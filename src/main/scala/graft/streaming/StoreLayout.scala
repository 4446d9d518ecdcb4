package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared layout contract of the streaming at-rest stores
  * ([[IncrementalDedupStream]], [[LexicalIndexStream]]): a store directory
  * holds `batch=<runTag>-<batchId>/` parquet partitions, each written
  * with overwrite by exactly one micro-batch (idempotent replay), and a
  * reader trusts only COMMITTED partitions — the `_SUCCESS` marker parquet
  * writes at job commit — so a crashed attempt's footerless part files
  * never poison a later read.
  */
private[streaming] object StoreLayout {

  /** Committed `batch=*` partition paths under `dir`, excluding
    * `exclude` (a replaying batch must not read its own previous
    * attempt's output).
    */
  def committed(spark: SparkSession, dir: String,
      exclude: Option[String] = None): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch=")
        && !exclude.contains(s.getPath.getName)
        && fs.exists(new Path(s.getPath, "_SUCCESS")))
      .map(_.getPath.toString)
  }

  /** Stable-per-checkpoint, distinct-across-queries run tag: the md5
    * prefix of the FULLY QUALIFIED checkpoint path (FileSystem-resolved,
    * so "./chk" and "/abs/chk" spell the same tag — a restart that
    * respells the dir must not mint a new tag, or the replayed batch
    * would meet its own previous attempt's partition in the store).
    */
  def runTagFor(spark: SparkSession, checkpointDir: String): String = {
    val p = new Path(checkpointDir)
    val canonical = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toUri.normalize().toString.stripSuffix("/")
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(canonical.getBytes("UTF-8")).take(6).map(b => f"$b%02x").mkString
  }
}
