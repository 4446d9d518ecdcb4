package graft.streaming

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** Shared layout contract of the streaming at-rest stores
  * ([[IncrementalDedupStream]], [[LexicalIndexStream]],
  * [[DenseIndexStream]], [[PqIndexStream]]): a store directory holds
  * `batch=<runTag>-<batchId>/` parquet partitions, each written with
  * overwrite by exactly one micro-batch (idempotent replay), and a reader
  * trusts only COMMITTED partitions — the `_SUCCESS` marker parquet
  * writes at job commit — so a crashed attempt's footerless part files
  * never poison a later read.
  *
  * Compaction ([[compact]]) rewrites many partitions as one
  * `batch=compact-<tag>/` partition under a two-phase commit that is
  * crash-safe WITHOUT requiring readers to tolerate duplicate rows
  * (postings and code tables don't — a duplicated posting doubles a tf,
  * a duplicated code row duplicates an ANN candidate):
  *
  *  1. the combined parquet is written (gets `_SUCCESS`), but a compact
  *     partition is NOT yet committed — readers additionally require its
  *     `_ABSORBED` manifest, so a crash here leaves the originals as the
  *     only visible copy;
  *  2. `_ABSORBED` (the newline-joined names of the absorbed partitions)
  *     is created — THE commit point: from this instant readers see the
  *     compact partition and exclude every absorbed name, so the data is
  *     never visible twice even though both copies are on disk;
  *  3. the absorbed directories are deleted; a crash mid-delete leaves
  *     invisible garbage that the next [[compact]] run sweeps first.
  *
  * The compact tag is the md5 of the absorbed-name set, so a re-run after
  * any crash recomputes the same target and overwrites its own partial
  * output — the same idempotency argument as the per-batch partitions.
  */
private[graft] object StoreLayout {

  private val AbsorbedFile = "_ABSORBED"

  private def isCompact(name: String): Boolean = name.startsWith("batch=compact-")

  private def readAbsorbed(fs: FileSystem, dir: Path): Seq[String] = {
    val f = new Path(dir, AbsorbedFile)
    if (!fs.exists(f)) Nil
    else {
      val in = fs.open(f)
      try {
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        var n = in.read(chunk)
        while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
        new String(buf.toByteArray, "UTF-8").split('\n').toSeq.filter(_.nonEmpty)
      } finally in.close()
    }
  }

  /** `batch=*` partitions a reader may trust: `_SUCCESS` present, compact
    * partitions also carrying their `_ABSORBED` manifest, minus every
    * partition some valid compact partition absorbed (it may still be on
    * disk between compaction's commit and its deletes).
    */
  private def listCommitted(fs: FileSystem, root: Path): Seq[FileStatus] = {
    if (!fs.exists(root)) return Nil
    val valid = fs.listStatus(root).toSeq.filter { s =>
      s.isDirectory && s.getPath.getName.startsWith("batch=") &&
        fs.exists(new Path(s.getPath, "_SUCCESS")) &&
        (!isCompact(s.getPath.getName) || fs.exists(new Path(s.getPath, AbsorbedFile)))
    }
    val absorbed = valid.filter(s => isCompact(s.getPath.getName))
      .flatMap(s => readAbsorbed(fs, s.getPath)).toSet
    valid.filterNot(s => absorbed.contains(s.getPath.getName))
  }

  /** Committed `batch=*` partition paths under `dir`, excluding
    * `exclude` (a replaying batch must not read its own previous
    * attempt's output).
    */
  def committed(spark: SparkSession, dir: String,
      exclude: Option[String] = None): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listCommitted(fs, root)
      .filterNot(s => exclude.contains(s.getPath.getName))
      .map(_.getPath.toString)
  }

  /** Offline compaction: every committed `batch=*` partition is rewritten
    * as one `batch=compact-<tag>` partition of `targetFiles` files, so
    * read amplification returns to O(targetFiles) after thousands of
    * micro-batches. Run while NO stream is writing the directory. Safe to
    * re-run after a crash at any point (protocol in the object scaladoc);
    * a run that finds ≤ 1 partition only sweeps leftovers and returns.
    */
  def compact(spark: SparkSession, dir: String, targetFiles: Int = 1): Unit = {
    require(targetFiles > 0, s"targetFiles must be positive: $targetFiles")
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    // sweep: finish any earlier run's interrupted step 3 — absorbed dirs
    // are invisible to readers but must be gone before this run can list
    // (and possibly re-absorb) the partitions that absorbed them
    val valid = listCommitted(fs, root)
    valid.filter(s => isCompact(s.getPath.getName)).foreach { s =>
      readAbsorbed(fs, s.getPath).foreach { name =>
        val leftover = new Path(root, name)
        if (fs.exists(leftover)) fs.delete(leftover, true)
      }
    }
    if (valid.length <= 1) return
    val names = valid.map(_.getPath.getName).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    val tag = md.digest(names.mkString("\n").getBytes("UTF-8"))
      .take(6).map(b => f"$b%02x").mkString
    val target = new Path(root, s"batch=compact-$tag")
    spark.read.parquet(valid.map(_.getPath.toString): _*)
      .coalesce(targetFiles)
      .write.mode("overwrite").parquet(target.toString)
    // the commit point: readers now see `target` and stop seeing `names`
    val out = fs.create(new Path(target, AbsorbedFile), true)
    try out.write(names.mkString("\n").getBytes("UTF-8")) finally out.close()
    valid.foreach(s => fs.delete(s.getPath, true))
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
