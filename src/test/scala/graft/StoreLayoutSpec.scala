package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.StoreLayout

/** [[StoreLayout.compact]]'s two-phase commit: every crash window leaves
  * readers seeing each row exactly once, and a re-run finishes the job.
  */
class StoreLayoutSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-storelayout").toFile

  private def writeBatch(dir: String, name: String, ids: Long*): Unit = {
    import spark.implicits._
    ids.toDF("id").write.mode("overwrite").parquet(s"$dir/batch=$name")
  }

  private def readIds(dir: String): Seq[Long] = {
    val parts = StoreLayout.committed(spark, dir)
    if (parts.isEmpty) Nil
    else spark.read.parquet(parts: _*).select("id")
      .collect().map(_.getLong(0)).toSeq.sorted
  }

  private def partNames(dir: String): Seq[String] =
    Option(new java.io.File(dir).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName).sorted

  test("compact folds committed partitions into one; rows unchanged") {
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L, 2L)
    writeBatch(dir, "run-1", 3L)
    writeBatch(dir, "run-2", 4L, 5L)
    assert(readIds(dir) == Seq(1L, 2L, 3L, 4L, 5L))
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L, 3L, 4L, 5L))
    val parts = partNames(dir)
    assert(parts.length == 1 && parts(0).startsWith("batch=compact-"), parts.mkString(","))
    // idempotent: a second run is a no-op
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L, 3L, 4L, 5L) && partNames(dir) == parts)
  }

  test("crash before the rename-commit: staging dir is invisible and swept") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L)
    writeBatch(dir, "run-1", 2L)
    // simulate step 1 completing and the process dying before step 2: a
    // fully-written staging dir that was never renamed into batch=*
    Seq(1L, 2L).toDF("id").write.mode("overwrite").parquet(s"$dir/_compacting-dead")
    assert(readIds(dir) == Seq(1L, 2L), "originals must remain the only visible copy")
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L))
    assert(!partNames(dir).exists(_.startsWith("_compacting-")), "orphan must be swept")
  }

  test("legacy compact partitions (pre-manifest era, no _ABSORBED) stay readable") {
    val dir = tmp().toString
    // an old-protocol store: its compaction deleted the originals but left
    // no manifest — the reader must accept it as ordinary committed data
    writeBatch(dir, "compact-1712345678901", 1L, 2L)
    assert(readIds(dir) == Seq(1L, 2L), "legacy compact data must not vanish")
    writeBatch(dir, "run-7", 3L)
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L, 3L) && partNames(dir).length == 1)
  }

  test("runTagFor: stable while the checkpoint lives, fresh after a wipe") {
    val chk = tmp().toString + "/chk"
    val t1 = StoreLayout.runTagFor(spark, chk)
    assert(StoreLayout.runTagFor(spark, chk) == t1, "restart with intact checkpoint")
    // wiping the checkpoint restarts batchIds at 0 — the tag must change,
    // or the fresh query's batch=<tag>-0 collides with a name a committed
    // _ABSORBED manifest already hides (and the next sweep would delete)
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.foreach(rm)
      f.delete()
    }
    rm(new java.io.File(chk))
    val t2 = StoreLayout.runTagFor(spark, chk)
    assert(t2 != t1 && t2.length == 12, s"wiped checkpoint must mint a fresh tag: $t2")
  }

  test("crash after _ABSORBED, before deletes: absorbed partitions are invisible") {
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L)
    writeBatch(dir, "run-1", 2L)
    StoreLayout.compact(spark, dir)
    // simulate the deletes never happening: re-create an absorbed original
    // next to the committed compact partition
    writeBatch(dir, "run-0", 1L)
    assert(partNames(dir).contains("batch=run-0"))
    assert(readIds(dir) == Seq(1L, 2L), "absorbed leftover must not double-count")
    // the next compact run sweeps the leftover even with nothing to fold
    StoreLayout.compact(spark, dir)
    assert(!partNames(dir).contains("batch=run-0"))
    assert(readIds(dir) == Seq(1L, 2L))
  }

  test("compaction composes with later appends and a second compaction") {
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L)
    writeBatch(dir, "run-1", 2L)
    StoreLayout.compact(spark, dir)
    writeBatch(dir, "run-2", 3L)
    assert(readIds(dir) == Seq(1L, 2L, 3L))
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L, 3L) && partNames(dir).length == 1)
  }

  test("uncommitted partitions (no _SUCCESS) are neither read nor absorbed") {
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L)
    writeBatch(dir, "run-1", 2L)
    // a crashed attempt: partial dir without the _SUCCESS marker
    val partial = new java.io.File(s"$dir/batch=run-partial")
    assert(partial.mkdirs())
    Files.write(new java.io.File(partial, "part-00000.parquet").toPath,
      Array[Byte](1, 2, 3))
    assert(readIds(dir) == Seq(1L, 2L))
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L))
    // the partial dir is left alone for its own writer's replay to overwrite
    assert(partNames(dir).contains("batch=run-partial"))
  }

  test("delete is partition-granular: untouched partitions keep their " +
      "names, affected ones rewrite under the staged protocol") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L, 2L)
    writeBatch(dir, "run-1", 3L, 4L)
    writeBatch(dir, "run-2", 5L)
    val n = StoreLayout.deleteIds(spark, dir, "id", Seq(3L, 99L).toDF("id"))
    assert(n == 1L)
    assert(readIds(dir) == Seq(1L, 2L, 4L, 5L))
    val parts = partNames(dir)
    assert(parts.contains("batch=run-0") && parts.contains("batch=run-2"),
      s"untouched partitions must not be rewritten: $parts")
    assert(!parts.contains("batch=run-1") &&
      parts.count(_.startsWith("batch=compact-")) == 1,
      s"the affected partition must be replaced by a staged rewrite: $parts")
    // idempotent: nothing left to delete, no partition churn
    assert(StoreLayout.deleteIds(spark, dir, "id", Seq(3L).toDF("id")) == 0L)
    assert(partNames(dir) == parts)
    // a second, different delete chains over the rewritten partition
    assert(StoreLayout.deleteIds(spark, dir, "id", Seq(4L).toDF("id")) == 1L)
    assert(readIds(dir) == Seq(1L, 2L, 5L))
  }

  test("delete that empties a partition leaves a committed empty " +
      "partition; readers see the survivors only") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L)
    writeBatch(dir, "run-1", 2L, 3L)
    assert(StoreLayout.deleteIds(spark, dir, "id", Seq(2L, 3L).toDF("id")) == 2L)
    assert(readIds(dir) == Seq(1L))
  }

  test("delete crash window: an absorbed leftover next to the rewritten " +
      "partition never double-counts, and a re-run sweeps it") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L, 2L)
    assert(StoreLayout.deleteIds(spark, dir, "id", Seq(2L).toDF("id")) == 1L)
    // simulate the crash-after-rename-before-delete window: the absorbed
    // original reappears beside the committed rewrite
    writeBatch(dir, "run-0", 1L, 2L)
    assert(readIds(dir) == Seq(1L), "absorbed leftover must stay invisible")
    // the re-run of the SAME delete sweeps it and finds nothing doomed
    assert(StoreLayout.deleteIds(spark, dir, "id", Seq(2L).toDF("id")) == 0L)
    assert(!partNames(dir).contains("batch=run-0"))
    assert(readIds(dir) == Seq(1L))
  }

  test("a keep() that grows a partition fails BEFORE the commit rename: " +
      "the original stays visible, the bad rewrite is an invisible orphan") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L, 2L)
    // the pre-discovered path defers the grow check to the observed write
    // — it must still fire before anything becomes reader-visible
    intercept[IllegalArgumentException](
      StoreLayout.delete(spark, dir, df => df.unionAll(df),
        onlyParts = Some(Set("batch=run-0"))))
    assert(readIds(dir) == Seq(1L, 2L), "original must survive a bad keep()")
    assert(!partNames(dir).exists(_.startsWith("batch=compact-")),
      "the grown rewrite must never commit")
    // any later protocol run sweeps whatever staging debris remains
    StoreLayout.deleteIds(spark, dir, "id", Seq(99L).toDF("id"))
    assert(!partNames(dir).exists(_.startsWith("_compacting-")))
    assert(readIds(dir) == Seq(1L, 2L))
  }

  test("randomized append/compact/delete sequences: the reader's view " +
      "always equals the reference set") {
    import spark.implicits._
    for (seed <- 1 to 5) {
      val rng = new scala.util.Random(seed)
      val dir = tmp().toString
      var next = 0L
      val ref = scala.collection.mutable.SortedSet.empty[Long]
      for (step <- 0 until 8) {
        rng.nextInt(4) match {
          case 0 | 1 => // append a fresh committed batch
            val ids = (0 until 1 + rng.nextInt(4)).map(_ => { next += 1; next })
            writeBatch(dir, s"run-$step", ids: _*)
            ref ++= ids
          case 2 =>
            StoreLayout.compact(spark, dir)
          case 3 if ref.nonEmpty =>
            val doomed = ref.filter(_ => rng.nextBoolean()).toSeq
            val n = StoreLayout.deleteIds(spark, dir, "id", doomed.toDF("id"))
            assert(n == doomed.size, s"seed=$seed step=$step: $n != ${doomed.size}")
            ref --= doomed
          case _ => ()
        }
        assert(readIds(dir) == ref.toSeq,
          s"seed=$seed step=$step: ${readIds(dir)} != $ref")
      }
    }
  }

  test("replaceAll swaps the whole store content in one commit and " +
      "absorbs every prior partition") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L, 2L)
    writeBatch(dir, "run-1", 3L)
    StoreLayout.replaceAll(spark, dir, Seq(7L, 8L).toDF("id"))
    assert(readIds(dir) == Seq(7L, 8L))
    assert(partNames(dir).count(_.startsWith("batch=")) == 1)
    // works on an empty/missing dir too (creates the single partition)
    val dir2 = tmp().toString + "/fresh"
    StoreLayout.replaceAll(spark, dir2, Seq(9L).toDF("id"))
    assert(readIds(dir2) == Seq(9L))
  }

  private def plantLease(dir: String, owner: String, ageMs: Long): Unit =
    Files.write(new java.io.File(dir, "_MAINT_LEASE").toPath,
      s"$owner\n${System.currentTimeMillis() - ageMs}".getBytes("UTF-8"))

  test("maintenance lease: concurrent maintenance fails loudly; a crashed " +
      "holder's lease is taken over once stale or broken explicitly") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L)
    writeBatch(dir, "run-1", 2L)
    // a FRESH lease (another maintenance run in flight) blocks everything
    plantLease(dir, "compact-other", ageMs = 0L)
    val e1 = intercept[IllegalStateException](StoreLayout.compact(spark, dir))
    assert(e1.getMessage.contains("compact-other"), e1.getMessage)
    val e2 = intercept[IllegalStateException](
      StoreLayout.replaceAll(spark, dir, Seq(9L).toDF("id")))
    assert(e2.getMessage.contains("lease held"), e2.getMessage)
    val e3 = intercept[IllegalStateException](
      StoreLayout.deleteIds(spark, dir, "id", Seq(1L).toDF("id")))
    assert(e3.getMessage.contains("lease held"), e3.getMessage)
    assert(readIds(dir) == Seq(1L, 2L), "blocked maintenance must not touch data")
    // a STALE lease (crashed holder) is taken over automatically...
    plantLease(dir, "compact-dead", ageMs = StoreLayout.DefaultStaleMs + 1000)
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L))
    assert(partNames(dir).count(_.startsWith("batch=")) == 1)
    // ...and the lease is released afterwards (next maintenance proceeds)
    assert(!new java.io.File(dir, "_MAINT_LEASE").exists(),
      "lease must be released on completion")
    // breakLease removes a fresh lease when the operator KNOWS it is dead
    plantLease(dir, "delete-dead", ageMs = 0L)
    assert(StoreLayout.breakLease(spark, dir))
    StoreLayout.replaceAll(spark, dir, Seq(5L).toDF("id"))
    assert(readIds(dir) == Seq(5L))
  }

  private def plantBeat(dir: String, tag: String, state: String,
      ageMs: Long): Unit =
    Files.write(new java.io.File(dir, s"_writer-$tag").toPath,
      s"$tag\n$state\n${System.currentTimeMillis() - ageMs}".getBytes("UTF-8"))

  test("maintenance lease vs live stream: an in-flight write blocks " +
      "maintenance; an idle heartbeat does not; a fresh lease fails the " +
      "writer's batch; a crashed mid-write heartbeat ages out") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L)
    writeBatch(dir, "run-1", 2L)
    // a write in flight (crashed mid-batch, or genuinely racing) —
    // maintenance must refuse while the `writing` stamp is fresh
    plantBeat(dir, "stream-a", "writing", ageMs = 0L)
    val e = intercept[IllegalArgumentException](StoreLayout.compact(spark, dir))
    assert(e.getMessage.contains("stream-a"), e.getMessage)
    assert(readIds(dir) == Seq(1L, 2L), "blocked maintenance must not touch data")
    // a COMPLETED batch (the bracket stamps `idle` on exit) never blocks:
    // the normal stop-stream-then-compact flow needs no waiting period
    StoreLayout.writing(spark, dir, "stream-a") { () } // stamps idle on exit
    StoreLayout.compact(spark, dir)
    assert(readIds(dir) == Seq(1L, 2L))
    assert(partNames(dir).count(_.startsWith("batch=")) == 1)
    // writer side: a fresh maintenance lease fails the batch loudly and
    // the body never runs; the heartbeat is left idle, not writing
    plantLease(dir, "compact-live", ageMs = 0L)
    var ran = false
    val w = intercept[IllegalArgumentException](
      StoreLayout.writing(spark, dir, "stream-a") { ran = true })
    assert(w.getMessage.contains("compact-live") && !ran, w.getMessage)
    StoreLayout.breakLease(spark, dir)
    StoreLayout.compact(spark, dir) // idle heartbeat from the failed batch
    // a `writing` stamp older than staleMs (JVM died mid-write) ages out
    plantBeat(dir, "stream-b", "writing",
      ageMs = StoreLayout.DefaultStaleMs + 1000)
    StoreLayout.replaceAll(spark, dir, Seq(7L).toDF("id"))
    assert(readIds(dir) == Seq(7L))
    assert(!new java.io.File(dir, "_writer-stream-b").exists(),
      "stale heartbeats are swept during acquisition")
    // a batch body that THROWS still exits the bracket idle — its partial
    // output is the commit protocol's problem, not the lease's
    intercept[RuntimeException](
      StoreLayout.writing(spark, dir, "stream-c") { sys.error("batch died") })
    StoreLayout.compact(spark, dir) // not blocked
    assert(readIds(dir) == Seq(7L))
  }

  test("deleteIds evaluates a derived id frame exactly once (collected to " +
      "a broadcast-local relation, never recomputed per partition)") {
    import spark.implicits._
    val dir = tmp().toString
    writeBatch(dir, "run-0", 1L, 2L)
    writeBatch(dir, "run-1", 3L, 4L)
    writeBatch(dir, "run-2", 5L, 6L)
    val evals = spark.sparkContext.longAccumulator("idEvals")
    val expensive = udf { (id: Long) => evals.add(1L); id }
    // a derived frame a naive implementation would recompute per affected
    // partition AND once more for discovery — 3+ evaluations per row
    val ids = Seq(1L, 3L).toDF("id").select(expensive(col("id")).as("id"))
    val removed = StoreLayout.deleteIds(spark, dir, "id", ids)
    assert(removed == 2L, s"removed $removed")
    assert(readIds(dir) == Seq(2L, 4L, 5L, 6L))
    assert(evals.value == 2L,
      s"id frame must be evaluated once (2 rows), got ${evals.value} evals")
    // the bound is loud, not a silent truncation
    val big = spark.range(10).toDF("id")
    val e = intercept[IllegalArgumentException](
      StoreLayout.deleteIds(spark, dir, "id", big, maxIds = 5))
    assert(e.getMessage.contains("more than 5"), e.getMessage)
  }

  private def writeKeyed(dir: String, name: String, rows: (Long, Int)*): Unit = {
    import spark.implicits._
    rows.toDF("id", "k").write.mode("overwrite").parquet(s"$dir/batch=$name")
  }

  private def servedRows(sdir: String): Seq[(Long, Int)] =
    StoreLayout.servingSnapshot(spark, sdir).toSeq
      .flatMap(_.select("id", "k").collect().map(r => (r.getLong(0), r.getInt(1))))
      .sorted

  test("publishServing: versioned partitioned snapshot; unchanged source " +
      "is a no-op; a changed source mints the next version and sweeps") {
    val dir = tmp().toString
    val sdir = tmp().toString + "/serve"
    assert(StoreLayout.publishServing(spark, dir, sdir, Seq("k")).isEmpty,
      "missing store must publish nothing")
    writeKeyed(dir, "run-0", 1L -> 0, 2L -> 1)
    writeKeyed(dir, "run-1", 3L -> 0)
    val v1 = StoreLayout.publishServing(spark, dir, sdir, Seq("k"))
    assert(v1.exists(_.startsWith("serve=1-")), s"got $v1")
    assert(servedRows(sdir) == Seq(1L -> 0, 2L -> 1, 3L -> 0))
    // hive layout on disk: one k= dir per key, one data file in each
    val vDir = new java.io.File(sdir, v1.get)
    val kDirs = Option(vDir.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.startsWith("k=")).sortBy(_.getName)
    assert(kDirs.map(_.getName) == Seq("k=0", "k=1"), kDirs.mkString(","))
    assert(kDirs.forall(d => d.listFiles().count(_.getName.endsWith(".parquet")) == 1),
      "expected exactly one file per partition value")
    // unchanged source: same version back, nothing rewritten
    assert(StoreLayout.publishServing(spark, dir, sdir, Seq("k")) == v1)
    assert(Option(new java.io.File(sdir).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName) == Seq(v1.get))
    // source changes (an append AND a compaction both change the
    // absorbed-name set): next version commits, superseded one is swept
    writeKeyed(dir, "run-2", 9L -> 1)
    val v2 = StoreLayout.publishServing(spark, dir, sdir, Seq("k"))
    assert(v2.exists(_.startsWith("serve=2-")) && v2 != v1, s"got $v2")
    assert(servedRows(sdir) == Seq(1L -> 0, 2L -> 1, 3L -> 0, 9L -> 1))
    assert(Option(new java.io.File(sdir).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName) == Seq(v2.get),
      "superseded serving version must be swept")
  }

  test("publishServing crash windows: a dead staging dir is invisible and " +
      "swept; readers keep the previous version until the commit rename") {
    val dir = tmp().toString
    val sdir = tmp().toString + "/serve"
    writeKeyed(dir, "run-0", 1L -> 0)
    val v1 = StoreLayout.publishServing(spark, dir, sdir, Seq("k"))
    // simulate a promotion that died before its rename-commit
    import spark.implicits._
    Seq(7L -> 9).toDF("id", "k").write.partitionBy("k")
      .parquet(s"$sdir/_promoting-9-deadbeef")
    assert(servedRows(sdir) == Seq(1L -> 0),
      "a staged-but-uncommitted promotion must be reader-invisible")
    writeKeyed(dir, "run-1", 2L -> 1)
    val v2 = StoreLayout.publishServing(spark, dir, sdir, Seq("k"))
    assert(v2.exists(_.startsWith("serve=2-")))
    val names = Option(new java.io.File(sdir).listFiles()).toSeq.flatten
      .filter(_.isDirectory).map(_.getName)
    assert(names == Seq(v2.get), s"orphan staging must be swept: $names")
    assert(servedRows(sdir) == Seq(1L -> 0, 2L -> 1))
  }

  test("publishServing runs under the source maintenance lease: a held " +
      "lease fails it loudly; it never mutates the source") {
    val dir = tmp().toString
    val sdir = tmp().toString + "/serve"
    writeKeyed(dir, "run-0", 1L -> 0)
    val before = partNames(dir)
    val lease = new java.io.File(dir, "_MAINT_LEASE")
    java.nio.file.Files.write(lease.toPath,
      s"other-maint\n${System.currentTimeMillis()}".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](
      StoreLayout.publishServing(spark, dir, sdir, Seq("k")))
    assert(e.getMessage.contains("other-maint"), e.getMessage)
    lease.delete()
    StoreLayout.publishServing(spark, dir, sdir, Seq("k"))
    assert(partNames(dir) == before, "promotion must never mutate the source")
  }
}
