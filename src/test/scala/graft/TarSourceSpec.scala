package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.functions._

import graft.sources.{TarReader, TarShards, TarSource}

/** The `tar` DSv2 source (WebDataset shards), the shard writer, and the
  * column-held archive walker: writer↔reader round trips (plain/gz/zstd),
  * sample grouping, ext pushdown, shard rolling, ustar/GNU/pax parsing
  * edges, and loud failure on corrupt headers.
  */
class TarSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = java.nio.file.Files.createTempDirectory(prefix).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  private def entryBytes(name: String, data: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    TarShards.writeEntry(bos, name, data)
    bos.toByteArray
  }

  private def archive(entries: (String, Array[Byte])*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    entries.foreach { case (n, d) => TarShards.writeEntry(bos, n, d) }
    bos.write(new Array[Byte](1024))
    bos.toByteArray
  }

  private val samples = Seq(
    ("s/000", "txt", "alpha doc"), ("s/000", "json", """{"lang":"en"}"""),
    ("s/001", "txt", "beta doc"), ("s/001", "json", """{"lang":"de"}"""),
    ("s/001", "seg.png", "PNGBYTES"),
    ("s/002", "txt", "gamma"))

  private def samplesDf =
    samples.toDF("key", "ext", "text")
      .withColumn("payload", col("text").cast("binary")).drop("text")

  test("writer -> flat reader round trip, all columns") {
    val dir = tmp("tar-rt")
    TarShards.write(samplesDf, dir, numTasks = 2)
    val back = spark.read.format("tar").load(dir)
      .select(col("key"), col("ext"), col("payload").cast("string"), col("name"), col("size"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSet
    assert(back == samples.map { case (k, e, t) =>
      (k, e, t, s"$k.$e", t.getBytes(UTF_8).length.toLong) }.toSet)
    // staged-commit discipline: every shard was renamed from its
    // dot-prefixed staging name (none left behind), and the job marked
    // completion so a partial shard set is distinguishable from a full one
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!left.exists(_.startsWith(".inprogress")), left.toString)
    assert(left.contains("_SUCCESS"), left.toString)
  }

  test("a rerun sweeps a dead attempt's orphaned staging file") {
    val dir = tmp("tar-stale")
    // simulate a task attempt killed mid-write in a PREVIOUS job: an
    // .inprogress file nothing will ever rename
    new java.io.File(dir).mkdirs()
    val orphan = new java.io.File(dir, ".inprogress-999-part-00099-00000.tar")
    java.nio.file.Files.write(orphan.toPath, "torn bytes".getBytes(UTF_8))
    TarShards.write(samplesDf, dir, numTasks = 2)
    val left = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(!left.exists(_.startsWith(".inprogress")), left.toString)
    assert(left.contains("_SUCCESS"), left.toString)
  }

  test("grouped reader assembles adjacent members into samples") {
    val dir = tmp("tar-grp")
    TarShards.write(samplesDf, dir, numTasks = 1)
    val rows = spark.read.format("tar").option("group", "true").load(dir)
      .select(col("key"), col("files"))
      .as[(String, Map[String, Array[Byte]])].collect()
      .map { case (k, m) => k -> m.view.mapValues(new String(_, UTF_8)).toMap }.toMap
    assert(rows == Map(
      "s/000" -> Map("txt" -> "alpha doc", "json" -> """{"lang":"en"}"""),
      "s/001" -> Map("txt" -> "beta doc", "json" -> """{"lang":"de"}""",
        "seg.png" -> "PNGBYTES"),
      "s/002" -> Map("txt" -> "gamma")))
  }

  test("exts option filters members in both modes") {
    val dir = tmp("tar-exts")
    TarShards.write(samplesDf, dir, numTasks = 1)
    val flat = spark.read.format("tar").option("exts", "txt").load(dir)
    assert(flat.select("ext").distinct().as[String].collect().toSeq == Seq("txt"))
    assert(flat.count() == 3)
    val grouped = spark.read.format("tar").option("group", "true")
      .option("exts", "json").load(dir)
      .select("key").as[String].collect().toSet
    assert(grouped == Set("s/000", "s/001")) // s/002 has no json member
  }

  test("metadata-only scan (payload pruned) lists every member") {
    val dir = tmp("tar-meta")
    TarShards.write(samplesDf, dir, numTasks = 1)
    val census = spark.read.format("tar").load(dir).select("key", "ext", "size")
    assert(census.count() == samples.size)
    assert(!census.queryExecution.executedPlan.toString.contains("payload"))
  }

  test("samplesPerShard rolls shards without splitting a sample") {
    val dir = tmp("tar-roll")
    TarShards.write(samplesDf, dir, samplesPerShard = 2, numTasks = 1)
    val byShard = spark.read.format("tar").load(dir)
      .groupBy("shard").agg(collect_set("key").as("keys"))
      .as[(String, Seq[String])].collect()
    assert(byShard.length == 2) // 3 keys at 2 per shard
    // no key appears in two shards
    val all = byShard.flatMap(_._2)
    assert(all.length == all.distinct.length && all.toSet == Set("s/000", "s/001", "s/002"))
  }

  test("gzip and zstd shards decompress transparently") {
    for (comp <- Seq("gzip", "zstd")) {
      val dir = tmp(s"tar-$comp")
      TarShards.write(samplesDf, dir, compression = comp, numTasks = 1)
      val files = new java.io.File(dir).list().toSeq
        .filterNot(f => f.startsWith(".") || f.startsWith("_"))
      assert(files.forall(_.endsWith(if (comp == "gzip") ".tar.gz" else ".tar.zst")), files)
      assert(spark.read.format("tar").load(dir).count() == samples.size)
    }
  }

  test("GNU long-name members round trip (name > 100 bytes)") {
    val longKey = "deep/" + ("x" * 120)
    val dir = tmp("tar-long")
    TarShards.write(Seq((longKey, "txt", "payload")).toDF("key", "ext", "text")
      .withColumn("payload", col("text").cast("binary")), dir, numTasks = 1)
    val row = spark.read.format("tar").load(dir)
      .select("name", "key", "ext").as[(String, String, String)].collect().toSeq
    assert(row == Seq((s"$longKey.txt", longKey, "txt")))
  }

  test("pax 'x' path override applies to the following member") {
    // hand-build: pax header whose records set path, then a short-named member
    val paxRec = {
      val v = "over/ridden.txt"
      val body = s"xx comment=ignored\nyy path=$v\n"
      // compute the self-referential lengths
      def rec(k: String, v: String): String = {
        var len = k.length + v.length + 3 // "len k=v\n" minus the len digits
        var digits = len.toString.length
        while ((len + digits).toString.length != digits) digits += 1
        s"${len + digits} $k=$v\n"
      }
      (rec("comment", "ignored") + rec("path", v)).getBytes(UTF_8)
    }
    val bos = new ByteArrayOutputStream()
    // pax typeflag 'x' header via the writer's header builder is private —
    // build it by patching a regular entry's typeflag and re-checksumming
    val paxEntry = entryBytes("PaxHeaders.0/x", paxRec)
    paxEntry(156) = 'x'.toByte
    rechecksum(paxEntry)
    bos.write(paxEntry)
    bos.write(entryBytes("short.txt", "data".getBytes(UTF_8)))
    bos.write(new Array[Byte](1024))
    val f = new java.io.File(tmp("tar-pax"), "p.tar")
    val out = new FileOutputStream(f); out.write(bos.toByteArray); out.close()
    val rows = spark.read.format("tar").load(f.getAbsolutePath)
      .select("name", "key", "ext").as[(String, String, String)].collect().toSeq
    assert(rows == Seq(("over/ridden.txt", "over/ridden", "txt")))
  }

  private def rechecksum(hdr: Array[Byte]): Unit = {
    java.util.Arrays.fill(hdr, 148, 156, ' '.toByte)
    var sum = 0L
    for (i <- 0 until 512) sum += hdr(i) & 0xFF
    val cs = java.lang.Long.toOctalString(sum)
    System.arraycopy((("0" * (6 - cs.length)) + cs).getBytes(ISO_8859_1), 0, hdr, 148, 6)
    hdr(154) = 0; hdr(155) = ' '.toByte
  }

  test("directory members are skipped; lone zero block at EOF accepted") {
    val dirEntry = entryBytes("somedir/", Array.emptyByteArray)
    dirEntry(156) = '5'.toByte
    rechecksum(dirEntry)
    val bos = new ByteArrayOutputStream()
    bos.write(dirEntry)
    bos.write(entryBytes("somedir/a.txt", "hi".getBytes(UTF_8)))
    bos.write(new Array[Byte](512)) // ONE zero block, then EOF
    val f = new java.io.File(tmp("tar-dir"), "d.tar")
    val out = new FileOutputStream(f); out.write(bos.toByteArray); out.close()
    val rows = spark.read.format("tar").load(f.getAbsolutePath)
      .select("name").as[String].collect().toSeq
    assert(rows == Seq("somedir/a.txt"))
  }

  test("GNU base-256 size field parses") {
    val e = entryBytes("b.bin", "12345678".getBytes(UTF_8))
    e(124) = 0x80.toByte // base-256 marker; bytes 125..135 big-endian
    for (i <- 125 until 135) e(i) = 0
    e(135) = 8
    rechecksum(e)
    val bos = new ByteArrayOutputStream()
    bos.write(e); bos.write(new Array[Byte](1024))
    val f = new java.io.File(tmp("tar-b256"), "b.tar")
    val out = new FileOutputStream(f); out.write(bos.toByteArray); out.close()
    val rows = spark.read.format("tar").load(f.getAbsolutePath)
      .select(col("size"), col("payload").cast("string"))
      .as[(Long, String)].collect().toSeq
    assert(rows == Seq((8L, "12345678")))
  }

  test("corrupt checksum fails loudly") {
    val e = entryBytes("c.txt", "x".getBytes(UTF_8))
    e(148) = '7'.toByte // clobber a checksum digit
    val bos = new ByteArrayOutputStream()
    bos.write(e); bos.write(new Array[Byte](1024))
    val f = new java.io.File(tmp("tar-bad"), "bad.tar")
    val out = new FileOutputStream(f); out.write(bos.toByteArray); out.close()
    val ex = intercept[Exception] {
      spark.read.format("tar").load(f.getAbsolutePath).count()
    }
    assert(exMessageChain(ex).exists(_.contains("checksum")), ex.toString)
  }

  test("duplicate ext within a sample fails loudly in grouped mode") {
    val bytes = archive(("k.txt", "a".getBytes(UTF_8)), ("k.txt", "b".getBytes(UTF_8)))
    val f = new java.io.File(tmp("tar-dup"), "dup.tar")
    val out = new FileOutputStream(f); out.write(bytes); out.close()
    val ex = intercept[Exception] {
      spark.read.format("tar").option("group", "true").load(f.getAbsolutePath).count()
    }
    assert(exMessageChain(ex).exists(_.contains("duplicate member ext")), ex.toString)
  }

  private def exMessageChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).toSeq

  test("splitKeyExt: first dot of the basename, directories keep dots") {
    assert(TarSource.splitKeyExt("a/b.seg.png") == ("a/b", "seg.png"))
    assert(TarSource.splitKeyExt("v1.2/c.txt") == ("v1.2/c", "txt"))
    assert(TarSource.splitKeyExt("noext") == ("noext", ""))
    assert(TarSource.splitKeyExt("d/noext") == ("d/noext", ""))
  }

  test("members() explodes a column-held archive in order") {
    val bytes = archive(
      ("k1.txt", "one".getBytes(UTF_8)), ("k1.json", "{}".getBytes(UTF_8)),
      ("k2.txt", "two".getBytes(UTF_8)))
    val df = Seq((7L, bytes)).toDF("doc_id", "payload")
    val rows = TarShards.members(df, "doc_id", "payload")
      .collect().map(m => (m.doc_id, m.member_ix, m.key, m.ext, new String(m.payload, UTF_8)))
    assert(rows.toSeq == Seq((7L, 0, "k1", "txt", "one"), (7L, 1, "k1", "json", "{}"),
      (7L, 2, "k2", "txt", "two")))
  }

  test("one input partition per shard file") {
    val dir = tmp("tar-parts")
    TarShards.write(samplesDf, dir, samplesPerShard = 1, numTasks = 1)
    val n = new java.io.File(dir).list().count(_.endsWith(".tar"))
    assert(n == 3)
    val scanned = spark.read.format("tar").load(dir).rdd.getNumPartitions
    assert(scanned == n)
  }

  test("WebDataset TOML input: samples become records, missing members yield ''") {
    import graft.topology.{BuiltinComponents, Topology}
    val dir = tmp("tar-toml")
    TarShards.write(samplesDf, dir, numTasks = 1)
    val toml =
      s"""[fields]
         |names = ["key", "txt", "json"]
         |[input]
         |name = "WebDataset"
         |  [input.config]
         |  Path = "$dir"
         |[output]
         |name = "Recorder"
         |fields = ["key", "txt", "json"]
         |""".stripMargin
    Topology.compileToml(spark, toml).run()
    val got = BuiltinComponents.Recorder.last
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(got == Seq(
      ("s/000", "alpha doc", """{"lang":"en"}"""),
      ("s/001", "beta doc", """{"lang":"de"}"""),
      ("s/002", "gamma", ""))) // no json member: the record model's empty
  }

  test("TarReader rejects a lone zero block mid-archive") {
    val bos = new ByteArrayOutputStream()
    bos.write(new Array[Byte](512))
    bos.write(entryBytes("after.txt", "x".getBytes(UTF_8)))
    val tar = new TarReader(new java.io.ByteArrayInputStream(bos.toByteArray), "mem")
    val ex = intercept[IllegalArgumentException](tar.next())
    assert(ex.getMessage.contains("lone zero block"))
  }
}
