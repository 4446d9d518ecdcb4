package graft

import org.apache.spark.sql.functions._

import graft.sources.TarShards

/** Randomized writer↔reader round trips for the tar source: adversarial
  * keys (nested dirs, unicode, >100-byte names forcing GNU 'L' members,
  * dots in directories), random binary payloads (incl. empty and
  * 512-boundary sizes), random shard sizing and compression — byte-exact
  * recovery of every member under a fixed seed.
  */
class TarPropertySpec extends SparkSpec {
  import spark.implicits._

  test("random corpus round-trips byte-exactly through shards") {
    val rnd = new scala.util.Random(1311)
    def randKey(i: Int): String = {
      val depth = rnd.nextInt(3)
      val dirs = Seq.fill(depth)(Seq("d1", "v1.2", "日本", "x")(rnd.nextInt(4)))
      val base = rnd.nextInt(4) match {
        case 0 => f"sample$i%06d"
        case 1 => s"long-${"k" * (90 + rnd.nextInt(60))}-$i" // often > 100 bytes
        case 2 => s"uni-動画-$i"
        case _ => s"k$i"
      }
      (dirs :+ base).mkString("/")
    }
    val exts = Seq("txt", "json", "seg.png", "bin")
    val samples = (0 until 60).map { i =>
      val key = randKey(i)
      val nMembers = 1 + rnd.nextInt(3)
      val memberExts = rnd.shuffle(exts).take(nMembers)
      key -> memberExts.map { e =>
        val size = rnd.nextInt(5) match {
          case 0 => 0            // empty member
          case 1 => 512          // exact block boundary
          case 2 => 511
          case _ => rnd.nextInt(3000)
        }
        val payload = new Array[Byte](size)
        rnd.nextBytes(payload)
        e -> payload
      }
    }
    val rows = samples.flatMap { case (k, ms) => ms.map { case (e, p) => (k, e, p) } }
    for (comp <- Seq("none", "gzip", "zstd")) {
      val dir = java.nio.file.Files.createTempDirectory(s"tar-prop-$comp").toFile
      dir.deleteOnExit()
      TarShards.write(rows.toDF("key", "ext", "payload"), dir.getAbsolutePath,
        samplesPerShard = 1 + rnd.nextInt(9), compression = comp, numTasks = 3)
      val back = spark.read.format("tar").load(dir.getAbsolutePath)
        .select(col("key"), col("ext"), md5(col("payload")),
          length(col("payload")).cast("long"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSet
      val expect = rows.map { case (k, e, p) =>
        (k, e, org.apache.commons.codec.digest.DigestUtils.md5Hex(p), p.length.toLong)
      }.toSet
      assert(back == expect, s"$comp: ${back.size} vs ${expect.size}; " +
        s"missing=${(expect -- back).take(3)}; extra=${(back -- expect).take(3)}")
      // grouped mode assembles exactly the same members per key
      val grouped = spark.read.format("tar").option("group", "true")
        .load(dir.getAbsolutePath)
        .select(col("key"), map_keys(col("files")))
        .as[(String, Seq[String])].collect()
        .map { case (k, es) => k -> es.sorted }.toMap
      val expectGrouped = samples.map { case (k, ms) => k -> ms.map(_._1).sorted }.toMap
      assert(grouped == expectGrouped)
    }
  }
}
