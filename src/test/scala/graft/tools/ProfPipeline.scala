package graft

import org.apache.spark.sql.functions._

/** Decompose the BENCH pipeline measurement (zstd CSV -> ClauseFilter ->
  * zstd CSV at 500k x 4.5 KB records): repeated full-topology runs vs a
  * bare read-count, a read-filter-count, and a hand-written
  * read-filter-write floor with no topology machinery — isolating compile
  * overhead, observation waits and the rename pass from actual IO/compute.
  */
object ProfPipeline {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("pipeline-probe")
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.ZstdCodec.register(spark)

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    // warm everything once
    Bench.pipelineThroughput(spark)
    for (i <- 1 to 3)
      println(s"[probe] full run $i: " + Bench.pipelineThroughput(spark))

    val records = 500000
    val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft-bench-pipeline-$records")
    val inDir = new java.io.File(base, "in").getAbsolutePath

    val raw = spark.read.text(inDir)
    time("read+count")(raw.count())
    val kind = substring_index(substring_index(col("value"), ",", 2), ",", -1)
    time("read+filter+count")(raw.filter(kind =!= "3").count())
    for (i <- 1 to 2) {
      val out = new java.io.File(base, s"floor-$i").getAbsolutePath
      time(s"floor read+filter+write $i")(
        raw.filter(kind =!= "3").write.mode("overwrite")
          .option("compression", classOf[graft.sources.ZstdCodec].getName).text(out))
    }
    // write with gzip-off (no codec) to see compression share
    val outPlain = new java.io.File(base, "floor-plain").getAbsolutePath
    time("floor write uncompressed")(
      raw.filter(kind =!= "3").write.mode("overwrite").text(outPlain))
    spark.stop()
  }
}
