package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Micro-attribution for the ~0.5 s gap between the topology pipeline run
  * and the bare read-filter-write floor: the lazy-field existence guard's
  * length(value) full-line scan, and the three CollectMetrics (observe)
  * nodes in the compiled plan.
  */
object ProfPipeline2 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Graft.localSession("pipeline-probe2")
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.ZstdCodec.register(spark)
    Bench.pipelineThroughput(spark) // ensure cached input + warm codegen

    val records = 500000
    val base = new java.io.File(sys.props("java.io.tmpdir"), s"graft-bench-pipeline-$records")
    val inDir = new java.io.File(base, "in").getAbsolutePath

    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val raw = spark.read.text(inDir)
    val bare = substring_index(substring_index(col("value"), ",", 2), ",", -1)
    val exists = length(substring_index(col("value"), ",", 1)) < length(col("value"))
    val guarded = when(exists, bare).otherwise(lit(""))

    for (_ <- 1 to 2) {
      time("filter bare expr + count")(raw.filter(bare =!= "3").count())
      time("filter guarded expr + count")(raw.filter(guarded =!= "3").count())
      val o1 = new Observation(); val o2 = new Observation(); val o3 = new Observation()
      time("guarded + 3 observes + count")(
        raw.observe(o1, count(lit(1)).as("a"))
          .filter(guarded =!= "3")
          .observe(o2, count(lit(1)).as("b"))
          .observe(o3, count(lit(1)).as("c"))
          .count())
    }
    // write path with observes, mirroring the compiled topology shape
    for (i <- 1 to 2) {
      val o1 = new Observation(); val o2 = new Observation(); val o3 = new Observation()
      val out = new java.io.File(base, s"probe2-$i").getAbsolutePath
      time(s"guarded+observes+write $i")(
        raw.observe(o1, count(lit(1)).as("a"))
          .filter(guarded =!= "3")
          .observe(o2, count(lit(1)).as("b"))
          .select(col("value"))
          .observe(o3, count(lit(1)).as("c"))
          .write.mode("overwrite")
          .option("compression", classOf[graft.sources.ZstdCodec].getName).text(out))
    }
    spark.stop()
  }
}
