package graft
import graft.core.Graft
import graft.topology._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Observation
object ProfPipeline {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(s"PROF $label: ${(System.nanoTime() - t0) / 1e9}s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("profp")
    graft.sources.ZstdCodec.register(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.Bench.pipelineThroughput(spark, 200000)
    val inDir = new java.io.File(sys.props("java.io.tmpdir"), "graft-bench-pipeline-200000/in")
    def base = {
      val df = spark.read.text(inDir.getAbsolutePath)
      val kind = substring_index(substring_index(col("value"), ",", 2), ",", -1)
      df.filter(!(kind <=> lit("3")))
    }
    time("manual-zstd") {
      base.write.mode("overwrite")
        .option("compression", classOf[graft.sources.ZstdCodec].getName).text("/tmp/pp1")
    }
    time("manual-zstd-2obs") {
      val o1 = new Observation(); val o2 = new Observation()
      val df = spark.read.text(inDir.getAbsolutePath).observe(o1, count(lit(1)).as("in"))
      val kind = substring_index(substring_index(col("value"), ",", 2), ",", -1)
      df.filter(!(kind <=> lit("3"))).observe(o2, count(lit(1)).as("out"))
        .write.mode("overwrite")
        .option("compression", classOf[graft.sources.ZstdCodec].getName).text("/tmp/pp2")
    }
    time("manual-virtualfields") {
      // full topology-style: 10 virtual fields via withColumns, then select _record
      val raw = spark.read.text(inDir.getAbsolutePath)
      val fields = Seq("id", "kind") ++ (0 until 8).map(i => s"f$i")
      val nSeps = length(col("value")) - length(translate(col("value"), ",", ""))
      val vf = fields.zipWithIndex.map { case (f, i) =>
        val lf = substring_index(substring_index(col("value"), ",", i + 1), ",", -1)
        f -> (if (i == 0) lf else when(nSeps >= i, lf).otherwise(lit("")))
      }
      val df = raw.withColumns(vf.toMap)
      val filtered = df.filter(!(col("kind") <=> lit("3")))
      val projCols = fields.map(f => coalesce(col(f).cast("string"), lit("")).as(f))
      filtered.select(projCols :+ col("value").as("_record"): _*)
        .select(col("_record").as("value"))
        .write.mode("overwrite")
        .option("compression", classOf[graft.sources.ZstdCodec].getName).text("/tmp/pp3")
    }
    time("topology-again") { println(graft.Bench.pipelineThroughput(spark, 200000)) }
    spark.stop()
  }
}
