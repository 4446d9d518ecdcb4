package graft
import graft.core.Graft
import org.apache.spark.sql.functions._
object ProfPlan {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("profplan")
    graft.sources.ZstdCodec.register(spark)
    val inDir = new java.io.File(sys.props("java.io.tmpdir"), "graft-bench-pipeline-200000/in")
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
    val out = filtered.select(projCols :+ col("value").as("_record"): _*)
      .select(col("_record").as("value"))
    println(out.queryExecution.optimizedPlan.treeString)
  }
}
