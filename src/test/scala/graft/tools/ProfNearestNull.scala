package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: NearestCells codegen on a provably non-nullable array child. */
object ProfNearestNull {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .appName("prof-nearest-null").getOrCreate()
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = spark.range(3)
      .select(array(lit(1.0f), lit(0.0f)).as("v")) // non-nullable, no null elems
    df.printSchema()
    val out = df.select(
      graft.functions.NearestCells(col("v"), cents, 1).as("cells")).collect()
    println("RESULT " + out.mkString(","))
    spark.stop()
  }
}
