package graft

import graft.core.Graft

/** Ad-hoc timing scratchpad (not part of the library surface). */
object Scratch {
  def time(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(s"SCRATCH $label: ${(System.nanoTime() - t0) / 1e9}s rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("scratch")
    val sf = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    for (i <- 1 to 2; q <- args) {
      time(s"$q-$i") { SparkEntry.queries(q)(spark, sf).count() }
    }
    spark.stop()
  }
}
