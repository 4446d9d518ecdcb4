package graft

import java.nio.file.{Files, Paths}

/** Write `.explain("formatted")` of named SparkEntry queries to files —
  * the plans/r19 evidence artifacts. Note for lifecycle rows: building
  * the DataFrame executes their store-mutation side effects first; the
  * dumped plan is the final readback frame, and the stage/job evidence
  * lives in the ProfMany output instead.
  * Usage: Test/runMain graft.PlanDump <outDir> q_a q_b ... [sfDir]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val rest = args.tail
    val (qs, sfDir) =
      if (rest.nonEmpty && rest.last.startsWith("/")) (rest.init.toSeq, rest.last)
      else (rest.toSeq, "/root/testdata/sf0.1")
    val spark = graft.core.Graft.localSession("plan-dump")
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    for (q <- qs) {
      try {
        val df = SparkEntry.queries(q)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$q.txt"), plan)
        println(s"[plandump] wrote $outDir/$q.txt (${plan.length} chars)")
      } catch { case e: Throwable =>
        println(s"[plandump] FAILED $q: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
