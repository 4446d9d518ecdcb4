package graft
import graft.core.Graft
object Scratch {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(s"$label: ${(System.nanoTime() - t0) / 1e9}s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("scratch")
    // warm
    spark.range(1000000).selectExpr("sum(id)").collect()
    val plan = {
      import graft.topology._
      val inDir = new java.io.File(sys.props("java.io.tmpdir"), "graft-bench-pipeline-200000/in")
      val fields = Seq("id", "kind") ++ (0 until 8).map(i => s"f$i")
      val toml =
        s"""[fields]
           |names = [${fields.map(f => s""""$f"""").mkString(", ")}]
           |[input]
           |name = "List"
           |  [input.config]
           |  Files = ["$inDir"]
           |  MatchPath = ".*\\\\.zst"
           |[[filter]]
           |name = "ClauseFilter"
           |  [filter.config]
           |  Clause = "(not (kind 3))"
           |[output]
           |name = "FileWriter"
           |fields = ["kind"]
           |  [output.config]
           |  PathString = "/tmp/scratch-out/out-{{.Index}}-{{.UUID}}.csv.zst"
           |""".stripMargin
      val c = Topology.compileToml(spark, toml, env = Map.empty)
      println("=== PLAN ===")
      println(c.projected.queryExecution.executedPlan.toString.take(3000))
      time("pipeline run 1")(c.run())
      val c2 = Topology.compileToml(spark, toml, env = Map.empty)
      time("pipeline run 2")(c2.run())
    }
    spark.stop()
  }
}
