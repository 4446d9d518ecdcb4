package graft

import org.apache.spark.sql.SparkSession

import graft.topology.{BuiltinComponents, Topology}

/** CLI entry point — the reference's MainCLI (baker_cli.go:29-103):
  *
  *   graft.Main topology.toml     run a topology
  *   graft.Main -help             print component docs (markdown)
  *   graft.Main -help NAME        docs for one component
  *
  * Run under spark-submit on a cluster, or standalone (builds a local
  * session). Prints a final stats summary line fashioned after the
  * reference's StatsDumper (stats.go:131-139).
  */
object Main {
  def main(args: Array[String]): Unit = args.toList match {
    case "-help" :: Nil =>
      println(BuiltinComponents.all.renderHelp)
    case "-help" :: name :: Nil =>
      val c = BuiltinComponents.all
      val one = (c.inputs ++ c.filters ++ c.outputs ++ c.uploads)
        .filter(_.name.equalsIgnoreCase(name))
      if (one.isEmpty) { System.err.println(s"unknown component: $name"); sys.exit(1) }
      one.foreach { d =>
        println(s"### ${d.name}\n\n${d.help}\n")
        d.keys.foreach(k => println(
          s"- ${k.name}${if (k.required) " (required)" else ""}: ${k.help}" +
            k.default.map(v => s" [default: $v]").getOrElse("")))
      }
    case tomlPath :: Nil =>
      val spark = core.Graft.configure(
        SparkSession.builder().appName(s"graft ${new java.io.File(tomlPath).getName}")
          .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]")))
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      new graft.metrics.StatsDumper().attach(spark)
      try {
        val t0 = System.nanoTime()
        val components = graft.streaming.Streaming.componentsWithStreaming
        val compiled = Topology.compile(spark,
          Topology.configFromToml(graft.topology.Toml.parseFile(tomlPath)), components)
        if (compiled.projected.isStreaming) {
          // daemon topology (reference: api.go:58-66): run until signalled
          val ckpt = sys.env.getOrElse("GRAFT_CHECKPOINT_DIR",
            java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
          val trigger = sys.env.getOrElse("GRAFT_TRIGGER_MS", "60000").toLong
          val daemon = graft.streaming.Streaming.start(compiled, ckpt, trigger)
          sys.addShutdownHook {
            println(s"Stats: daemon stopping, total[w:${daemon.recordCount()}]")
          }
          daemon.awaitTermination()
        } else {
          val (result, metrics) = compiled.run()
          val secs = (System.nanoTime() - t0) / 1e9
          val read = metrics.getOrElse("input_records", -1L)
          val written = metrics.getOrElse("output_records", result.rows)
          println(f"Stats: total[w:$written,r:$read] speed[$secs%.1fs] " +
            s"files[${result.paths.size}]")
        }
      } finally spark.stop()
    case _ =>
      System.err.println("usage: graft.Main <topology.toml> | -help [component]")
      sys.exit(1)
  }
}
