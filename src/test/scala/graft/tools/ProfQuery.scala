package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Stage-level attribution for one SparkEntry query: total wall vs the sum
  * and distribution of stage times (task-time and wall), to separate
  * data-bound stages from scheduling/planning overhead.
  * Usage: Test/runMain graft.ProfQuery q_dedup_simhash [sfDir]
  */
object ProfQuery {
  def main(args: Array[String]): Unit = {
    val qname = args.headOption.getOrElse("q_dedup_simhash")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.core.Graft.localSession("query-probe")
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val wall = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), wall,
          i.taskMetrics.executorRunTime, i.numTasks))
      }
    })

    def run(tag: String): Unit = {
      stages.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(qname)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      println(f"[probe] $tag $qname rows=$n wall=$wall%.2f s stages=${stages.size} " +
        f"stageWallSum=${stages.map(_._3).sum / 1e3}%.2f s taskTimeSum=${stages.map(_._4).sum / 1e3}%.2f s")
      stages.sortBy(-_._3).take(12).foreach { case (id, name, w, task, nt) =>
        println(f"[probe]   stage $id%-4d ${w / 1e3}%6.2f s wall ${task / 1e3}%7.2f s task n=$nt%-3d $name")
      }
    }
    run("cold")
    run("steady")
    spark.stop()
  }
}
