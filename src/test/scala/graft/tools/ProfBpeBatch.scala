package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._

/** Dev probe: Spark-job count + wall time of sequential vs batched BPE
  * training on the sf0.001 documents table.
  * Run: sbt "Test/runMain graft.tools.ProfBpeBatch [sfDir] [steps]"
  */
object ProfBpeBatch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val steps = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = graft.core.Graft.localSession("prof-bpe-batch")
    val docs = graft.core.Graft.table(spark, sfDir, "documents").select("text")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    })
    for (bs <- Seq(1, 4, 8)) {
      Thread.sleep(500); jobs.set(0)
      val t0 = System.nanoTime()
      val (m, _) = graft.llm.Bpe.train(docs, col("text"), steps, batchSize = bs)
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let listener events drain
      println(f"PROF_BPE batchSize=$bs%2d steps=$steps rules=${m.size} " +
        f"jobs=${jobs.get()}%3d wall=$sec%.2f s")
    }
    spark.stop()
  }
}
