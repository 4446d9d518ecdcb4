package graft

import org.apache.spark.sql.functions._

import graft.core.Graft
import graft.llm.Dedup

/** A/B the adaptive input fan-out (Graft.fanOut) on representative
  * map-heavy corpus queries: same operator, same data, with and without
  * the conditional round-robin spread of the single-file scan.
  */
object ProfFanOut {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("prof-fanout")
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Graft.table(spark, d, "documents")
    val fdocs = Graft.fanOut(docs)
    println(s"[fanout] docs partitions=${docs.rdd.getNumPartitions} fanned=${fdocs.rdd.getNumPartitions}")

    def time(tag: String, reps: Int = 3)(body: => Long): Unit = {
      for (i <- 1 to reps) {
        val t0 = System.nanoTime()
        val n = body
        println(f"[fanout] $tag%-28s run$i rows=$n%7d wall=${(System.nanoTime() - t0) / 1e9}%6.2f s")
      }
    }

    def cdc(in: org.apache.spark.sql.DataFrame) =
      Dedup.firstSpanOccurrence(Dedup.cdcChunks(in, "doc_id", "text", meanLen = 16), "doc_id")
    def mh(in: org.apache.spark.sql.DataFrame) =
      Dedup.minhashDedupVerified(in, "doc_id", "text", threshold = 0.7)
    def kw(in: org.apache.spark.sql.DataFrame) =
      graft.llm.Keywords.topTerms(in, "doc_id", "text", maxDocFrac = 0.9)

    // warm both shapes once
    cdc(docs).count(); cdc(fdocs).count()
    time("cdc plain")(cdc(docs).count())
    time("cdc fanout")(cdc(fdocs).count())
    mh(docs).count(); mh(fdocs).count()
    time("minhash plain")(mh(docs).count())
    time("minhash fanout")(mh(fdocs).count())
    kw(docs).count(); kw(fdocs).count()
    time("keywords plain")(kw(docs).count())
    time("keywords fanout")(kw(fdocs).count())
    spark.stop()
  }
}
