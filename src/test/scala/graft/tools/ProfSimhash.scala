package graft

import graft.core.Graft
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** Probe: where does q_dedup_simhash's time go, and which
  * (nBits, maxHamming, pieces) config is cheapest with full recall?
  *
  * For each config prints: distinct signatures, bucket-collision rows
  * (the join's real cost), post-hamming candidate pairs, verified-pair
  * wall time, and the verified output vs the shipped config's output
  * (recall check: any config whose verified set equals the shipped one
  * at the driver's sf0.01 gate is oracle-safe).
  */
object ProfSimhash {
  def main(args: Array[String]): Unit = {
    val spark = Graft.localSession("simhash-prof")
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Graft.table(spark, d, "documents").cache()
    println(s"docs=${docs.count()} dir=$d")
    val sig = Dedup.simhash(docs, "doc_id", "text")
    println(s"distinct 32-bit sigs=${sig.select("simhash").distinct().count()}")
    val sig64 = Dedup.simhash(docs, "doc_id", "text", nBits = 64)
    println(s"distinct 64-bit sigs=${sig64.select("simhash").distinct().count()}")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // shipped config's verified output = ground truth (hash-matches oracle)
    val (truth, _) = time {
      Dedup.simhashPairsVerified(docs, "doc_id", "text", threshold = 0.7, maxHamming = 4)
        .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    println(s"truth pairs (32/h4/p1 verified) = ${truth.size}")

    for ((nb, h, p) <- Seq((32, 4, 1), (32, 4, 2), (32, 4, 3), (32, 3, 1), (32, 3, 2),
        (64, 8, 1), (64, 8, 2), (64, 10, 2), (64, 12, 2))) {
      val (cand, tCand) = time {
        Dedup.simhashPairs(docs, "doc_id", "text", nBits = nb, maxHamming = h, pieces = p)
          .count()
      }
      val (ver, tVer) = time {
        Dedup.simhashPairsVerified(docs, "doc_id", "text", threshold = 0.7,
            nBits = nb, maxHamming = h, pieces = p)
          .select("idA", "idB").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      }
      val missed = truth.diff(ver).size
      println(f"nBits=$nb%2d h=$h%2d pieces=$p  cand=$cand%9d  tCand=$tCand%6.2fs  " +
        f"tVerified=$tVer%6.2fs  out=${ver.size}%5d  missedVsTruth=$missed%d")
    }
  }
}
