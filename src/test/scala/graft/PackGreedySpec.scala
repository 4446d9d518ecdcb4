package graft

import org.apache.spark.sql.functions._

import graft.llm.Pack

/** [[Pack.packGreedy]] — no-split SFT-style packing: greedy fill in order,
  * new sequence exactly on would-overflow, oversize docs get their own
  * sequence, shards independent, and the one-exchange streaming plan.
  */
class PackGreedySpec extends SparkSpec {

  private def pack(rows: Seq[(Long, Long)], budget: Long,
      shardOf: Long => Long = _ => 0L) = {
    import spark.implicits._
    val df = rows.toDF("doc_id", "sz")
    Pack.packGreedy(df, col("doc_id"), col("sz"), budget,
        pmod(col("doc_id"), lit(shardOf(Long.MaxValue) + 1)))
      .select("doc_id", "shard", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
  }

  test("greedy fill: join while it fits, open on would-overflow, never split") {
    // budget 10: [4, 5] fit (off 0, 4); 3 overflows -> seq 1; [3, 7] fit
    val out = pack(Seq((1L, 4L), (2L, 5L), (3L, 3L), (4L, 7L)), 10)
    assert(out == Seq((1L, 0L, 0L, 0L), (2L, 0L, 0L, 4L),
      (3L, 0L, 1L, 0L), (4L, 0L, 1L, 3L)))
  }

  test("an oversize document gets its own sequence; the next doc opens " +
      "a fresh one") {
    val out = pack(Seq((1L, 2L), (2L, 99L), (3L, 2L)), 10)
    assert(out == Seq((1L, 0L, 0L, 0L), (2L, 0L, 1L, 0L), (3L, 0L, 2L, 0L)))
  }

  test("shards pack independently with their own sequence numbering") {
    import spark.implicits._
    val df = Seq((1L, 6L), (2L, 6L), (3L, 6L), (4L, 6L)).toDF("doc_id", "sz")
    val out = Pack.packGreedy(df, col("doc_id"), col("sz"), 10,
        pmod(col("doc_id"), lit(2)))
      .select("doc_id", "shard", "seq_id", "seq_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    // shard 1: docs 1,3; shard 0: docs 2,4 — each pair overflows a 10-budget
    assert(out == Seq((1L, 1L, 0L, 0L), (2L, 0L, 0L, 0L),
      (3L, 1L, 1L, 0L), (4L, 0L, 1L, 0L)))
  }

  test("agreement with an in-memory reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val rows = (1L to 300L).map(i => (i, 1L + rnd.nextInt(40)))
    val budget = 64L
    val df = rows.toDF("doc_id", "sz")
    val got = Pack.packGreedy(df, col("doc_id"), col("sz"), budget,
        pmod(col("doc_id"), lit(5)))
      .select("doc_id", "seq_id", "seq_offset").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // reference: plain fold per shard in doc order
    rows.groupBy(_._1 % 5).foreach { case (_, docs) =>
      var fill = 0L; var seq = -1L
      docs.sortBy(_._1).foreach { case (id, sz) =>
        if (seq < 0 || fill + sz > budget) { seq += 1; fill = 0 }
        assert(got(id) == (seq, fill), s"doc $id")
        fill += sz
      }
    }
  }

  test("plan shape: one exchange, no window buffer — a streaming " +
      "per-partition walk") {
    import spark.implicits._
    val df = Seq((1L, 3L)).toDF("doc_id", "sz")
    val p = Pack.packGreedy(df, col("doc_id"), col("sz"), 10, lit(0))
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(p).size
    assert(exchanges == 1, s"expected 1 exchange:\n$p")
    assert(!p.contains("Window"), s"no window expected:\n$p")
  }
}
