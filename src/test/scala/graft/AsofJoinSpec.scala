package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

class AsofJoinSpec extends SparkSpec {

  private def fixtures = {
    import spark.implicits._
    val trades = Seq( // (id, key, ts)
      (1L, "a", 5L), (2L, "a", 10L), (3L, "a", 2L), (4L, "b", 7L), (5L, "c", 1L),
    ).toDF("id", "k", "ts")
    val quotes = Seq( // (key, ts, px)
      ("a", 3L, 1.0), ("a", 5L, 2.0), ("a", 9L, 3.0), ("b", 8L, 9.0),
    ).toDF("k", "ts", "px")
    (trades, quotes)
  }

  test("backward asof: latest right ts <= left ts per key; no match -> null") {
    val (trades, quotes) = fixtures
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "ts", Seq("px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out == Map(
      1L -> Some(2.0), // equal-ts quote (5) matches inclusively
      2L -> Some(3.0), // latest of 3,5,9
      3L -> None,      // before first quote
      4L -> None,      // b's only quote is later (8 > 7)
      5L -> None))     // key with no quotes at all
  }

  test("forward asof: earliest right ts >= left ts") {
    val (trades, quotes) = fixtures
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "ts", Seq("px"), forward = true)
      .collect().map(r => r.getLong(0) -> Option(r.get(3))).toMap
    assert(out == Map(
      1L -> Some(2.0), // inclusive at ts 5
      2L -> None,      // nothing at/after 10
      3L -> Some(1.0), // first at/after 2 is ts 3
      4L -> Some(9.0),
      5L -> None))
  }

  test("every left row survives and left columns pass through") {
    val (trades, quotes) = fixtures
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "ts", Seq("px"))
    assert(out.count() == 5)
    assert(out.columns.toSeq == Seq("id", "k", "ts", "px"))
  }

  test("plan: one exchange per side on the key, no broadcast of the big side") {
    val (trades, quotes) = fixtures
    val out = AsofJoin.asof(trades, quotes, Seq("k"), "ts", Seq("px"))
    val plan = out.queryExecution.executedPlan.toString
    // union-and-carry: a single hashpartitioning(k) exchange feeds the
    // window — no CartesianProduct / BroadcastNestedLoopJoin blowup
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoop"), plan)
    assert(plan.contains("Window"), plan)
  }
}
