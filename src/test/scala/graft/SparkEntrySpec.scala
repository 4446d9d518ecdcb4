package graft

import org.scalatest.funsuite.AnyFunSuite

/** The queries/oracles contract the driver's correctness harness relies
  * on: r7's run silently produced no row for one query, so the key-set
  * equality is pinned HERE, where drift fails the build instead of
  * quietly shrinking correctness coverage.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q == o,
      s"queries without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}; " +
        s"oracles without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("every lifecycle-tier member names a real query") {
    val missing = SparkEntry.lifecycleQueries -- SparkEntry.queries.keySet
    assert(missing.isEmpty,
      s"lifecycleQueries naming no query (renamed or removed?): " +
        s"${missing.toSeq.sorted.mkString(", ")}")
  }

  test("query names are unique, non-empty, and JSON-safe") {
    assert(SparkEntry.queries.nonEmpty)
    SparkEntry.queries.keys.foreach { k =>
      assert(k.nonEmpty && !k.exists(c => c < ' ' || c == '"' || c == '\\'), s"bad name: $k")
    }
  }
}
