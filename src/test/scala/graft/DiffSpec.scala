package graft

import org.apache.spark.sql.functions._

import graft.llm.Diff

class DiffSpec extends SparkSpec {

  test("corpusDiff labels added/removed/changed/unchanged; null content is null-safe") {
    import spark.implicits._
    val old = Seq(
      (1L, "same"), (2L, "will change"), (3L, "gone"),
      (4L, null.asInstanceOf[String]), (5L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val cur = Seq(
      (1L, "same"), (2L, "changed!"), (6L, "new"),
      (4L, null.asInstanceOf[String]), (5L, "now set"))
      .toDF("doc_id", "text")
    val got = Diff.corpusDiff(old, cur, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(
      1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      4L -> "unchanged", // null <=> null
      5L -> "changed",   // null -> value
      6L -> "added"))
    val sum = Diff.diffSummary(old, cur, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("unchanged" -> 2L, "changed" -> 2L, "removed" -> 1L, "added" -> 1L))
  }
}
