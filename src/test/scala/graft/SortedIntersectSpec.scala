package graft

import org.apache.spark.sql.functions._

import graft.functions.SortedIntersectCount

/** Native SortedIntersectCount: parity with size(array_intersect) on
  * sorted-distinct inputs, codegen + interpreted, null semantics.
  */
class SortedIntersectSpec extends SparkSpec {

  test("matches size(array_intersect) on random sorted-distinct long arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val rows = (0 until 200).map { _ =>
      def arr() = Array.fill(rnd.nextInt(60))(rnd.nextInt(80).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
    val out = df.select(
      SortedIntersectCount(col("a"), col("b")).as("native"),
      size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
    out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // interpreted path agrees
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val out2 = df.select(
        SortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin")).collect()
      out2.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    }
  }

  test("empty and null arrays") {
    val df = spark.sql(
      """SELECT array(1L,2L,3L) a, CAST(array() AS ARRAY<BIGINT>) b
         UNION ALL SELECT CAST(NULL AS ARRAY<BIGINT>), array(1L)""")
    val out = df.select(SortedIntersectCount(col("a"), col("b")).as("c")).collect()
    assert(out.exists(r => !r.isNullAt(0) && r.getInt(0) == 0)) // empty → 0
    assert(out.exists(_.isNullAt(0)))                           // null → null
  }

  test("rejects non-long-array operands at analysis") {
    val df = spark.sql("SELECT array('x') a, array(1L) b")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(SortedIntersectCount(col("a"), col("b"))).collect()
    }
  }

}
