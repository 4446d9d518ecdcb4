package graft

import org.apache.spark.sql.functions._

import graft.functions.{ArrayDot, VectorFunctions}

/** Native ArrayDot Catalyst expression: codegen + interpreted parity,
  * float/double/mixed element types, null semantics.
  */
class ArrayDotSpec extends SparkSpec {

  test("dot of float arrays matches the HOF formulation bit-for-bit") {
    import spark.implicits._
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.1f, -0.2f), Array(0.3f, 0.4f)),
      (Array.empty[Float], Array.empty[Float]),
    ).toDF("a", "b")
    val rows = df.select(
      ArrayDot(col("a"), col("b")).as("native"),
      VectorFunctions.dot(col("a"), col("b")).as("hof")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(rows(0).getDouble(0) == 32.0)
    assert(rows(2).getDouble(0) == 0.0)
  }

  test("mixed float/double operands promote to double") {
    val df = spark.sql("SELECT array(1.0D, 2.0D) a, array(CAST(3 AS FLOAT), CAST(4 AS FLOAT)) b")
    assert(df.select(ArrayDot(col("a"), col("b"))).head().getDouble(0) == 11.0)
  }

  test("null array and null element yield null") {
    val df = spark.sql(
      """SELECT CAST(NULL AS ARRAY<DOUBLE>) a, array(1.0D) b
         UNION ALL SELECT array(1.0D, NULL), array(1.0D, 2.0D)""")
    val out = df.select(ArrayDot(col("a"), col("b")).as("d")).collect()
    assert(out.forall(_.isNullAt(0)))
  }

  test("length-mismatched arrays yield null (not a partial dot)") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(1.0, 2.0))).toDF("a", "b")
    assert(df.select(ArrayDot(col("a"), col("b"))).head().isNullAt(0))
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      assert(df.select(ArrayDot(col("a"), col("b"))).head().isNullAt(0))
    }
  }

  test("interpreted eval (no codegen) agrees with codegen") {
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      import spark.implicits._
      val df = Seq((Array(1.5, 2.5), Array(2.0, 4.0))).toDF("a", "b")
      assert(df.select(ArrayDot(col("a"), col("b"))).head().getDouble(0) == 13.0)
    }
  }

  test("rejects non-numeric-array operands at analysis") {
    val df = spark.sql("SELECT array('x') a, array(1.0D) b")
    assertThrows[org.apache.spark.sql.AnalysisException] {
      df.select(ArrayDot(col("a"), col("b"))).collect()
    }
  }

}
