package graft

import java.io.File
import java.nio.file.Files

import graft.topology.{BuiltinComponents, Topology}

/** The SqlExpr / SqlWhere TOML filters: one SQL string in the config
  * compiles to the same Catalyst tree a Column program would build, with
  * the graft_* function library in scope; bad SQL fails at topology
  * compile time.
  */
class SqlFilterSpec extends SparkSpec {

  private def runToml(filters: String): Seq[org.apache.spark.sql.Row] = {
    val dir = Files.createTempDirectory("graft-sqlfilter").toFile
    val data = new File(dir, "in.csv")
    Files.write(data.toPath, java.util.List.of(
      "1;alpha beta gamma;4.5",
      "2;delta epsilon;2.0",
      "3;zeta eta theta iota;4.9"))
    val toml =
      s"""[csv]
         |field_separator = 59
         |[fields]
         |names = ["id", "text", "stars"]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$data"]
         |  MatchPath = ".*\\\\.csv"
         |$filters
         |[output]
         |name = "Recorder"
         |fields = ["id", "text", "stars"]
         |""".stripMargin
    Topology.compileToml(spark, toml).run()
    BuiltinComponents.Recorder.last
  }

  test("SqlWhere keeps records matching the predicate") {
    val rows = runToml(
      """[[filter]]
        |name = "SqlWhere"
        |  [filter.config]
        |  Where = "cast(stars as double) >= 4.0"""".stripMargin)
    assert(rows.map(_.getString(0)).sorted == Seq("1", "3"))
  }

  test("SqlExpr computes with builtin AND graft_* functions") {
    val rows = runToml(
      """[[filter]]
        |name = "SqlExpr"
        |  [filter.config]
        |  Expr = "concat(upper(id), ':', graft_token_count(text))"
        |  DstField = "text"""".stripMargin)
    assert(rows.map(_.getString(1)).sorted == Seq("1:3", "2:2", "3:4"))
  }

  test("filters chain: SqlExpr output feeds SqlWhere") {
    val rows = runToml(
      """[[filter]]
        |name = "SqlExpr"
        |  [filter.config]
        |  Expr = "graft_token_count(text)"
        |  DstField = "stars"
        |[[filter]]
        |name = "SqlWhere"
        |  [filter.config]
        |  Where = "cast(stars as int) >= 3"""".stripMargin)
    assert(rows.map(_.getString(0)).sorted == Seq("1", "3"))
  }

  test("bad SQL fails at topology compile time, not per record") {
    val e = intercept[Exception](runToml(
      """[[filter]]
        |name = "SqlWhere"
        |  [filter.config]
        |  Where = "this is (not sql"""".stripMargin))
    assert(e.getMessage.toLowerCase.matches("(?s).*(syntax|parse).*"))
  }

  test("unknown column fails loudly at compile/analysis time") {
    val e = intercept[Exception](runToml(
      """[[filter]]
        |name = "SqlWhere"
        |  [filter.config]
        |  Where = "no_such_field = '1'"""".stripMargin))
    assert(e.getMessage.contains("no_such_field"))
  }
}
