package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.topology.{ComponentConfig, Toml}

class TomlSpec extends AnyFunSuite {

  test("tables, array-of-tables, scalars, arrays, comments") {
    val t = Toml.parse(
      """# a topology
        |[fields]
        |names = ["a", "b", "c"]   # trailing comment
        |
        |[general]
        |dont_validate_fields = true
        |
        |[input]
        |name = "List"
        |  [input.config]
        |  files = ["x.csv.gz", "y.csv"]
        |
        |[[filter]]
        |name = "NotNull"
        |  [filter.config]
        |  Fields = ["a"]
        |
        |[[filter]]
        |name = "ClauseFilter"
        |  [filter.config]
        |  Clause = "(a v)"
        |
        |[output]
        |name = "FileWriter"
        |procs = 2
        |fields = ["b"]
        |  [output.config]
        |  PathString = "/tmp/out.csv.gz"
        |""".stripMargin, env = Map.empty)

    assert(t("fields").asInstanceOf[Map[String, Any]]("names") == List("a", "b", "c"))
    assert(t("general").asInstanceOf[Map[String, Any]]("dont_validate_fields") == true)
    val filters = t("filter").asInstanceOf[List[Map[String, Any]]]
    assert(filters.map(_("name")) == List("NotNull", "ClauseFilter"))
    assert(filters(1).apply("config").asInstanceOf[Map[String, Any]]("Clause") == "(a v)")
    val out = t("output").asInstanceOf[Map[String, Any]]
    assert(out("procs") == 2L && out("fields") == List("b"))
  }

  test("string escapes, literal strings, unicode, ints, floats, bools") {
    val t = Toml.parse(
      """a = "x\ny\"z"
        |b = 'C:\raw\path'
        |sep = "\u001e"
        |n = 42
        |neg = -7
        |f = 3.14
        |t = true
        |""".stripMargin, env = Map.empty)
    assert(t("a") == "x\ny\"z")
    assert(t("b") == "C:\\raw\\path")
    assert(t("sep") == "\u001e")
    assert(t("n") == 42L && t("neg") == -7L && t("f") == 3.14 && t("t") == true)
  }

  test("triple-quoted multiline strings") {
    val t = Toml.parse(
      "clause = \"\"\"(or (a v5)\n  (b v6))\"\"\"\nnext = 1\n", env = Map.empty)
    assert(t("clause") == "(or (a v5)\n  (b v6))")
    assert(t("next") == 1L)
  }

  test("multiline arrays") {
    val t = Toml.parse("xs = [\n  \"a\",\n  \"b\",\n]\n", env = Map.empty)
    assert(t("xs") == List("a", "b"))
  }

  test("env expansion: ${VAR} substituted, unset → empty") {
    val t = Toml.parse("p = \"${HOME_X}/f\"\nq = \"${UNSET_VAR_12345}\"",
      env = Map("HOME_X" -> "/home/u"))
    assert(t("p") == "/home/u/f")
    assert(t("q") == "")
  }

  test("filters preserve declaration order (order-sensitive chain)") {
    val names = (1 to 12).map(i => s"F$i")
    val toml = names.map(n => s"[[filter]]\nname = \"$n\"\n").mkString
    val t = Toml.parse(toml, env = Map.empty)
    assert(t("filter").asInstanceOf[List[Map[String, Any]]].map(_("name")) == names)
  }

  test("parse errors are loud") {
    assertThrows[IllegalArgumentException](Toml.parse("key value-without-equals"))
    assertThrows[IllegalArgumentException](Toml.parse("a = @nope"))
  }

  test("humanized byte sizes: decimal 1000-based, binary 1024-based") {
    def sz(v: Any): Long =
      ComponentConfig(Map("RotateSize" -> v), "t").sizeBytes("RotateSize")
    assert(sz(700L) == 700L)
    assert(sz("700") == 700L)
    assert(sz("32MB") == 32000000L)
    assert(sz("32 MiB") == 32L * 1024 * 1024)
    assert(sz("1.5 GiB") == (1.5 * 1024 * 1024 * 1024).toLong)
    assert(sz("64kib") == 64L * 1024)
    assert(sz("2k") == 2000L)
    assertThrows[IllegalArgumentException](sz("12 parsecs"))
    assertThrows[IllegalArgumentException](sz(-1L))
    // unitless integer strings must not round-trip through Double
    assert(sz("9007199254740993") == 9007199254740993L)
    // overflow errors out ("too large", as go-humanize) instead of
    // silently saturating to Long.MaxValue
    assertThrows[IllegalArgumentException](sz("9999 PiB"))
    assertThrows[IllegalArgumentException](sz("99999999999999999999"))
  }

  test("a nested [output.fields] table fails loudly instead of writing all fields") {
    val toml =
      """[fields]
        |names = ["a", "b"]
        |[input]
        |name = "LogLines"
        |  [input.config]
        |  Lines = ["1,2"]
        |[output]
        |name = "Recorder"
        |[output.fields]
        |fields = ["a"]
        |""".stripMargin
    val e = intercept[IllegalArgumentException](
      graft.topology.Topology.configFromToml(Toml.parse(toml)))
    assert(e.getMessage.contains("fields must be an array"))
  }
}
