package graft

import graft.operators.ClauseFilter
import graft.operators.Filters.Clause

/** ClauseFilter grammar semantics (reference: filter/clausefilter.go:14-282,
  * edge cases :150-163).
  */
class ClauseFilterSpec extends SparkSpec {

  private def df = strDf(Seq("f", "g"), Seq(
    Seq("a", "1"), Seq("b", "1"), Seq("a", "2"), Seq("", "3"), Seq(null, "4")))

  private def keep(clause: String): Set[String] =
    Clause(clause)(df).collect().map(_.getString(1)).toSet

  test("empty clause keeps everything") {
    assert(keep("") == Set("1", "1", "2", "3", "4"))
  }

  test("(and) matches nothing; (or) matches everything") {
    assert(keep("(and)") == Set.empty)
    assert(keep("(or)").size == 4) // 4 distinct g values
  }

  test("atom equality with null ≡ empty") {
    assert(keep("(f a)") == Set("1", "2"))
    // empty-string match catches both "" and null fields
    assert(keep("""(f "")""") == Set("3", "4"))
  }

  test("and/or/not compose; single-arg collapses") {
    assert(keep("(and (f a) (g 1))") == Set("1"))
    assert(keep("(or (f b) (g 2))") == Set("1", "2"))
    assert(keep("(not (f a))") == Set("1", "3", "4"))
    assert(keep("(and (f a))") == Set("1", "2"))
    assert(keep("(or (f a))") == Set("1", "2"))
  }

  test("quoted atoms with spaces and escapes") {
    val d2 = strDf(Seq("f"), Seq(Seq("hello world"), Seq("x")))
    assert(Clause("""(f "hello world")""")(d2).count() == 1)
  }

  test("parse errors: unbalanced/trailing/garbage") {
    assertThrows[IllegalArgumentException](ClauseFilter.parse("(and (f a)"))
    assertThrows[IllegalArgumentException](ClauseFilter.parse("(f a) extra"))
    assertThrows[IllegalArgumentException](ClauseFilter.compile("(not)"))
  }
}
