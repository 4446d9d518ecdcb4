package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Boolean s-expression → Catalyst [[Column]] compiler.
  *
  * Implements the reference ClauseFilter grammar
  * (reference: filter/clausefilter.go:14-77 grammar, :143-249 parser,
  * :251-282 eval):
  *
  *   - empty clause        → keep everything (true)
  *   - `(and)`             → false, `(or)` → true
  *   - `(and X)`/`(or X)`  → X (single-arg collapse)
  *   - `(and X Y Z ...)`   → conjunction, `(or ...)` → disjunction
  *   - `(not X)`           → negation
  *   - `(field value)`     → field equals value, where a null field compares
  *                           equal to the empty string (logline.go:87-89:
  *                           empty field ≡ nil).
  *
  * The whole clause compiles to a single `Column` expression, so Catalyst
  * constant-folds, reorders and pushes it into the scan — there is no
  * runtime interpreter, unlike the reference's per-record tree walk.
  */
object ClauseFilter {

  sealed trait SExpr
  final case class SAtom(value: String)        extends SExpr
  final case class SList(items: List[SExpr])   extends SExpr

  /** Compile a clause string to a boolean Column. */
  def compile(clause: String): Column = {
    val trimmed = clause.trim
    if (trimmed.isEmpty) lit(true)
    else toColumn(parse(trimmed))
  }

  // --- s-expression reader (tiny recursive descent; no dependencies) ---

  def parse(s: String): SExpr = {
    val (e, rest) = parseOne(s, 0)
    val tail = skipWs(s, rest)
    require(tail >= s.length, s"trailing garbage in clause at offset $tail: '$s'")
    e
  }

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s(i).isWhitespace) i += 1
    i
  }

  private def parseOne(s: String, i0: Int): (SExpr, Int) = {
    val i = skipWs(s, i0)
    require(i < s.length, s"unexpected end of clause: '$s'")
    s(i) match {
      case '(' =>
        var j = skipWs(s, i + 1)
        val items = List.newBuilder[SExpr]
        while (j < s.length && s(j) != ')') {
          val (e, j2) = parseOne(s, j)
          items += e
          j = skipWs(s, j2)
        }
        require(j < s.length, s"unbalanced '(' in clause: '$s'")
        (SList(items.result()), j + 1)
      case '"' =>
        val sb = new StringBuilder
        var j = i + 1
        while (j < s.length && s(j) != '"') {
          if (s(j) == '\\' && j + 1 < s.length) { sb += s(j + 1); j += 2 }
          else { sb += s(j); j += 1 }
        }
        require(j < s.length, s"unterminated string in clause: '$s'")
        (SAtom(sb.toString), j + 1)
      case _ =>
        var j = i
        while (j < s.length && !s(j).isWhitespace && s(j) != '(' && s(j) != ')') j += 1
        (SAtom(s.substring(i, j)), j)
    }
  }

  // --- lowering to Column ---

  private def toColumn(e: SExpr): Column = e match {
    case SList(SAtom("and") :: Nil)        => lit(false) // (and) matches nothing
    case SList(SAtom("or") :: Nil)         => lit(true)  // (or) matches anything
    case SList(SAtom("and") :: x :: Nil)   => toColumn(x)
    case SList(SAtom("or") :: x :: Nil)    => toColumn(x)
    case SList(SAtom("and") :: args)       => args.map(toColumn).reduce(_ && _)
    case SList(SAtom("or") :: args)        => args.map(toColumn).reduce(_ || _)
    case SList(SAtom("not") :: x :: Nil)   => !toColumn(x)
    case SList(SAtom(field) :: SAtom(value) :: Nil) =>
      // baker atom: bytes.Equal(record.Get(field), value); null field ≡ "".
      // Compiled WITHOUT coalesce so the conjuncts stay parquet-pushable
      // (coalesce(f,'')=v reaches the scan as no filter at all; isnotnull+
      // equality push as PushedFilters). The two forms are equivalent:
      // a null field can only match the empty value. Both branches are
      // definite (never NULL) so `not` negates them correctly.
      if (value.isEmpty)
        col(field).isNull || col(field).cast("string") === lit("")
      else
        col(field).isNotNull && col(field).cast("string") === lit(value)
    case other =>
      throw new IllegalArgumentException(s"cannot interpret clause s-expression: $other")
  }
}
