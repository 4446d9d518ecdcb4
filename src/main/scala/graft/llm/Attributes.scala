package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Attribute sidecars — the "tag once, mix many" corpus-curation layer
  * (the public Dolma-toolkit data model: per-document attributes live in
  * slim id-keyed tables NEXT TO the immutable text, never inside it).
  *
  * Why it matters at 100 TB: curation is iterative — thresholds move,
  * new signals combine with old ones — but the expensive part (running
  * taggers over text) and the immovable part (the text itself) don't
  * change per experiment. Materializing each tagger's output as a
  * sidecar means every new filter recipe costs a join over
  * kilobytes-per-doc attribute tables instead of a fresh pass over the
  * full-width corpus; the corpus file is written once and never
  * rewritten.
  *
  * Layout discipline: write the corpus AND every sidecar bucketed by the
  * SAME (id, bucket-count) — [[graft.core.Graft.writeBucketed]] — and
  * every [[mix]] is a ZERO-EXCHANGE sort-merge join (PlanShapeSpec pins
  * it): the single full-width shuffle of the text is paid at the initial
  * bucketed write, after which no experiment ever moves it again.
  */
object Attributes {

  /** One map-only pass computing every named attribute of the corpus —
    * the sidecar frame `(idCol, attr₁, attr₂, …)`. Attribute expressions
    * see the full corpus row (text, metadata), so any map-only signal in
    * the library ([[graft.functions.TextFunctions]] quality/Gopher/PII/
    * token-count columns, payload sniffs, …) can be a tagger. Names must
    * be distinct and must not collide with `idCol`.
    */
  def tag(corpus: DataFrame, idCol: String,
      attrs: Seq[(String, Column)]): DataFrame = {
    val names = attrs.map(_._1)
    require(names.distinct == names, s"duplicate attribute names: $names")
    require(!names.contains(idCol), s"attribute name collides with id: $idCol")
    corpus.select(col(idCol) +: attrs.map { case (n, c) => c.as(n) }: _*)
  }

  /** Join sidecars onto the corpus by `idCol` (left joins — a doc a
    * tagger never saw keeps null attributes) and keep rows passing
    * `keep`. Null semantics follow SQL: a null-rejecting predicate drops
    * untagged docs — the conservative default for a training corpus; use
    * explicit `coalesce`/`isNull` branches in `keep` to admit them.
    * Sidecar column names must not collide with each other or with the
    * corpus (beyond `idCol`).
    */
  def mix(corpus: DataFrame, idCol: String, sidecars: Seq[DataFrame],
      keep: Column): DataFrame = {
    val seen = scala.collection.mutable.Set(corpus.columns: _*)
    for (s <- sidecars; c <- s.columns if c != idCol)
      require(seen.add(c), s"attribute column '$c' collides across inputs")
    sidecars.foldLeft(corpus)((acc, s) => acc.join(s, Seq(idCol), "left"))
      .filter(keep)
  }
}
