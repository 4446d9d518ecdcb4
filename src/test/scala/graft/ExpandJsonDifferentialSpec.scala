package graft

import org.apache.spark.sql.functions._

import graft.operators.Filters.ExpandJSON

/** Differential test of ExpandJSON's two evaluators on their SHARED
  * subset: the codegen path (Spark's get_json_object) vs the Jackson
  * walker (verbatimNumbers = true) over the same random corpus and the
  * same plain dotted/indexed path battery — two independent
  * implementations that must agree wherever both are defined (integers
  * only, so the documented decimal-normalization divergence can't fire).
  * One Spark job per mode; the grammar-edge fuzz lives in the pure-JVM
  * ExpandJsonPropertySpec.
  */
class ExpandJsonDifferentialSpec extends SparkSpec {

  private val battery = Seq(
    "a", "b", "c", "a.b", "a.b.c", "b[0]", "b[1]", "a.b[0]", "b[2].a",
    "a.nested.k0", "k0", "nested.a")

  private def randomJson(rnd: scala.util.Random, depth: Int): String = {
    def value(d: Int): String =
      if (d <= 0 || rnd.nextInt(3) == 0) rnd.nextInt(4) match {
        case 0 => rnd.nextInt(2000000).toString
        case 1 => "\"s" + rnd.nextInt(1000) + "\""
        case 2 => "true"
        case _ => "false"
      }
      else if (rnd.nextBoolean()) obj(d - 1)
      else (0 until rnd.nextInt(4)).map(_ => value(d - 1))
        .mkString("[", ",", "]")
    def obj(d: Int): String = {
      val keys = rnd.shuffle(Seq("a", "b", "c", "k0", "nested"))
        .take(1 + rnd.nextInt(4))
      keys.map(k => "\"" + k + "\":" + value(d)).mkString("{", ",", "}")
    }
    obj(depth)
  }

  test("codegen get_json_object path == Jackson walker on 200 random " +
      "documents x 12 plain paths") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val docs = (0 until 200).map(i => (i.toLong, randomJson(rnd, 3)))
      .toDF("id", "js")
    assert(battery.forall(p => !ExpandJSON.isAdvancedPathForTest(p)),
      "battery must stay on the shared simple subset")
    val mappings = battery.zipWithIndex
      .map { case (p, i) => p -> s"v$i" }.toMap
    def run(verbatim: Boolean) =
      ExpandJSON("js", mappings, verbatimNumbers = verbatim)(docs)
        .orderBy("id")
        .select(("id" +: battery.indices.map(i => s"v$i")).map(col): _*)
        .collect().map(_.toSeq).toSeq
    val codegen = run(verbatim = false)
    val jackson = run(verbatim = true)
    assert(codegen == jackson)
    // the corpus actually exercises the battery: a decent share of cells
    // must be non-null or the differential proves nothing
    val hits = codegen.flatMap(_.drop(1)).count(_ != null)
    assert(hits > codegen.size, s"only $hits non-null cells")
  }
}
