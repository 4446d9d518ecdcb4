package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest}
import org.scalacheck.Prop.forAll
import org.scalacheck.rng.Seed

import graft.topology.Topology

/** Property tests for the raw-path lazy CSV field extraction — the
  * conformance suite SURVEY §5 plans for our codec: Parse↔ToText
  * roundtrip, missing-trailing-fields ≡ empty (logline.go:87-89), and
  * separator independence (`,` and `\x1e`, the reference's
  * advanced_csv_example_0x1e). Cases are generated with scalacheck under
  * a fixed seed and evaluated in ONE DataFrame pass per separator (a
  * per-sample Spark job would be minutes, not seconds).
  */
class CsvRoundtripSpec extends SparkSpec {

  private val nFields = 6
  private val fields = (0 until nFields).map(i => s"f$i")

  /** Reference semantics in plain Scala: split keeps empties; missing
    * trailing fields read as empty (logline.go:87-146).
    */
  private def oracle(line: String, sep: Char): Seq[String] = {
    val parts = line.split(java.util.regex.Pattern.quote(sep.toString), -1).toSeq
    (0 until nFields).map(i => if (i < parts.length) parts(i) else "")
  }

  private def valueGen(sep: Char): Gen[String] =
    Gen.oneOf(
      Gen.const(""),
      Gen.alphaNumStr.map(_.take(12)),
      // printable noise, separator and newline excluded
      Gen.listOf(Gen.choose(32.toChar, 126.toChar).suchThat(c => c != sep))
        .map(_.take(20).mkString))

  /** Lines with 0..nFields+3 values: under- and over-full vs the schema. */
  private def lineGen(sep: Char): Gen[String] =
    Gen.choose(0, nFields + 3)
      .flatMap(n => Gen.listOfN(n, valueGen(sep)))
      .map(_.mkString(sep.toString))

  private def cases(sep: Char, n: Int): Seq[String] = {
    val g = lineGen(sep)
    // fixed seed → deterministic corpus; iterate the seed, not retries
    Iterator.iterate(Seed(42L))(_.next)
      .map(s => g.pureApply(Gen.Parameters.default, s))
      .take(n).toSeq
  }

  for (sep <- Seq(',', '\u001e')) {
    val sepName = if (sep == ',') "comma" else "0x1e"

    test(s"lazy field extraction matches reference Get semantics [$sepName]") {
      import spark.implicits._
      val lines = cases(sep, 300)
      val df = lines.toDF("value")
        .withColumns(Topology.lazyFieldColumns(col("value"), fields, sep.toString))
      val got = df.select(fields.map(col): _*).collect()
        .map(r => (0 until nFields).map(r.getString))
      for ((line, g) <- lines.zip(got))
        assert(g == oracle(line, sep), s"line=${line.replace(sep, '|')}")
    }

    test(s"extract → concat_ws roundtrips full lines byte-exactly [$sepName]") {
      import spark.implicits._
      // exactly nFields values: ToText of an unmodified full record must
      // reproduce the original line (logline.go:152-220 fast path)
      val g = Gen.listOfN(nFields, valueGen(sep)).map(_.mkString(sep.toString))
      val lines = Iterator.iterate(Seed(7L))(_.next)
        .map(s => g.pureApply(Gen.Parameters.default, s)).take(300).toSeq
      val df = lines.toDF("value")
        .withColumns(Topology.lazyFieldColumns(col("value"), fields, sep.toString))
      val back = df.select(col("value"),
        concat_ws(sep.toString, fields.map(col): _*).as("rt")).collect()
      for (r <- back) assert(r.getString(0) == r.getString(1))
    }
  }

  test("scalacheck property: extraction == oracle on arbitrary lines") {
    import spark.implicits._
    // one forAll over a batched evaluator: sample 40 lines per prop case
    val prop = forAll(Gen.listOfN(40, lineGen(','))) { lines =>
      val df = lines.toDF("value")
        .withColumns(Topology.lazyFieldColumns(col("value"), fields, ","))
      val got = df.select(fields.map(col): _*).collect()
        .map(r => (0 until nFields).map(r.getString))
      lines.zip(got).forall { case (l, g) => g == oracle(l, ',') }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(5), prop)
    assert(res.passed, res.status.toString)
  }
}
