package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Filters.ExpandJSON

/** Property fuzz of the ExpandJSON JMESPath walker against its documented
  * subset grammar (r15 verdict stretch): the walker is the largest
  * hand-written parser in the filter layer, and the single oracle row
  * can't see grammar-edge cases. Strategy: a MODEL JSON ADT generates
  * random trees whose expected values are computed independently in plain
  * Scala, so every property compares two implementations — the walker's
  * tokenizer/projection machinery vs direct model arithmetic — plus a
  * differential pass against Spark's own get_json_object on the shared
  * simple-path subset (ExpandJsonDifferentialSpec runs that one Spark
  * job; this suite is pure JVM and fast).
  */
class ExpandJsonPropertySpec extends AnyFunSuite {

  /** Deterministic scalacheck sampling (no scalatest bridge in this
    * build): n values of g from consecutive seeds.
    */
  private def sample[A](g: Gen[A], n: Int, seed: Long = 97L): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(seed + i)))

  // ---- model JSON ----
  sealed trait J { def render: String }
  case class JInt(n: Long) extends J { def render = n.toString }
  case class JStr(s: String) extends J { def render = "\"" + s + "\"" }
  case class JBool(b: Boolean) extends J { def render = b.toString }
  case class JArr(xs: List[J]) extends J {
    def render = xs.map(_.render).mkString("[", ",", "]")
  }
  case class JObj(fs: List[(String, J)]) extends J {
    def render = fs.map { case (k, v) => "\"" + k + "\":" + v.render }
      .mkString("{", ",", "}")
  }

  /** The walker's render() contract: scalars unquoted, containers as
    * compact JSON text (Jackson toString — matches our escape-free
    * generated strings), null for a missing node.
    */
  private def rendered(j: J): String = j match {
    case JInt(n)  => n.toString
    case JStr(s)  => s
    case JBool(b) => b.toString
    case other    => other.render
  }

  private val keyGen = Gen.oneOf("a", "b", "c", "k0", "k1", "nested")
  private val strGen = Gen.alphaNumStr.map(_.take(6))
  private def leafGen: Gen[J] = Gen.oneOf(
    Gen.chooseNum(-1000000L, 1000000L).map(JInt.apply),
    strGen.map(JStr.apply),
    Gen.oneOf(true, false).map(JBool.apply))
  private def treeGen(depth: Int): Gen[J] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> Gen.chooseNum(0, 4).flatMap(n =>
        Gen.listOfN(n, treeGen(depth - 1)).map(JArr.apply)),
      3 -> Gen.chooseNum(1, 4).flatMap(n =>
        Gen.listOfN(n, keyGen.flatMap(k => treeGen(depth - 1).map(k -> _)))
          .map(fs => JObj(fs.distinctBy(_._1)))))

  private val rootGen: Gen[JObj] = Gen.chooseNum(1, 4).flatMap(n =>
    Gen.listOfN(n, keyGen.flatMap(k => treeGen(3).map(k -> _)))
      .map(fs => JObj(fs.distinctBy(_._1))))

  private def deep(j: J): Boolean = j match {
    case JObj(fs) => fs.nonEmpty
    case JArr(xs) => xs.nonEmpty
    case _        => false
  }

  /** A path that RESOLVES in `j` (random walk over a non-empty
    * container) plus its expected node.
    */
  private def walkGen(j: J): Gen[(String, J)] = j match {
    case JObj(fs) =>
      Gen.oneOf(fs).flatMap { case (k, v) =>
        if (!deep(v)) Gen.const((k, v))
        else Gen.frequency(
          2 -> Gen.const((k, v)),
          3 -> walkGen(v).map { case (p, out) =>
            (if (p.startsWith("[")) k + p else s"$k.$p", out)
          })
      }
    case JArr(xs) =>
      Gen.chooseNum(0, xs.length - 1).flatMap { i =>
        val neg = i - xs.length // same element by negative index
        Gen.oneOf(s"[$i]", s"[$neg]").flatMap { ix =>
          if (!deep(xs(i))) Gen.const((ix, xs(i)))
          else Gen.frequency(
            2 -> Gen.const((ix, xs(i))),
            3 -> walkGen(xs(i)).map { case (p, out) =>
              (if (p.startsWith("[")) ix + p else s"$ix.$p", out)
            })
        }
      }
    case other => Gen.const(("", other)) // unreachable: guarded by deep()
  }

  private val casedGen: Gen[(JObj, String, J)] =
    rootGen.flatMap(j => walkGen(j).map { case (p, out) => (j, p, out) })

  test("random resolving walks (dotted, indexed, negative indices) " +
      "return exactly the model's node") {
    for ((j, path, expected) <- sample(casedGen, 400)) {
      assert(ExpandJSON.evalPath(j.render, path) == rendered(expected),
        s"path=$path json=${j.render}")
    }
  }

  test("a | piped | path equals its dotted form on random objects") {
    for ((j, path, _) <- sample(casedGen, 400, seed = 211L)
         if !path.contains("[")) {
      val piped = path.split("\\.").mkString(" | ")
      assert(ExpandJSON.evalPath(j.render, piped) ==
        ExpandJSON.evalPath(j.render, path), s"path=$path")
    }
  }

  test("slices [a:b:s] on int arrays equal the model slice (JMESPath " +
      "python semantics, positive step)") {
    val arrGen = Gen.chooseNum(0, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-99L, 99L).map(JInt.apply)))
    val boundGen = Gen.option(Gen.chooseNum(-10, 10))
    val sliceCase = for {
      xs <- arrGen; a <- boundGen; b <- boundGen
      st <- Gen.option(Gen.chooseNum(1, 3))
    } yield (xs, a, b, st)
    for ((xs, a, b, st) <- sample(sliceCase, 400, seed = 31L)) {
        val j = JObj(List("arr" -> JArr(xs)))
        val n = xs.length
        def clamp(v: Int): Int = math.max(if (v < 0) n + v else v, 0)
        val from = a.map(clamp).getOrElse(0)
        val until = b.map(clamp).getOrElse(n)
        val step = st.getOrElse(1)
        val expect = Range(math.min(from, n), math.min(until, n), step)
          .filter(i => i >= 0 && i < n).map(xs)
        val path = s"arr[${a.getOrElse("")}:${b.getOrElse("")}" +
          st.map(s => s":$s").getOrElse("") + "]"
      assert(ExpandJSON.evalPath(j.render, path) ==
        JArr(expect.toList).render, s"path=$path n=$n")
    }
  }

  test("[*] list projection with a trailing key keeps exactly the " +
      "elements where the key resolves, in order") {
    val elemGen: Gen[J] = Gen.frequency(
      3 -> Gen.chooseNum(0L, 99L).map(v => JObj(List("k0" -> JInt(v)))),
      2 -> Gen.chooseNum(0L, 99L).map(v => JObj(List("other" -> JInt(v)))),
      1 -> Gen.const(JInt(7L)))
    for (xs <- sample(Gen.chooseNum(0, 6).flatMap(n =>
        Gen.listOfN(n, elemGen)), 300, seed = 7L)) {
      val j = JObj(List("arr" -> JArr(xs)))
      val expect = xs.collect {
        case JObj(fs) if fs.exists(_._1 == "k0") =>
          fs.find(_._1 == "k0").get._2
      }
      assert(ExpandJSON.evalPath(j.render, "arr[*].k0") ==
        JArr(expect).render)
      // a pipe STOPS the projection: [0] after | indexes the RESULT list
      val pipedFirst = ExpandJSON.evalPath(j.render, "arr[*].k0 | [0]")
      assert(pipedFirst == expect.headOption.map(rendered).orNull)
    }
  }

  test("filter expressions [?k0 > `x`] keep exactly the model-filtered " +
      "elements; length() and join() agree with the model") {
    val elemGen = Gen.chooseNum(-50L, 50L).map(v => JObj(List("k0" -> JInt(v))))
    val filtCase = for {
      xs <- Gen.chooseNum(0, 6).flatMap(n => Gen.listOfN(n, elemGen))
      cut <- Gen.chooseNum(-50L, 50L)
    } yield (xs, cut)
    for ((xs, cut) <- sample(filtCase, 300, seed = 53L)) {
      val j = JObj(List("arr" -> JArr(xs)))
      val kept = xs.filter(_.fs.head._2.asInstanceOf[JInt].n > cut)
      assert(ExpandJSON.evalPath(j.render, s"arr[?k0 > `$cut`]") ==
        JArr(kept).render)
      assert(ExpandJSON.evalPath(j.render, "length(arr)") ==
        xs.length.toString)
      val strs = xs.map(e => JStr("s" + e.fs.head._2.asInstanceOf[JInt].n))
      val j2 = JObj(List("arr" -> JArr(strs)))
      assert(ExpandJSON.evalPath(j2.render, "join('-', arr)") ==
        strs.map(_.s).mkString("-"))
    }
  }

  test("garbage paths never throw: random bytes in, null or a string out") {
    val junkGen = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf('[', ']', '.', '|', '?', '*', ':', '(',
        ')', '\'', '`', '@', '&', '-', ','))).map(_.mkString)
    val junkCase = for { j <- treeGen(3); junk <- junkGen } yield (j, junk)
    for ((j, junk) <- sample(junkCase, 500, seed = 13L)) {
      ExpandJSON.evalPath(j.render, junk) // must not throw
      ExpandJSON.evalPath(junk, "a.b")    // junk json: null, not a throw
    }
  }
}
