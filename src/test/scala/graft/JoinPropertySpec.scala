package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AsofJoin, RangeJoin}

/** Property tests: AsofJoin and RangeJoin vs naive in-memory reference
  * implementations over generated datasets. One Spark job per generated
  * dataset (small N of datasets, each with many rows) keeps runtime sane.
  */
class JoinPropertySpec extends SparkSpec {

  private val keys = Seq("a", "b", "c")

  private case class P(id: Long, k: String, ts: Long)
  private case class I(k: String, start: Long, end: Long, tag: String)

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  private val pointsGen: Gen[List[P]] = for {
    n <- Gen.choose(0, 60)
    ps <- Gen.listOfN(n, for {
      k <- Gen.oneOf(keys); ts <- Gen.choose(0L, 100L)
    } yield (k, ts))
  } yield ps.zipWithIndex.map { case ((k, ts), i) => P(i.toLong, k, ts) }

  private val intervalsGen: Gen[List[I]] = for {
    n <- Gen.choose(0, 30)
    is <- Gen.listOfN(n, for {
      k <- Gen.oneOf(keys); s <- Gen.choose(0L, 100L); w <- Gen.choose(1L, 40L)
    } yield (k, s, s + w))
  } yield is.zipWithIndex.map { case ((k, s, e), i) => I(k, s, e, s"t$i") }

  test("asof (backward & forward) matches the naive per-row reference") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val points = sample(pointsGen, seed)
      // quotes: distinct (k, ts) so the match is unambiguous
      val quotes = sample(intervalsGen, seed + 100)
        .map(i => (i.k, i.start, i.tag)).distinctBy(q => (q._1, q._2))
      val left = points.map(p => (p.id, p.k, p.ts)).toDF("id", "k", "ts")
      val right = quotes.toDF("k", "ts", "tag")
      for (forward <- Seq(false, true)) {
        val got = AsofJoin.asof(left, right, Seq("k"), "ts", Seq("tag"), forward)
          .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
        val want = points.map { p =>
          val cand = quotes.filter(q => q._1 == p.k &&
            (if (forward) q._2 >= p.ts else q._2 <= p.ts))
          val best =
            if (cand.isEmpty) None
            else Some(if (forward) cand.minBy(_._2) else cand.maxBy(_._2))
          p.id -> best.map(_._3)
        }.toMap
        assert(got == want, s"seed=$seed forward=$forward")
      }
    }
  }

  test("range join matches the naive filter over all (point, interval) pairs") {
    import spark.implicits._
    for (seed <- 1L to 8L) {
      val points = sample(pointsGen, seed)
      val intervals = sample(intervalsGen, seed + 200)
      val got = RangeJoin.pointInInterval(
          points.map(p => (p.id, p.k, p.ts)).toDF("id", "k", "ts"),
          intervals.map(i => (i.k, i.start, i.end, i.tag)).toDF("k", "start", "end", "tag"),
          Seq("k"), "ts", "start", "end", bucketWidthMicros = 16L)
        .select("id", "tag").collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val want = (for {
        p <- points; i <- intervals
        if i.k == p.k && p.ts >= i.start && p.ts < i.end
      } yield (p.id, i.tag)).toSet
      assert(got == want, s"seed=$seed")
    }
  }
}
