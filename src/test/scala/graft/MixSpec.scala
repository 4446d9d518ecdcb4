package graft

import org.apache.spark.sql.functions._

import graft.llm.Mix

class MixSpec extends SparkSpec {

  test("deterministic sampling: stable across runs and partitionings, ~rate") {
    import spark.implicits._
    val df = (0L until 20000L).toDF("id")
    val h = pmod(col("id") * lit(2654435761L), lit(1000000L))
    val a = Mix.sampleDeterministic(df, 0.3, h).select("id").as[Long].collect().toSet
    val b = Mix.sampleDeterministic(df.repartition(7), 0.3, h)
      .select("id").as[Long].collect().toSet
    assert(a == b) // partitioning-independent (df.sample is not)
    assert(math.abs(a.size / 20000.0 - 0.3) < 0.02, s"rate off: ${a.size}")
  }

  test("weighted mix unions independently sampled sources") {
    import spark.implicits._
    val df = (0L until 10000L).toDF("id")
    val h = pmod(col("id") * lit(2654435761L), lit(1000000L))
    val evens = df.filter(col("id") % 2 === 0)
    val odds = df.filter(col("id") % 2 === 1)
    val out = Mix.weighted(Seq((evens, 1.0, h), (odds, 0.0, h)))
      .select("id").as[Long].collect()
    assert(out.length == 5000 && out.forall(_ % 2 == 0))
    // rate bounds enforced
    intercept[IllegalArgumentException](Mix.sampleDeterministic(df, 1.5, h))
  }

  test("stratified sampling: per-stratum rates, default 0, deterministic") {
    import spark.implicits._
    val df = (0L until 30000L).map(i => (i, Seq("en", "zh", "de")((i % 3).toInt)))
      .toDF("id", "lang")
    val h = col("id") * lit(2654435761L)
    val out = Mix.stratified(df, col("lang"), Map("en" -> 0.5, "zh" -> 0.1), h)
      .select("id", "lang").as[(Long, String)].collect()
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    assert(!byLang.contains("de")) // default rate 0 drops unlisted strata
    assert(math.abs(byLang("en") / 10000.0 - 0.5) < 0.03, s"en: ${byLang.get("en")}")
    assert(math.abs(byLang("zh") / 10000.0 - 0.1) < 0.03, s"zh: ${byLang.get("zh")}")
    // stable across partitionings
    val again = Mix.stratified(df.repartition(13), col("lang"),
      Map("en" -> 0.5, "zh" -> 0.1), h).select("id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet)
    intercept[IllegalArgumentException](
      Mix.stratified(df, col("lang"), Map("en" -> 2.0), h))
  }

  test("budgetSelect equals the naive global cumsum prefix") {
    import spark.implicits._
    // scores with ties; sizes chosen so the boundary falls mid-tie-group
    val df = Seq(
      (1L, 0.9, 40L), (2L, 0.9, 40L),            // 80 at score 0.9
      (3L, 0.5, 30L), (4L, 0.5, 30L), (5L, 0.5, 30L), // tie group at 0.5
      (6L, 0.1, 10L),
    ).toDF("id", "score", "sz")
    def select(budget: Long): Set[Long] =
      Mix.budgetSelect(df, col("score"), col("sz"), budget, col("id"))
        .select("id").as[Long].collect().toSet
    // naive reference: order by (score desc, id), keep prefix cum <= budget
    val ordered = Seq((1L, 40L), (2L, 40L), (3L, 30L), (4L, 30L), (5L, 30L), (6L, 10L))
    def naive(budget: Long): Set[Long] =
      ordered.scanLeft((0L, 0L)) { case ((_, c), (id, sz)) => (id, c + sz) }
        .tail.takeWhile(_._2 <= budget).map(_._1).toSet
    for (b <- Seq(0L, 39L, 80L, 110L, 140L, 170L, 179L, 180L, 1000L))
      assert(select(b) == naive(b), s"budget=$b")
    // stable under repartitioning
    val shuffled = Mix.budgetSelect(df.repartition(7), col("score"), col("sz"),
      140L, col("id")).select("id").as[Long].collect().toSet
    assert(shuffled == naive(140L))
  }

  test("budgetSelect matches the naive prefix on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 5) {
      // quantized scores force tie groups; sizes vary; some null scores
      val rows = (0L until 400L).map { id =>
        val score = if (rnd.nextInt(10) == 0) null
          else java.lang.Double.valueOf(rnd.nextInt(8) / 10.0)
        (id, score, 1L + rnd.nextInt(50))
      }
      val df = rows.toDF("id", "score", "sz")
      val ordered = rows.collect { case (id, s, sz) if s != null => (id, s.doubleValue, sz) }
        .sortBy { case (id, s, _) => (-s, id) }
      val budget = rnd.nextInt(ordered.map(_._3.toInt).sum + 100).toLong
      val naive = ordered.scanLeft((0L, 0L)) { case ((_, c), (id, _, sz)) => (id, c + sz) }
        .tail.takeWhile(_._2 <= budget).map(_._1).toSet
      val got = Mix.budgetSelect(df, col("score"), col("sz"), budget, col("id"))
        .select("id").as[Long].collect().toSet
      assert(got == naive, s"trial $trial budget=$budget")
    }
  }

  test("deterministicShuffle: dense permutation equal to the naive global order") {
    import spark.implicits._
    val df = spark.range(500).select(col("id"), (col("id") % 7).as("payload"))
    val out = Mix.deterministicShuffle(df, col("id"), seed = "s1")
    val got = out.select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    // dense 1..N permutation
    assert(got.values.toSeq.sorted == (1L to 500L))
    // equals the naive driver-side computation of the same order
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"s1|$id".getBytes("UTF-8"))
      d.map(b => f"$b%02x").mkString
    }
    val naive = (0L until 500L).sortBy(id => (key(id), id)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got == naive)
    // stable across partitioning and numPartitions choices
    val again = Mix.deterministicShuffle(df.repartition(13), col("id"),
      seed = "s1", numPartitions = 5)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(again == naive)
    // a different seed is a different permutation
    val other = Mix.deterministicShuffle(df, col("id"), seed = "s2")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(other != naive)
  }

  test("deterministicShuffle: a null tie fails loudly, not with an NPE") {
    val df = spark.range(10)
      .select(when(col("id") =!= 3, col("id")).as("maybe"))
    val e = intercept[Exception] {
      Mix.deterministicShuffle(df, col("maybe"), seed = "s1").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("non-null tie")),
      msgs(e).mkString(" | "))
  }

  test("budgetSelect fails fast past the distinct-score cap") {
    import spark.implicits._
    // 100 distinct unquantized scores; a cap of 10 must reject rather than
    // collect an unbounded codebook (driver holds at most cap+1 rows)
    val df = spark.range(100).select(col("id"),
      (col("id") / 7.000001).as("score"), lit(1L).as("sz"))
    val e = intercept[IllegalArgumentException](
      Mix.budgetSelect(df, col("score"), col("sz"), 50L, col("id"),
        maxDistinctScores = 10))
    assert(e.getMessage.contains("quantize"))
    // at-or-under the cap still works
    assert(Mix.budgetSelect(df, col("score"), col("sz"), 50L, col("id"),
      maxDistinctScores = 100).count() == 50L)
  }

  test("temperatureRates: α=0.5 upweights tail strata, caps at 1, α=1 is proportional") {
    val sizes = Seq("big" -> 9000L, "small" -> 900L)
    val r = Mix.temperatureRates(sizes, budget = 1000)
    // rate ∝ sqrt(n)/n = 1/sqrt(n): a 10× smaller stratum keeps a
    // sqrt(10) ≈ 3.16× higher rate
    assert(r("small") / r("big") > 3.0 && r("small") / r("big") < 3.4)
    // expected row yield ≈ budget when nothing caps
    val yielded = sizes.map { case (k, n) => r(k) * n }.sum
    assert(math.abs(yielded - 1000.0) < 1e-6)
    // a tiny stratum's allotment can exceed its size → rate caps at 1.0
    val capped = Mix.temperatureRates(Seq("a" -> 4L, "b" -> 10000L), budget = 5000)
    assert(capped("a") == 1.0)
    // α=1 degenerates to uniform sampling: same rate everywhere
    val prop = Mix.temperatureRates(sizes, budget = 1000, alpha = 1.0)
    assert(math.abs(prop("big") - prop("small")) < 1e-12)
    intercept[IllegalArgumentException](
      Mix.temperatureRates(Seq("a" -> 0L), budget = 10))
  }

  test("temperatureSample selects deterministically under the derived rates") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, if (i % 10 == 0) "tail" else "head"))
      .toDF("id", "lang")
    val hash = pmod(col("id"), lit(2147483647L)) * lit(2654435761L)
    val a = Mix.temperatureSample(df, col("lang"), budget = 300, hash = hash)
      .select("id").as[Long].collect().toSet
    val b = Mix.temperatureSample(df.repartition(7), col("lang"), budget = 300,
        hash = hash).select("id").as[Long].collect().toSet
    assert(a == b && a.nonEmpty, "selection must be partitioning-independent")
    // tail stratum (100 rows) keeps a larger FRACTION than head (900 rows)
    val byLang = df.filter(col("id").isin(a.toSeq: _*))
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("tail") / 100.0 > byLang("head") / 900.0)
  }

  test("solveMixture: water-filling caps and redistributes; exact totals; " +
      "corners (all capped, zero weight, empty source)") {
    def total(sol: Seq[(String, Long, Long, Boolean)]) = sol.map(_._3).sum
    val avail = Map("en" -> 1000L, "zh" -> 100L, "de" -> 100L, "fr" -> 50L)
    val w = Map("en" -> 4000, "zh" -> 3000, "de" -> 2000, "fr" -> 1000)
    // budget 1000 at 2-epoch caps (2000/200/200/100): zh wants 300 ->
    // caps at 200; de and fr sit EXACTLY at their caps (shares 200/100 =
    // caps — the >= boundary caps them too); en absorbs the remainder
    val sol = graft.llm.Mix.solveMixture(avail, w, budget = 1000L,
      maxEpochsBp = 20000)
    val m = sol.map(s => s._1 -> s).toMap
    assert(total(sol) == 1000L, sol.toString)
    assert(m("zh")._3 == 200L && m("zh")._4, "zh must cap at 2 epochs")
    assert(m("de")._3 == 200L && m("de")._4, "de caps at the boundary")
    assert(m("fr")._3 == 100L && m("fr")._4, "fr caps at the boundary")
    assert(m("en")._3 == 500L && !m("en")._4, "en absorbs the remainder")
    // a genuinely partial redistribution: fr slightly larger so only zh
    // caps and the 4:2:1 proportional split holds among the rest
    val sol2 = graft.llm.Mix.solveMixture(avail + ("fr" -> 80L), w,
      budget = 1000L, maxEpochsBp = 20000)
    val m2 = sol2.map(s => s._1 -> s).toMap
    assert(total(sol2) == 1000L, sol2.toString)
    assert(m2("zh")._4 && m2("de")._4 && !m2("en")._4 && !m2("fr")._4,
      sol2.toString)
    // en and fr split rem = 600 as 4000:1000 -> 480/120
    assert(m2("en")._3 == 480L && m2("fr")._3 == 120L, sol2.toString)
    // unreachable budget: everything caps, result = the max corpus
    val solAll = graft.llm.Mix.solveMixture(avail, w, budget = 100000L,
      maxEpochsBp = 20000)
    assert(solAll.forall(_._4) && total(solAll) == 2500L)
    // zero-weight source gets nothing unless capped at zero
    val solZ = graft.llm.Mix.solveMixture(avail,
      Map("en" -> 10000, "zh" -> 0, "de" -> 0, "fr" -> 0), budget = 1000L,
      maxEpochsBp = 20000)
    assert(solZ.filter(_._1 != "en").forall(_._3 == 0L))
    assert(solZ.find(_._1 == "en").get._3 == 1000L)
    // empty source: cap 0, capped immediately, contributes nothing
    val solE = graft.llm.Mix.solveMixture(avail + ("xx" -> 0L),
      Map("en" -> 4000, "zh" -> 3000, "de" -> 2000, "fr" -> 500, "xx" -> 500),
      budget = 1000L, maxEpochsBp = 20000)
    val mx = solE.find(_._1 == "xx").get
    assert(mx._3 == 0L && mx._4)
    assert(total(solE) == 1000L)
  }

  test("epochExpand: floor copies + hash-selected fractional epoch, 0 drops, default passes") {
    import spark.implicits._
    val df = (0L until 1000L).map(id =>
      (id, if (id < 400) "en" else if (id < 600) "de" else if (id < 800) "fr" else "xx"))
      .toDF("id", "lang")
    val hash = pmod(col("id"), lit(2147483647L)) * lit(2654435761L)
    val out = graft.llm.Mix.epochExpand(df, col("lang"),
      Map("en" -> 1.7, "de" -> 2.0, "fr" -> 0.0), hash)
    val counts = out.groupBy("id", "lang").count().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // fr (factor 0) vanishes entirely; de exactly 2 copies; default 1 copy
    assert(!counts.exists(_._2 == "fr"))
    assert(counts.filter(_._2 == "de").forall(_._3 == 2L))
    assert(counts.filter(_._2 == "xx").forall(_._3 == 1L))
    // en: each doc has 1 or 2 copies, and the 2-copy subset is the
    // hash-threshold selection — expected fraction 0.7 of 400 docs
    val en = counts.filter(_._2 == "en")
    assert(en.forall(c => c._3 == 1L || c._3 == 2L))
    val twos = en.count(_._3 == 2L)
    assert(math.abs(twos / 400.0 - 0.7) < 0.08, s"frac-epoch share ${twos / 400.0}")
    // epoch indices are dense 0..copies-1 (the shuffle key downstream)
    import org.apache.spark.sql.functions.{collect_list, sort_array}
    val epochs = out.filter(col("lang") === "de").groupBy("id")
      .agg(sort_array(collect_list(col("epoch"))).as("e"))
      .select("e").as[Seq[Long]].collect()
    assert(epochs.forall(_ == Seq(0L, 1L)))
    // deterministic: same expansion on a different partitioning
    val again = graft.llm.Mix.epochExpand(df.repartition(7), col("lang"),
      Map("en" -> 1.7, "de" -> 2.0, "fr" -> 0.0), hash)
      .groupBy("id").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap == again)
  }

  test("capPerKey keeps the n best per key (order asc, full rows), ties by rank struct") {
    import spark.implicits._
    // 3 hosts with different sizes; quality = score desc via negation
    val rows = for {
      h <- Seq("a", "b", "c")
      i <- 0 until (if (h == "a") 20 else 5)
    } yield (s"$h-$i", h, (i * 7) % 13)
    val df = rows.toDF("id", "host", "score")
    val out = Mix.capPerKey(df, col("host"),
        struct((-col("score")).as("s"), col("id").as("i")), "id", n = 4)
      .collect().map(r => (r.getAs[String]("host"), r.getAs[String]("id"),
        r.getAs[Int]("score")))
    // naive reference
    val expect = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.sortBy(r => (-r._3, r._1)).take(4)
    }.map(r => (r._2, r._1, r._3)).toSet
    assert(out.toSet == expect)
    assert(out.count(_._1 == "a") == 4 && out.count(_._1 == "b") == 5 - 1)
    // full schema preserved
    assert(Mix.capPerKey(df, col("host"), col("score"), "id", 2)
      .columns.toSeq == Seq("id", "host", "score"))
  }

  test("assignSplits: deterministic, partitioning-stable, ~weights, validated") {
    import spark.implicits._
    val df = (0L until 10000L).toDF("id")
    val splits = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1)
    val a = Mix.assignSplits(df, col("id"), "s1", splits)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(a("train") / 10000.0 - 0.8) < 0.02, a.toString)
    assert(math.abs(a("valid") / 10000.0 - 0.1) < 0.01, a.toString)
    assert(math.abs(a("test") / 10000.0 - 0.1) < 0.01, a.toString)
    // identical assignment regardless of partitioning
    val one = Mix.assignSplits(df, col("id"), "s1", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val two = Mix.assignSplits(df.repartition(13), col("id"), "s1", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(one == two)
    // a different seed reshuffles the assignment
    val three = Mix.assignSplits(df, col("id"), "s2", splits)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(one != three)
    intercept[IllegalArgumentException] {
      Mix.assignSplits(df, col("id"), "s", Seq("a" -> 0.5, "b" -> 0.4))
    }
    // a null key must fail loud, not fall silently into the last split
    val withNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS id")
    val err = intercept[Exception] {
      Mix.assignSplits(withNull, col("id"), "s1", splits).collect()
    }
    assert(err.getMessage != null && err.toString.contains("null split key")
      || Option(err.getCause).exists(_.toString.contains("null split key")),
      s"unexpected error: $err")
    intercept[IllegalArgumentException] {
      Mix.assignSplits(df, col("id"), "s", Seq("a" -> 0.5, "a" -> 0.5))
    }
  }

  test("sampleKPerKey: k per key, deterministic, seed-sensitive, partitioning-stable") {
    import spark.implicits._
    val rows = for (k <- Seq("x", "y"); i <- 0 until 50) yield (s"$k$i", k)
    val df = rows.toDF("id", "key")
    def run(d: org.apache.spark.sql.DataFrame, seed: String) =
      Mix.sampleKPerKey(d, col("key"), "id", 5, seed)
        .collect().map(_.getString(0)).toSet
    val a = run(df, "s1")
    assert(a.size == 10 && a.count(_.startsWith("x")) == 5)
    assert(run(df.repartition(7), "s1") == a)
    assert(run(df, "s2") != a)
    // matches the naive md5 rank
    val md = java.security.MessageDigest.getInstance("MD5")
    def h(s: String) = md.digest(s"s1|$s".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expect = rows.groupBy(_._2).flatMap { case (_, g) =>
      g.map(_._1).sortBy(id => (h(id), id)).take(5)
    }.toSet
    assert(a == expect)
  }

  test("assignSplits thresholds match splitThresholds (the oracle contract)") {
    val th = Mix.splitThresholds(Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    assert(th == Seq("train" -> "cccccccc", "valid" -> "e6666666", "test" -> "ffffffff"))
  }

  test("capPerKey: n larger than the group keeps the whole group; n must be positive") {
    import spark.implicits._
    val df = Seq(("x", "k"), ("y", "k")).toDF("id", "key")
    assert(Mix.capPerKey(df, col("key"), col("id"), "id", 10).count() == 2)
    intercept[IllegalArgumentException] {
      Mix.capPerKey(df, col("key"), col("id"), "id", 0)
    }
  }

  test("capPerKey: null order or null id rows never occupy cap slots") {
    import spark.implicits._
    // the ascending struct sort places NULL FIRST: an unguarded CollectTopK
    // would crown the null-order row the "best" of key a, and the null-id
    // row would occupy a slot yet vanish through the semi-join
    val df = Seq[(java.lang.Long, String, java.lang.Double)](
      (1L, "a", 1.0), (2L, "a", 2.0),
      (3L, "a", null),                  // null order
      (null, "a", 0.5),                 // null id (best-ranked order!)
      (4L, "b", 9.0)
    ).toDF("id", "k", "o")
    val kept = Mix.capPerKey(df, col("k"), col("o"), "id", 2)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L), s"got $kept")

    // the documented composite pattern: a struct order whose FIELD is null
    // is itself non-null, but null fields sort first all the same — the
    // guard must look inside the struct
    val comp = Seq[(java.lang.Long, String, java.lang.Double, java.lang.Long)](
      (1L, "a", 1.0, 10L), (2L, "a", 2.0, 20L),
      (3L, "a", null, 5L) // null quality, best-sorting without the guard
    ).toDF("id", "k", "q", "ts")
    val keptC = Mix.capPerKey(comp, col("k"),
        struct(col("q").as("q"), col("ts").as("t")), "id", 2)
      .collect().map(_.getLong(0)).toSet
    assert(keptC == Set(1L, 2L), s"got $keptC")
  }

  test("quantileFilter: per-stratum discrete cut, ties at the threshold " +
      "drop together, small strata behave") {
    import spark.implicits._
    // stratum a: scores 1..10 (n=10, drop 0.6 → k=6 → threshold=6):
    // keep 7,8,9,10. stratum b: 5,5,5,9 (n=4, k=⌈2.4⌉=3 → cum(5)=3 ≥ 3 →
    // threshold 5; ties at 5 all drop): keep only 9.
    val df = ((1 to 10).map(i => ("a", i.toLong, i.toLong * 100)) ++
      Seq(("b", 95L, 5L), ("b", 96L, 5L), ("b", 97L, 5L), ("b", 98L, 9L))
        .map { case (k, id, s) => (k, id, s) })
      .toDF("k", "id", "score")
    val thr = Mix.quantileThresholds(df, col("k"), col("score"), drop = 0.6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thr == Map("a" -> 600L, "b" -> 5L), s"got $thr")
    val kept = Mix.quantileFilter(df, col("k"), col("score"), drop = 0.6)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(7L, 8L, 9L, 10L, 98L), s"got $kept")
    // a one-row stratum: k = 1, threshold = the only value → nothing kept
    val single = Seq(("c", 1L, 42L)).toDF("k", "id", "score")
    assert(Mix.quantileFilter(single, col("k"), col("score"), 0.6).count() == 0)
    intercept[IllegalArgumentException](
      Mix.quantileThresholds(df, col("k"), col("score"), 0.0))
    // null scores (unparseable fields) are excluded from the
    // distribution: they never pass the gate AND never shift the cut.
    // Ten nulls against ten real scores is past the shift point — were
    // they counted, n would double (20), the rank demand would become
    // cum ≥ 12, and the ten bottom-sorted nulls would drag the threshold
    // down to 200; the exclusion keeps it at 600
    val withNulls = df.unionByName(
      (100L to 109L).map(("a", _)).toDF("k", "id")
        .withColumn("score", lit(null).cast("long"))
        .select("k", "id", "score"))
    val thrN = Mix.quantileThresholds(withNulls, col("k"), col("score"), 0.6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(thrN("a") == 600L, s"null scores must not shift the cut: $thrN")
    val keptN = Mix.quantileFilter(withNulls, col("k"), col("score"), 0.6)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(keptN.intersect((100L to 109L).toSet).isEmpty)
  }

  test("percentileRank: cume_dist per stratum, null scores null, no corpus window") {
    import spark.implicits._
    val df = Seq(("a", 10L), ("a", 20L), ("a", 20L), ("a", 40L), ("b", 5L))
      .toDF("k", "s").withColumn("id", monotonically_increasing_id())
    val got = Mix.percentileRank(df, col("k"), col("s"))
      .select("k", "s", "percentile").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got(("a", 10L)) == 0.25)
    assert(got(("a", 20L)) == 0.75) // ties share the cumulative rank
    assert(got(("a", 40L)) == 1.0)
    assert(got(("b", 5L)) == 1.0)
    // null score → null percentile, and it never shifts the others
    val withNull = df.unionByName(
      Seq(("a", Option.empty[Long])).toDF("k", "s")
        .withColumn("id", lit(99L)))
    val n = Mix.percentileRank(withNull, col("k"), col("s"))
    assert(n.filter(col("s").isNull).select("percentile").collect().head.isNullAt(0))
    assert(n.filter(col("s") === 10L).select("percentile")
      .collect().head.getDouble(0) == 0.25)
    // null STRATA are symmetric with null scores: the row gets a null
    // percentile and never shapes any distribution (it can't equi-join
    // the histogram back, so counting it in would be write-only state)
    val withNullK = Seq((Option("a"), 10L), (Option("a"), 20L),
        (Option.empty[String], 99L))
      .toDF("k", "s")
    val nk = Mix.percentileRank(withNullK, col("k"), col("s"))
    assert(nk.filter(col("k").isNull).select("percentile").collect().head.isNullAt(0))
    assert(nk.filter(col("s") === 20L).select("percentile")
      .collect().head.getDouble(0) == 1.0)
    // the window runs over the histogram, never the corpus: plan has a
    // Window whose input is the aggregated (stratum, score) frame
    val plan = Mix.percentileRank(df, col("k"), col("s"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(plan.contains("HashAggregate"), plan)
  }

  test("sampleN: exactly n, deterministic, seed-sensitive, partitioning-stable") {
    import spark.implicits._
    val df = (0L until 200L).map(i => (i, s"d$i")).toDF("id", "t")
    val a = Mix.sampleN(df, col("id"), "id", 40).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 40)
    // stable under repartitioning, sensitive to the seed, total under n
    val b = Mix.sampleN(df.repartition(7), col("id"), "id", 40).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    val c = Mix.sampleN(df, col("id"), "id", 40, seed = "other").select("id")
      .collect().map(_.getLong(0)).toSet
    assert(c.size == 40 && c != a)
    assert(Mix.sampleN(df, col("id"), "id", 1000).count() == 200)
    // matches the order-by-md5-limit-n specification
    val expect = (0L until 200L)
      .sortBy(i => org.apache.commons.codec.digest.DigestUtils.md5Hex(s"sampleN|$i"))
      .take(40).toSet
    assert(a == expect)
  }
}
