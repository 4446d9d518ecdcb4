package graft

import org.apache.spark.sql.functions._

import graft.operators.Filters._

/** Per-operator specs for the 24-filter pack, table-driven like the
  * reference's *_test.go files; each test pins one of the semantic
  * gotchas from SURVEY §7.4.
  */
class FiltersSpec extends SparkSpec {

  test("ClearFields sets listed fields to null") {
    val df = strDf(Seq("a", "b"), Seq(Seq("1", "2"), Seq("3", "4")))
    val out = ClearFields(Seq("b"))(df).collect()
    assert(out.forall(_.isNullAt(1)))
    assert(out.map(_.getString(0)).sorted.toSeq == Seq("1", "3"))
  }

  test("Concatenate joins with separator between fields only; null ≡ empty") {
    val df = strDf(Seq("a", "b", "c"), Seq(Seq("x", "y", "z"), Seq("x", null, "z")))
    val out = Concatenate(Seq("a", "b", "c"), "t", "-")(df)
    assert(col1[String](out.select("t").orderBy("t")) == Seq("x--z", "x-y-z"))
  }

  test("Dedup keeps one row per key tuple") {
    val df = strDf(Seq("a", "b"), Seq(Seq("1", "x"), Seq("1", "x"), Seq("2", "x")))
    assert(Dedup(Seq("a", "b"))(df).count() == 2)
  }

  test("Dedup separator clash: keys joined on the separator DO collide") {
    // reference parity (dedup_test.go "separator clash", want: 1): with
    // sep "-", ("abc","def-") and ("abc-def","") both key to "abc-def-"
    val df = strDf(Seq("f1", "f2"), Seq(Seq("abc", "def-"), Seq("abc-def", "")))
    assert(Dedup(Seq("f1", "f2"), keySeparator = "-")(df).count() == 1)
    // with the default \x1e separator they stay distinct
    assert(Dedup(Seq("f1", "f2"))(df).count() == 2)
  }

  test("NotNull drops rows where any listed field is null OR empty") {
    val df = strDf(Seq("a", "b"),
      Seq(Seq("1", "ok"), Seq("2", ""), Seq("3", null), Seq("4", "ok")))
    assert(col1[String](NotNull(Seq("b"))(df).select("a").orderBy("a")) == Seq("1", "4"))
  }

  test("StringMatch drops matching rows; invert keeps only matches") {
    val df = strDf(Seq("a"), Seq(Seq("x"), Seq("y"), Seq("z")))
    assert(col1[String](StringMatch("a", Seq("x", "y"))(df)) == Seq("z"))
    assert(col1[String](StringMatch("a", Seq("x", "y"), invert = true)(df).orderBy("a"))
      == Seq("x", "y"))
  }

  test("RegexMatch: ALL patterns must match; invert drops if ANY matches") {
    val df = strDf(Seq("a", "b"),
      Seq(Seq("abc", "123"), Seq("abc", "xyz"), Seq("zzz", "123")))
    val keep = RegexMatch(Seq("a" -> "^a", "b" -> "^1"))(df)
    assert(keep.count() == 1)
    val inv = RegexMatch(Seq("a" -> "^a", "b" -> "^1"), invert = true)(df)
    assert(inv.count() == 0) // every row matches at least one pattern
  }

  test("TimestampRange: upper bound exclusive, non-numeric dropped") {
    val df = strDf(Seq("ts"), Seq(Seq("100"), Seq("199"), Seq("200"), Seq("abc"), Seq(null)))
    assert(col1[String](TimestampRange("ts", 100, 200)(df).orderBy("ts"))
      == Seq("100", "199"))
  }

  test("Slice substrings [start,end) clamped to value length") {
    val df = strDf(Seq("a"), Seq(Seq("hello world"), Seq("hi"), Seq(null)))
    val out = SliceF(df)
    assert(col1[String](out) == Seq("hell", "hi", ""))
  }
  private def SliceF = Slice("a", "s", 0, 4).andThen(_.select("s"))

  test("ExpandList maps list indexes to fields; out-of-range → empty") {
    val df = strDf(Seq("l"), Seq(Seq("a;b;c"), Seq("a"), Seq(null)))
    val out = ExpandList("l", Map(0 -> "f0", 2 -> "f2"), ";")(df)
      .select("f0", "f2").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("a", "c"), ("a", ""), ("", "")))
  }

  test("ExpandJSON extracts paths; bool mapping; default mode normalizes decimals") {
    val df = strDf(Seq("j"), Seq(
      Seq("""{"k":"v","n":1.50,"b":true}"""), Seq("""{"k":null}"""), Seq("not json")))
    val out = ExpandJSON("j", Map("k" -> "k_out", "n" -> "n_out", "b" -> "b_out"),
      trueFalseValues = ("yes", "no"))(df)
    val rows = out.select("k_out", "n_out", "b_out").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // codegen path: decimals go through double ("1.50" → "1.5")
    assert(rows == Set(("v", "1.5", "yes"), (null, null, null)))
  }

  test("ExpandJSON root-array paths ([0].name) work in both modes") {
    // expand_json_test.go "more complex JMESPath expression"
    val df = strDf(Seq("j"), Seq(Seq("""[{"name": "name1"}, {"name": "name2"}]""")))
    for (verbatim <- Seq(false, true)) {
      val out = ExpandJSON("j", Map("[0].name" -> "f1", "[1].name" -> "f2"),
        verbatimNumbers = verbatim)(df)
      val r = out.select("f1", "f2").head()
      assert((r.getString(0), r.getString(1)) == ("name1", "name2"), s"verbatim=$verbatim")
    }
  }

  test("ExpandJSON verbatimNumbers keeps decimal text exact (UseNumber parity)") {
    val df = strDf(Seq("j"), Seq(
      Seq("""{"n":1.50,"big":12345678901234567890,"p":0.1000000000000000055,
             "nest":{"a":[10,20]},"b":false}"""),
      Seq("not json")))
    val out = ExpandJSON("j",
      Map("n" -> "n_out", "big" -> "big_out", "p" -> "p_out",
        "nest.a[1]" -> "a1", "b" -> "b_out"),
      verbatimNumbers = true)(df)
    val r = out.filter(col("n_out").isNotNull)
      .select("n_out", "big_out", "p_out", "a1", "b_out").head()
    assert(r.getString(0) == "1.50")
    assert(r.getString(1) == "12345678901234567890")
    assert(r.getString(2) == "0.1000000000000000055")
    assert(r.getString(3) == "20")
    assert(r.getString(4) == "false")
    assert(out.filter(col("n_out").isNull).count() == 1) // bad json → nulls, row kept
  }

  test("ExpandJSON: walker agrees with get_json_object on the shared subset (fuzz)") {
    // both modes must extract identically for dotted/indexed paths — the
    // codegen fast path uses get_json_object, the walker handles the wider
    // grammar; this guards the walker's base-grammar behavior
    val rnd = new scala.util.Random(1234)
    def v(depth: Int): String =
      if (depth >= 2 || rnd.nextInt(3) == 0) s""""s${rnd.nextInt(100)}""""
      else if (rnd.nextBoolean())
        (0 until 1 + rnd.nextInt(3)).map(_ => v(depth + 1)).mkString("[", ",", "]")
      else (0 until 1 + rnd.nextInt(3)).map(i => s""""k$i":${v(depth + 1)}""").mkString("{", ",", "}")
    val docs = (0 until 30).map(_ => s"""{"a":${v(0)},"b":${v(0)},"c":${v(0)}}""")
    val paths = Seq("a", "b.k0", "a[0]", "b[1].k0", "c.k1.k0", "a.k0[0]", "c[2]")
    val df = strDf(Seq("j"), docs.map(Seq(_)))
    val fast = ExpandJSON("j", paths.map(p => p -> s"o${paths.indexOf(p)}").toMap)(df)
    // force the walker by adding one advanced path, then drop it
    val walker = ExpandJSON("j",
      paths.map(p => p -> s"o${paths.indexOf(p)}").toMap + ("a | a" -> "z"))(df)
    val cols = paths.indices.map(i => s"o$i")
    val f = fast.select(cols.map(col): _*).collect().map(_.toSeq)
    val w = walker.select(cols.map(col): _*).collect().map(_.toSeq)
    for (((fr, wr), i) <- f.zip(w).zipWithIndex; (fv, wv) <- fr.zip(wr))
      assert(fv == wv, s"doc ${docs(i)}: fast=$fr walker=$wr")
  }

  test("ExpandJSON JMESPath pipes, slices, projections, join()") {
    val json =
      """{"people":[{"first":"James","last":"d"},{"first":"Jacob","last":"e"},
        |{"first":"Jayden","last":"f"},{"missing":"different"}],
        |"tags":["a","b","c","d","e"]}""".stripMargin.replace("\n", "")
    val df = strDf(Seq("j"), Seq(Seq(json)))
    val out = ExpandJSON("j", Map(
      "people[*].first" -> "firsts",          // list projection
      "people[:2].first" -> "first2",         // slice projection
      "people[*].first | [0]" -> "piped",     // pipe stops the projection
      "tags[1:4]" -> "midtags",               // plain slice
      "tags[::2]" -> "evens",                 // stepped slice
      "tags[-1]" -> "lasttag",                // negative index
      "join(', ', people[*].first)" -> "joined", // function
      "join(', ', people[*].last | [0])" -> "badjoin", // join on non-array → null
      "people[*].first | [0] | [0]" -> "overpipe"))(df) // index into a string → null
      .head()
    def g(n: String) = out.getString(out.fieldIndex(n))
    assert(g("firsts") == """["James","Jacob","Jayden"]""")
    assert(g("first2") == """["James","Jacob"]""")
    assert(g("piped") == "James")
    assert(g("midtags") == """["b","c","d"]""")
    assert(g("evens") == """["a","c","e"]""")
    assert(g("lasttag") == "e")
    assert(g("joined") == "James, Jacob, Jayden")
    assert(g("badjoin") == null)
    assert(g("overpipe") == null)
  }

  test("ExpandJSON: a LONE negative index routes to the walker, not the " +
      "get_json_object fast path") {
    // "tags[-1]" as the only mapping: nothing else marks the call advanced,
    // and get_json_object would return null for the negative index
    val df = strDf(Seq("j"), Seq(Seq("""{"tags":["a","b","c"]}""")))
    val out = ExpandJSON("j", Map("tags[-1]" -> "last"))(df).head()
    assert(out.getString(out.fieldIndex("last")) == "c")
  }

  test("ExpandJSON JMESPath object wildcard and flatten") {
    val json = """{"m":{"x":{"c":"1"},"y":{"c":"2"}},"n":[["a","b"],["c"],"d"]}"""
    val df = strDf(Seq("j"), Seq(Seq(json)))
    val out = ExpandJSON("j", Map(
      "m.*.c" -> "objstar",           // object-values projection
      "n[]" -> "flat",                // flatten one level
      "n[] | [0]" -> "flathead",      // pipe stops the projection
      "join('', m.*.c)" -> "joinedc"))(df).head()
    def g(n: String) = out.getString(out.fieldIndex(n))
    assert(g("objstar") == """["1","2"]""")
    assert(g("flat") == """["a","b","c","d"]""")
    assert(g("flathead") == "a")
    assert(g("joinedc") == "12")
  }

  test("ExpandJSON JMESPath filter expressions and function library") {
    val json =
      """{"machines":[{"name":"a","state":"running","cpu":2},
        |{"name":"b","state":"stopped","cpu":8},
        |{"name":"c","state":"running","cpu":4}],
        |"tags":["x","y","z"]}""".stripMargin.replace("\n", "")
    val df = strDf(Seq("j"), Seq(Seq(json)))
    val out = ExpandJSON("j", Map(
      "machines[?state == 'running'].name" -> "running",   // raw-string rhs
      "machines[?state == 'running'] | [0].name" -> "firstrun",
      "machines[?cpu > `2`].name" -> "bigcpu",              // json literal + ordering
      "machines[?cpu >= `2`] | [?state != 'stopped'].name" -> "chained",
      "machines[?state].name" -> "truthyall",               // bare truthiness
      "machines[?missing].name" -> "truthynone",            // absent key → none
      "machines[?'a' == name].name" -> "litlhs",            // literal on the left
      "length(machines)" -> "nmach",                        // function: array length
      "length(tags[0])" -> "taglen",                        // function: string length
      "length(machines[?state == 'running'])" -> "nrun",    // filter inside fn arg
      "sort_by(machines, &cpu)[0].name" -> "leastcpu",      // numeric sort + trailing path
      "sort_by(machines, &name) | [-1].name" -> "lastname", // string sort + pipe
      "to_string(machines[0].cpu)" -> "cpustr",
      "to_string(machines[0].name)" -> "namestr",           // already a string: unchanged
      "machines[?cpu == `99`].name" -> "empty"))(df)        // no matches → empty projection
      .head()
    def g(n: String) = out.getString(out.fieldIndex(n))
    assert(g("running") == """["a","c"]""")
    assert(g("firstrun") == "a")
    assert(g("bigcpu") == """["b","c"]""")
    assert(g("chained") == """["a","c"]""")
    assert(g("truthyall") == """["a","b","c"]""")
    assert(g("truthynone") == "[]")
    assert(g("litlhs") == """["a"]""")
    assert(g("nmach") == "3")
    assert(g("taglen") == "1")
    assert(g("nrun") == "2")
    assert(g("leastcpu") == "a")
    assert(g("lastname") == "c")
    assert(g("cpustr") == "2")
    assert(g("namestr") == "a")
    assert(g("empty") == "[]")
  }

  test("ExpandJSON JMESPath wider function library") {
    val json =
      """{"nums":[3,1,2],"names":["bob","amy"],"obj":{"b":"2","a":"1"},
        |"s":"hello","mixed":[1,"x"],"extra":{"a":"9","c":"3"}}"""
        .stripMargin.replace("\n", "")
    val df = strDf(Seq("j"), Seq(Seq(json)))
    val out = ExpandJSON("j", Map(
      "contains(names, 'amy')" -> "has_amy",
      "contains(names, 'zed')" -> "has_zed",
      "contains(s, 'ell')" -> "has_sub",
      "starts_with(s, 'he')" -> "sw",
      "ends_with(s, 'lo')" -> "ew",
      "keys(obj)" -> "ks",
      "values(obj)" -> "vs",
      "reverse(nums)" -> "rev",
      "reverse(s)" -> "revs",
      "min(nums)" -> "mn",
      "max(nums)" -> "mx",
      "max(names)" -> "mxs",
      "min(mixed)" -> "mixedmin",
      "abs(`-3.5`)" -> "ab",
      "ceil(`1.2`)" -> "ce",
      "floor(`1.8`)" -> "fl",
      "to_number(obj.a)" -> "tn",
      "to_number(s)" -> "tnbad",
      "not_null(obj.zzz, obj.a, obj.b)" -> "nn",
      "type(nums)" -> "ty1",
      "type(s)" -> "ty2",
      "merge(obj, extra).a" -> "merged",     // later object wins
      "sort_by(keys(obj), &@) | [0]" -> "firstkey"))(df) // fn-of-fn + &@ identity
      .head()
    def g(n: String) = out.getString(out.fieldIndex(n))
    assert(g("has_amy") == "true" && g("has_zed") == "false" && g("has_sub") == "true")
    assert(g("sw") == "true" && g("ew") == "true")
    assert(g("ks") == """["b","a"]""" && g("vs") == """["2","1"]""")
    assert(g("rev") == "[2,1,3]" && g("revs") == "olleh")
    assert(g("mn") == "1" && g("mx") == "3" && g("mxs") == "bob")
    assert(g("mixedmin") == null)   // mixed types: invalid
    assert(g("ab") == "3.5" && g("ce") == "2" && g("fl") == "1")
    assert(g("tn") == "1" && g("tnbad") == null)
    assert(g("nn") == "1")
    assert(g("ty1") == "array" && g("ty2") == "string")
    assert(g("merged") == "9")
    assert(g("firstkey") == "a")
  }

  test("ExternalMatch default drops matches; keepOnMatch keeps only them") {
    val df = strDf(Seq("a"), Seq(Seq("x"), Seq("y"), Seq("z")))
    val set = strDf(Seq("v"), Seq(Seq("x"), Seq("y")))
    assert(col1[String](ExternalMatch("a", set)(df)) == Seq("z"))
    assert(col1[String](ExternalMatch("a", set, keepOnMatch = true)(df).orderBy("a"))
      == Seq("x", "y"))
  }

  test("ReplaceFields copies src→dst and sets literals; dup dst rejected") {
    val df = strDf(Seq("a", "b"), Seq(Seq("1", "2")))
    val out = ReplaceFields(copies = Seq("a" -> "b"), literals = Seq("L" -> "c"))(df)
    val r = out.select("a", "b", "c").head()
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("1", "1", "L"))
    assertThrows[IllegalArgumentException] {
      ReplaceFields(copies = Seq("a" -> "x"), literals = Seq("L" -> "x"))(df)
    }
  }

  test("PartialClone keeps listed fields, nulls the rest") {
    val df = strDf(Seq("a", "b"), Seq(Seq("1", "2")))
    val r = PartialClone(Seq("a"))(df).head()
    assert(r.getString(0) == "1" && r.isNullAt(1))
  }

  test("Hash computes md5/sha256 hex; null src dropped") {
    val df = strDf(Seq("a"), Seq(Seq("hello"), Seq(null)))
    val out = Hash("a", "h", "md5")(df)
    assert(col1[String](out.select("h")) == Seq("5d41402abc4b2a76b9719d911017c592"))
    val sha = Hash("a", "h", "sha256")(df)
    assert(col1[String](sha.select("h"))
      == Seq("2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"))
    assertThrows[IllegalArgumentException](Hash("a", "h", "crc32")(df))
  }

  test("FormatTime reformats; parse failure clears dst but KEEPS the row") {
    val df = strDf(Seq("t"), Seq(Seq("2024-03-05 10:00:00"), Seq("garbage")))
    val out = FormatTime("t", "d", "yyyy-MM-dd HH:mm:ss", "yyyy/MM/dd")(df)
    val rows = out.select("d").collect().map(r => Option(r.getString(0))).toSet
    assert(rows == Set(Some("2024/03/05"), None))
    assert(out.count() == 2)
  }

  test("FormatTime custom GO layouts translate (format_time_test.go fixtures)") {
    // reference "custom format dst": unix 932183424 → "Jul-17-1999_03:50:24"
    val df = strDf(Seq("t"), Seq(Seq("932183424")))
    val dst = FormatTime("t", "d", "unix", "Jan-02-2006_15:04:05")(df)
      .select("d").head().getString(0)
    assert(dst == "Jul-17-1999_03:50:24")
    // reference "custom format src": parse a Go-layout source back to unixms
    val df2 = strDf(Seq("t"), Seq(Seq("Jul-17-1999_03:50:24")))
    val ms = FormatTime("t", "d", "Jan-02-2006_15:04:05", "unixms")(df2)
      .select("d").head().getString(0)
    assert(ms == "932183424000") // reference "default format" want
    // token translation unit checks
    assert(graft.operators.Filters.FormatTime
      .translateGoLayout("Mon Jan 2 15:04:05 MST 2006")
      == "EEE MMM d HH:mm:ss zzz yyyy")
    assert(graft.operators.Filters.FormatTime
      .translateGoLayout("2006-01-02T15:04:05Z07:00")
      == "yyyy-MM-dd'T'HH:mm:ssXXX")
  }

  test("FormatTime unix epoch variants") {
    val df = strDf(Seq("t"), Seq(Seq("1700000000")))
    val ms = FormatTime("t", "d", "unix", "unixms")(df).select("d").head().getString(0)
    assert(ms == "1700000000000")
    val fmt = FormatTime("t", "d", "unix", "yyyy-MM-dd")(df).select("d").head().getString(0)
    assert(fmt == "2023-11-14")
  }

  test("URLEscape encode/decode roundtrip; bad decode clears dst, keeps row") {
    val df = strDf(Seq("a"), Seq(Seq("a b&c=d"), Seq("x")))
    val enc = URLEscape("a", "e")(df)
    assert(col1[String](enc.select("e").orderBy("e")) == Seq("a+b%26c%3Dd", "x"))
    val round = URLEscape("e", "back", decode = true)(enc)
    assert(round.filter(col("back") === col("a")).count() == 2)
    val bad = URLEscape("a", "d", decode = true)(strDf(Seq("a"), Seq(Seq("%zz"))))
    assert(bad.count() == 1 && bad.select("d").head().isNullAt(0))
  }

  test("URLParam extracts query param; missing/bad → empty string") {
    val df = strDf(Seq("u"), Seq(
      Seq("https://x.test/p?k=v&o=1"), Seq("https://x.test/p?o=1"), Seq("::bad::")))
    assert(col1[String](URLParam("u", "p", "k")(df).select("p").orderBy("p"))
      == Seq("", "", "v"))
  }

  test("URLParam accepts relative URLs, like Go's url.Parse (url_param_test.go)") {
    // the reference's own fixtures: "partial url" extracts; a non-URL
    // token and a missing param yield ""
    val df = strDf(Seq("u"), Seq(
      Seq("/home?parameter_a=value_a"), Seq("s0"),
      Seq("https://app.example.com/?parameter_a=value_a")))
    val out = URLParam("u", "p", "parameter_a")(df)
      .select("u", "p").collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(out("/home?parameter_a=value_a") == "value_a")
    assert(out("s0") == "")
    assert(out("https://app.example.com/?parameter_a=value_a") == "value_a")
    val missing = URLParam("u", "p", "not_parameter_a")(df)
      .select("p").collect().map(_.getString(0))
    assert(missing.forall(_ == ""))
  }

  test("URLParam: relative URL embedding an absolute URL in a query value " +
      "still parses") {
    // "://" mid-value must not classify the whole thing as absolute —
    // Go's url.Parse extracts to=http://x from this relative URL
    val df = strDf(Seq("u"), Seq(Seq("/redirect?to=http://x&k=v")))
    assert(col1[String](URLParam("u", "p", "to")(df).select("p"))
      == Seq("http://x"))
    assert(col1[String](URLParam("u", "p", "k")(df).select("p")) == Seq("v"))
  }

  test("SetStringFromURL: first configured literal wins; no match drops row") {
    val df = strDf(Seq("id", "u"), Seq(
      Seq("1", "/data/src1/file"), Seq("2", "/data/src3/src1/x"), Seq("3", "/other")))
    val out = graft.operators.Filters.SetStringFromURL
      .fromColumn(df, "tag", col("u"), Seq("src1", "src3"))
    val rows = out.select("id", "tag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(rows == Set(("1", "src1"), ("2", "src1"))) // config order, not position
  }

  test("Timestamp sets processing-time epoch seconds") {
    val df = strDf(Seq("a"), Seq(Seq("x")))
    val v = Timestamp("ts")(df).select("ts").head().getString(0).toLong
    assert(math.abs(v - System.currentTimeMillis() / 1000) < 300)
  }

  test("CountAndTag tags empty values with the default") {
    val df = strDf(Seq("t"), Seq(Seq("a"), Seq("a"), Seq(""), Seq(null)))
    val rows = CountAndTag("t", "m").tagCounts(df).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rows == Map("a" -> 2L, "__nil__" -> 2L))
  }

  test("MetadataUrl/MetadataLastModified read file metadata from a scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-meta").toFile
    try {
      val p = new java.io.File(dir, "part.csv")
      java.nio.file.Files.writeString(p.toPath, "v1\nv2\n")
      val df = spark.read.schema("a STRING").csv(dir.getAbsolutePath)
      val urls = col1[String](MetadataUrl("u")(df).select("u"))
      assert(urls.size == 2 && urls.forall(_.endsWith("part.csv")))
      val mts = col1[String](MetadataLastModified("m")(df).select("m"))
      assert(mts.forall(_.toLong > 1600000000L))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}
