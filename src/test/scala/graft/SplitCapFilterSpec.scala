package graft

import java.io.File
import java.nio.file.Files

import graft.topology.{BuiltinComponents, Topology}

/** The AssignSplit / DomainCap TOML filters — the curation split and
  * per-domain cap exposed on the config surface.
  */
class SplitCapFilterSpec extends SparkSpec {

  private def runToml(rows: Seq[String], fields: Seq[String], filters: String,
      out: Seq[String]): Seq[org.apache.spark.sql.Row] = {
    val dir = Files.createTempDirectory("graft-splitcap").toFile
    val data = new File(dir, "in.csv")
    Files.write(data.toPath, scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava)
    val toml =
      s"""[csv]
         |field_separator = 59
         |[fields]
         |names = [${fields.map("\"" + _ + "\"").mkString(", ")}]
         |[input]
         |name = "List"
         |  [input.config]
         |  Files = ["$data"]
         |  MatchPath = ".*\\\\.csv"
         |$filters
         |[output]
         |name = "Recorder"
         |fields = [${out.map("\"" + _ + "\"").mkString(", ")}]
         |""".stripMargin
    Topology.compileToml(spark, toml).run()
    BuiltinComponents.Recorder.last
  }

  test("AssignSplit labels records deterministically and matches Mix.assignSplits") {
    import org.apache.spark.sql.functions._
    val rows = (0 until 40).map(i => s"$i;doc$i;")
    val got = runToml(rows, Seq("id", "text", "split"),
      """[[filter]]
        |name = "AssignSplit"
        |  [filter.config]
        |  KeyField = "id"
        |  Seed = "r9"
        |  Splits = "train:0.8,valid:0.1,test:0.1"
        |  DstField = "split"""".stripMargin,
      Seq("id", "split"))
      .map(r => r.getString(0) -> r.getString(1)).toMap
    // same assignment as the library call on the same key strings
    import spark.implicits._
    val expect = graft.llm.Mix.assignSplits(
        (0 until 40).map(_.toString).toDF("id"), col("id"), "r9",
        Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == expect)
    assert(got.values.toSet.subsetOf(Set("train", "valid", "test")))
  }

  test("SentenceChunk explodes records into sentences with sibling fields intact") {
    val rows = Seq("1;en;One two. Three! Done", "2;fr;")
    val got = runToml(rows, Seq("id", "lang", "text", "sentence_ix"),
      """[[filter]]
        |name = "SentenceChunk"
        |  [filter.config]
        |  Field = "text"""".stripMargin,
      Seq("id", "lang", "text", "sentence_ix"))
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(got == Seq(
      ("1", "en", "One two.", "0"), ("1", "en", "Three!", "1"),
      ("1", "en", "Done", "2")))
    // the empty doc explodes to zero sentences, like ChunkText's contract
  }

  test("ChunkText explodes records into overlapping chunks with sibling fields intact") {
    val rows = Seq("1;en;a b c d e f g", "2;fr;")
    val got = runToml(rows, Seq("id", "lang", "text", "chunk_ix"),
      """[[filter]]
        |name = "ChunkText"
        |  [filter.config]
        |  Field = "text"
        |  Width = 4
        |  Overlap = 1
        |  IndexField = "chunk_ix"""".stripMargin,
      Seq("id", "lang", "text", "chunk_ix"))
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
    // stride 3: starts 0,3,6 → "a b c d","d e f g","g"? start 6: 7 > 6+1 ⇒
    // dropped (g already covered by the previous chunk)
    assert(got == Seq(
      ("1", "en", "a b c d", "0"),
      ("1", "en", "d e f g", "1")))
  }

  test("DomainCap keeps N per group, rank-field order, ties by id") {
    val rows = Seq(
      "1;a;50", "2;a;10", "3;a;30", // group a: ranks 10,30,50 → keep ids 2,3
      "4;b;99",                     // group b under cap
      "5;c;20", "6;c;20")           // equal ranks: id order keeps 5,6 (cap 2)
    val got = runToml(rows, Seq("id", "host", "rank"),
      """[[filter]]
        |name = "DomainCap"
        |  [filter.config]
        |  GroupField = "host"
        |  IdField = "id"
        |  RankField = "rank"
        |  N = 2""".stripMargin,
      Seq("id"))
      .map(_.getString(0)).sorted
    assert(got == Seq("2", "3", "4", "5", "6"))
  }

  test("SidecarJoin fills declared fields from an id-keyed parquet " +
      "sidecar; absent rows get ''; composes with QuantileFilter") {
    import spark.implicits._
    val sideDir = Files.createTempDirectory("graft-sidecar").toFile
    // a tagger job's sidecar: (doc_id, score) — doc 5 untagged
    (1 to 10).filter(_ != 5).map(i => (i.toLong, i / 10.0))
      .toDF("doc_id", "score")
      .write.mode("overwrite").parquet(s"$sideDir/attrs")
    val rows = (1 to 10).map(i => s"$i;doc text $i;")
    val got = runToml(rows, Seq("id", "text", "score"),
      s"""[[filter]]
         |name = "SidecarJoin"
         |  [filter.config]
         |  Path = "$sideDir/attrs"
         |  IdField = "id"
         |  SidecarKey = "doc_id"
         |  Fields = ["score"]""".stripMargin,
      Seq("id", "score"))
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got("3") == "0.3" && got("10") == "1.0")
    assert(got("5") == "", "untagged record must get ''")
    // the mixed-in score drives a data-derived gate in the SAME topology
    val rows2 = (1 to 10).map(i => s"$i;doc text $i;;g")
    val got2 = runToml(rows2, Seq("id", "text", "score", "grp"),
      s"""[[filter]]
         |name = "SidecarJoin"
         |  [filter.config]
         |  Path = "$sideDir/attrs"
         |  IdField = "id"
         |  SidecarKey = "doc_id"
         |  Fields = ["score"]
         |[[filter]]
         |name = "QuantileFilter"
         |  [filter.config]
         |  GroupField = "grp"
         |  ScoreField = "score"
         |  Drop = 0.5""".stripMargin,
      Seq("id"))
      .map(_.getString(0)).map(_.toInt).sorted
    // 9 scored docs (doc 5's '' casts to null and is excluded): drop
    // fraction 0.5 → rank demand cum ≥ ⌈4.5⌉ = 5 → the 5th smallest of
    // {0.1..0.4, 0.6..1.0} is 0.6 → keep strictly above → ids 7..10
    assert(got2 == Seq(7, 8, 9, 10), s"got $got2")
  }

  test("SidecarJoin guards: duplicate sidecar keys fail loudly; sidecar " +
      "columns resolve case-insensitively; a typo'd IdField is named") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-sidecar-guards").toFile
    // column case differs from the config's — must still resolve
    Seq((1L, 0.9), (2L, 0.1)).toDF("Doc_Id", "Score")
      .write.mode("overwrite").parquet(s"$dir/cased")
    val rows = Seq("1;t1;", "2;t2;")
    def toml(path: String, idField: String = "id") =
      s"""[[filter]]
         |name = "SidecarJoin"
         |  [filter.config]
         |  Path = "$path"
         |  IdField = "$idField"
         |  SidecarKey = "doc_id"
         |  Fields = ["score"]""".stripMargin
    val got = runToml(rows, Seq("id", "text", "score"), toml(s"$dir/cased"),
      Seq("id", "score")).map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("1" -> "0.9", "2" -> "0.1"))
    // a re-run tagger appended a second row for doc 1 → loud failure,
    // never a silent record multiplication
    Seq((1L, 0.5)).toDF("Doc_Id", "Score")
      .write.mode("append").parquet(s"$dir/cased")
    val dup = intercept[Exception](
      runToml(rows, Seq("id", "text", "score"), toml(s"$dir/cased"),
        Seq("id", "score")))
    assert(dup.getMessage.contains("duplicate keys"), dup.getMessage)
    // an IdField that is not a declared [fields] name is named in the error
    val typo = intercept[Exception](
      runToml(rows, Seq("id", "text", "score"),
        toml(s"$dir/cased", idField = "doc"), Seq("id", "score")))
    assert(typo.getMessage.contains("not declared") &&
      typo.getMessage.contains("doc"), typo.getMessage)
  }

  test("QuantileFilter drops the bottom fraction per group with a " +
      "data-derived cut, matching Mix.quantileFilter") {
    // group a: scores 0.1..1.0 (n=10, drop 0.6 → threshold 0.6):
    // keep 0.7..1.0; group b: 0.5,0.5,0.5,0.9 → threshold 0.5, keep 0.9
    val rows = (1 to 10).map(i => f"a$i;a;${i / 10.0}%.1f") ++
      Seq("b1;b;0.5", "b2;b;0.5", "b3;b;0.5", "b4;b;0.9")
    val got = runToml(rows, Seq("id", "grp", "score"),
      """[[filter]]
        |name = "QuantileFilter"
        |  [filter.config]
        |  GroupField = "grp"
        |  ScoreField = "score"
        |  Drop = 0.6""".stripMargin,
      Seq("id"))
      .map(_.getString(0)).sorted
    assert(got == Seq("a10", "a7", "a8", "a9", "b4"), s"got $got")
  }

  test("QuantileFilter: a non-numeric score is a loud data error, not a " +
      "silent drop; '' (the record model's empty) drops quietly") {
    val toml =
      """[[filter]]
        |name = "QuantileFilter"
        |  [filter.config]
        |  GroupField = "grp"
        |  ScoreField = "score"
        |  Drop = 0.5""".stripMargin
    val e = intercept[Exception](
      runToml(Seq("a1;a;0.4", "a2;a;oops", "a3;a;0.9"),
        Seq("id", "grp", "score"), toml, Seq("id")))
    def chain(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8)
        .flatMap(x => Option(x.getMessage)).toSeq
    assert(chain(e).exists(_.contains("non-numeric")), chain(e).mkString(" | "))
    // empty = absent: excluded from the distribution and dropped quietly
    val got = runToml(Seq("a1;a;0.1", "a2;a;", "a3;a;0.9", "a4;a;0.5"),
        Seq("id", "grp", "score"), toml, Seq("id"))
      .map(_.getString(0)).sorted
    assert(got == Seq("a3"), s"got $got")
  }
}
