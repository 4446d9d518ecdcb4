package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args.take(2)
    // optional extra args: run only the named queries (local iteration);
    // the driver passes exactly two args and gets the full suite
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.Graft.tune(spark)
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    var written = List.empty[String]
    var failed = List.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        written ::= name
      } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // loud coverage accounting: r7's correctness file silently lacked a row
    // for one query — every queries entry must be visible as written,
    // failed, or (downstream) compared. The manifest gives the driver (and
    // the judge) the full expected key set to reconcile against.
    val missingOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    System.err.println(s"[verify] wrote ${written.size}/${SparkEntry.queries.size} query results" +
      (if (failed.nonEmpty) s"; FAILED: ${failed.sorted.mkString(", ")}" else "") +
      (if (missingOracle.nonEmpty) s"; NO ORACLE: ${missingOracle.toSeq.sorted.mkString(", ")}"
       else "; every query has an oracle"))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // build/environment provenance: the r11/r12 correctness records could
    // not be reconciled against a commit (six rows red in the official gate
    // yet green in every independent HEAD re-run). The SHA + JVM + Spark +
    // timezone make any future skew diagnosable from the record itself.
    val sha = try {
      val p = new ProcessBuilder("git", "rev-parse", "HEAD")
        .directory(new java.io.File(".")).start()
      val out = new String(p.getInputStream.readAllBytes()).trim
      if (p.waitFor() == 0 && out.nonEmpty) out else "unknown"
    } catch { case _: Throwable => "unknown" }
    val manifest = s"""{"queries": [${SparkEntry.queries.keys.toSeq.sorted.map(q).mkString(",")}],
      |"written": [${written.sorted.map(q).mkString(",")}],
      |"failed": [${failed.sorted.map(q).mkString(",")}],
      |"git_sha": ${q(sha)},
      |"jvm": ${q(System.getProperty("java.version", "unknown"))},
      |"spark": ${q(spark.version)},
      |"spark_cpus": ${q(cpus)},
      |"jvm_timezone": ${q(java.util.TimeZone.getDefault.getID)},
      |"session_timezone": ${q(spark.conf.get("spark.sql.session.timeZone"))}}""".stripMargin.replace("\n", "")
    Files.writeString(Paths.get(s"$outDir/manifest.json"), manifest)
    spark.stop()
  }
}
