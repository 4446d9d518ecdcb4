package graft.topology

import org.apache.spark.TaskContext
import org.apache.spark.sql.Row

/** DynamoDB-style sink: per-partition batched writes with in-batch
  * primary-key dedup, multi-region fan-out and rate limiting —
  * reference: output/dyndb.go:20-31 (spec), :307-364 (push/dedup),
  * :366-390 (flush), batch size 25 (dyndb.go:33).
  *
  * Zero-egress double: each flushed batch becomes one JSON-lines file of
  * DynamoDB-typed items under LocalDir/<region>/<table>/ — the real AWS SDK
  * BatchWriteItem call is a drop-in replacement at the flush() seam. All
  * batching/dedup/pacing logic is the real, partition-local code path
  * (`foreachPartition`), which is exactly how the AWS writer would run on a
  * cluster: no driver involvement, no collect.
  */
object DynamoOutput {

  val batchSize = 25 // BatchWriteItem hard limit (dyndb.go:33)

  val desc: OutputDesc = OutputDesc(
    "DynamoDB",
    "Writes records to DynamoDB-style storage in batches of 25 with " +
      "in-batch primary-key dedup, multi-region fan-out and rate limiting " +
      "(local JSONL double in this build).",
    Seq(
      ConfigKey("Table", "destination table name", required = true),
      ConfigKey("Columns", "typed columns: 'n:field' (number) or 's:field' (string); " +
        "the first is the primary key", required = true),
      ConfigKey("Regions", "regions to fan out to", default = Some(Seq("us-west-2"))),
      ConfigKey("LocalDir", "root dir of the local double", required = true),
      ConfigKey("MaxWritesPerSec", "per-partition write rate limit (0 = unlimited)",
        default = Some(0L)),
      ConfigKey("FlushInterval", "accepted for parity (batch flush is size-driven)"),
      ConfigKey("MaxBackoff", "accepted for parity")),
    raw = false,
    (ctx, cfg, df) => {
      val table = cfg.str("Table")
      val columns = cfg.strList("Columns").map { spec =>
        val Array(t, name) = spec.split(":", 2)
        require(t == "n" || t == "s", s"DynamoDB: bad column spec '$spec'")
        (t, name)
      }
      val regions = cfg.strList("Regions", Seq("us-west-2"))
      val localDir = cfg.str("LocalDir")
      val maxRate = cfg.int("MaxWritesPerSec", 0L)
      val fieldNames = columns.map(_._2)
      val data = df.select(fieldNames.map(org.apache.spark.sql.functions.col): _*)
      val counter = ctx.spark.sparkContext.longAccumulator("dynamodb_written")

      data.foreachPartition { (rows: Iterator[Row]) =>
        val pid = TaskContext.getPartitionId()
        var batchNo = 0
        var lastFlushNanos = System.nanoTime()
        def flush(batch: Seq[Row]): Unit = if (batch.nonEmpty) {
          // in-batch primary-key dedup, LAST write wins (dyndb.go:307-364)
          val deduped = batch.foldLeft(Vector.empty[Row] -> Set.empty[String]) {
            case ((acc, seen), r) =>
              val pk = String.valueOf(r.get(0))
              if (seen(pk)) (acc.filterNot(x => String.valueOf(x.get(0)) == pk) :+ r, seen)
              else (acc :+ r, seen + pk)
          }._1
          writeBatch(deduped, batchNo)
          batchNo += 1
          if (maxRate > 0) {
            // token pacing: one batch per (batchSize/maxRate) seconds
            val minNanos = (batchSize.toLong * 1000000000L) / maxRate
            val elapsed = System.nanoTime() - lastFlushNanos
            if (elapsed < minNanos)
              Thread.sleep((minNanos - elapsed) / 1000000)
            lastFlushNanos = System.nanoTime()
          }
        }
        def writeBatch(deduped: Seq[Row], n: Int): Unit = {
          def esc(s: String) = s.flatMap {
            case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
            case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
          }
          val lines = deduped.map { r =>
            columns.zipWithIndex.map { case ((t, name), i) =>
              val v = Option(r.get(i)).map(_.toString).getOrElse("")
              val tt = if (t == "n") "N" else "S"
              s""""${esc(name)}":{"$tt":"${esc(v)}"}"""
            }.mkString("{", ",", "}")
          }.mkString("", "\n", "\n")
          for (region <- regions) {
            val dir = new java.io.File(s"$localDir/$region/$table")
            dir.mkdirs()
            java.nio.file.Files.writeString(
              new java.io.File(dir, f"batch-$pid%05d-$n%06d.jsonl").toPath, lines)
          }
          counter.add(deduped.size)
        }
        rows.grouped(batchSize).foreach(g => flush(g.toSeq))
      }
      OutputResult(Nil, counter.value)
    },
  )
}
