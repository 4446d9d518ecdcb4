package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.sources.ZstdCodec
import graft.topology._

/** Daemon-mode topologies (reference: api.go:58-66 — an input whose Run
  * never returns makes the whole topology a daemon). Spark mapping:
  * Structured Streaming sources, the SAME filter-chain compilation (the
  * operators are plan transforms, batch/stream agnostic), and
  * `foreachBatch` reusing the batch output descriptors — so each
  * micro-batch behaves like one reference "rotation": files written, then
  * uploaded (topology.go:186-202), with the trigger interval playing
  * RotateInterval's role.
  *
  * Zero-egress doubles (SURVEY §7.3): the queue/stream services are bound
  * to their OSS-reproducible semantics — SQS S3-notifications ≙ file-watch
  * source (new files appear, each processed exactly once per checkpoint,
  * at-least-once overall), Kinesis/KCL ≙ the same with Spark checkpoints
  * standing in for DynamoDB lease checkpoints (input/kcl.go:278-302), TCP ≙
  * the socket source.
  */
object Streaming {

  private def allStringSchema(fields: Seq[String]): StructType =
    StructType(fields.map(StructField(_, StringType, nullable = true)))

  /** SQS — file-notification input: watches a path for new CSV files.
    * reference: input/sqs.go:25-89 (S3 paths arriving via SQS messages).
    */
  val sqsInput: InputDesc = InputDesc(
    "SQS",
    "Daemon input: watches a directory for newly arriving CSV files " +
      "(file-notification semantics; SQS+S3-events double).",
    Seq(
      ConfigKey("QueuePath", "directory watched for new files", required = true),
      ConfigKey("MessageFormat", "accepted for parity (plain/sns/s3::ObjectCreated)",
        default = Some("plain")),
      ConfigKey("MaxFilesPerTrigger", "files per micro-batch", default = Some(16L)),
      ConfigKey("FilePattern", "glob for files in QueuePath", default = Some("*"))),
    (ctx, cfg) => {
      ZstdCodec.register(ctx.spark)
      ctx.spark.readStream
        .schema(allStringSchema(ctx.fields))
        .option("sep", ctx.separator)
        .option("quote", "\u0000")
        .option("maxFilesPerTrigger", cfg.int("MaxFilesPerTrigger", 16L))
        .option("pathGlobFilter", cfg.str("FilePattern", "*"))
        .csv(cfg.str("QueuePath"))
    },
  )

  /** KCL/Kinesis — stream doubles: same file-watch source; Spark
    * checkpointing supplies the lease/checkpoint semantics
    * (reference: input/kcl.go:26-49, input/kinesis.go:20-44).
    */
  val kclInput: InputDesc = InputDesc(
    "KCL",
    "Daemon input: Kinesis-via-KCL semantics (checkpointed resumable " +
      "consumption); bound to a file-watch double in this build.",
    Seq(
      ConfigKey("StreamPath", "directory standing in for the Kinesis stream", required = true),
      ConfigKey("AppName", "checkpoint namespace", default = Some("graft")),
      ConfigKey("InitialPosition", "LATEST or TRIM_HORIZON (parity; file source reads all)",
        default = Some("LATEST")),
      ConfigKey("MaxShardsPerTrigger", "files per micro-batch", default = Some(16L))),
    (ctx, cfg) => {
      ctx.spark.readStream
        .schema(allStringSchema(ctx.fields))
        .option("sep", ctx.separator)
        .option("quote", "\u0000")
        .option("maxFilesPerTrigger", cfg.int("MaxShardsPerTrigger", 16L))
        .csv(cfg.str("StreamPath"))
    },
  )

  val kinesisInput: InputDesc = kclInput.copy(
    name = "Kinesis",
    help = "Daemon input: raw Kinesis semantics; file-watch double in this build.")

  /** TCP — socket listener input (reference: input/tcp.go:20-47; the
    * reference gunzips each connection — the socket source is plain text,
    * divergence documented).
    */
  val tcpInput: InputDesc = InputDesc(
    "TCP",
    "Daemon input: TCP listener; each line is one CSV record (plain text, " +
      "no gzip framing).",
    Seq(
      ConfigKey("Host", "bind host", default = Some("localhost")),
      ConfigKey("Port", "listen port", default = Some(6000L))),
    (ctx, cfg) => {
      val lines = ctx.spark.readStream
        .format("socket")
        .option("host", cfg.str("Host", "localhost"))
        .option("port", cfg.int("Port", 6000L))
        .load()
      val parts = split(col("value"), java.util.regex.Pattern.quote(ctx.separator), -1)
      lines.select(ctx.fields.zipWithIndex.map { case (f, i) =>
        when(try_element_at(parts, lit(i + 1)) === "", null)
          .otherwise(try_element_at(parts, lit(i + 1))).as(f)
      }: _*)
    },
  )

  def streamingInputs: Seq[InputDesc] = Seq(sqsInput, kclInput, kinesisInput, tcpInput)

  /** Builtin registry + daemon inputs. The streaming variants come FIRST:
    * registry lookup is find-first, so in daemon mode SQS/KCL/Kinesis/TCP
    * resolve to the readStream doubles, while batch topologies (compiled
    * against BuiltinComponents.all directly) get the batch doubles of the
    * same names.
    */
  def componentsWithStreaming: Components =
    Components(inputs = streamingInputs) ++ BuiltinComponents.all

  /** A started daemon topology. */
  final case class Daemon(query: StreamingQuery, recordCount: () => Long) {
    def awaitTermination(): Unit = query.awaitTermination()
    def processAllAvailable(): Unit = query.processAllAvailable()
    def stop(): Unit = query.stop()
  }

  /** Compile a daemon topology and start it. The filter chain/projection
    * compile identically to batch; output+upload run per micro-batch via
    * foreachBatch (batch descriptors unchanged — reference outputs can't
    * tell rotation from restart either).
    *
    * @param triggerMs micro-batch interval ≈ FileWriter RotateInterval
    *                  (output/filewriter.go RotateInterval default 60s)
    */
  def runDaemon(spark: org.apache.spark.sql.SparkSession, toml: String,
      checkpointDir: String, triggerMs: Long = 1000,
      env: Map[String, String] = sys.env): Daemon = {
    val cfg = Topology.configFromToml(Toml.parse(toml, env))
    val components = componentsWithStreaming
    val compiled = Topology.compile(spark, cfg, components)
    start(compiled, checkpointDir, triggerMs)
  }

  /** Start an already-compiled daemon topology. */
  def start(compiled: Topology.Compiled, checkpointDir: String,
      triggerMs: Long = 1000): Daemon = {
    val cfg = compiled.cfg
    val components = compiled.components
    require(compiled.projected.isStreaming,
      s"runDaemon: input '${cfg.input._1}' is not a streaming source")
    val outDesc = components.output(cfg.outputName)
    cfg.outputConfig.validate(outDesc.keys)
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    val query = compiled.projected.writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerMs))
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one micro-batch = one rotation: write files, then upload them.
        // {{.Rotation}} expands to the batch id (monotonic across restarts,
        // like the reference's per-file rotation counter)
        val batchCfg = cfg.outputConfig.raw.find(_._1.equalsIgnoreCase("PathString")) match {
          case Some((k, v: String)) => ComponentConfig(
            cfg.outputConfig.raw.updated(k, v.replace("{{.Rotation}}", batchId.toString)),
            cfg.outputConfig.componentName)
          case _ => cfg.outputConfig
        }
        val result = outDesc.build(compiled.ctx, batchCfg, batch)
        counter.addAndGet(result.rows)
        for ((name, upCfg) <- cfg.upload) {
          val upDesc = components.upload(name)
          upCfg.validate(upDesc.keys)
          upDesc.build(compiled.ctx, upCfg, result.paths)
        }
        ()
      }
      .start()
    Daemon(query, () => counter.get())
  }
}
