package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

class StreamOpsSpec extends AnyFunSuite {
  import spark.implicits._

  private def runOnce(out: String, chk: String)(df: DataFrame): Unit = {
    val q = df.writeStream.outputMode("append")
      .format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("native session_window closes sessions once the watermark passes") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sw").toString
    def stream = spark.readStream
      .schema("user_id LONG, sec LONG, value DOUBLE")
      .parquet(s"$tmp/in")
    def run(): Unit = runOnce(s"$tmp/out", s"$tmp/chk")(
      StreamOps.sessionAgg(stream, "user_id", "sec",
        gap = "30 seconds", watermarkDelay = "10 seconds"))

    // batch 1: user 1 events at 100 and 110 (one session, ends 140);
    // user 2 far ahead at 10000 pushes the watermark past 140 at the
    // NEXT batch (watermark advances on batch boundaries)
    Seq((1L, 100L, 1.0), (1L, 110L, 2.0), (2L, 10000L, 9.0))
      .toDF("user_id", "sec", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/in")
    run()
    // batch 2: any new data triggers a batch that emits user 1's session
    Seq((3L, 20000L, 1.0)).toDF("user_id", "sec", "value").coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    run()

    val out = spark.read.parquet(s"$tmp/out")
      .select("user_id", "session_start", "session_end", "n_events", "value_sum")
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    // run 2 processes the 20000 event, advances the watermark to 19990
    // and (AvailableNow's trailing flush batch) emits every session the
    // new watermark passed: user 1's merged session AND user 2's.
    // User 3's (ends 20030) is beyond the watermark and stays open.
    assert(out.toSeq == Seq(
      (1L, 100L, 140L, 2L, 3.0),
      (2L, 10000L, 10030L, 1L, 9.0)),
      s"unexpected closed-session set: ${out.mkString("; ")}")
  }

  test("session_window watermark boundary: a session ending EXACTLY at the watermark is emitted") {
    // pins the emission predicate the q99 oracle replays as
    // `session_end <= watermark`: gap 30 + watermark 10, user 1's
    // session is [100, 130); the far event at 140 advances the
    // watermark to exactly 130. If Spark's predicate were strict (<),
    // this session would stay open and the oracle would need `<`.
    val tmp = java.nio.file.Files.createTempDirectory("graft-swb").toString
    Seq((1L, 100L, 1.0), (2L, 140L, 9.0))
      .toDF("user_id", "sec", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/in")
    def stream = spark.readStream
      .schema("user_id LONG, sec LONG, value DOUBLE")
      .parquet(s"$tmp/in")
    runOnce(s"$tmp/out", s"$tmp/chk")(
      StreamOps.sessionAgg(stream, "user_id", "sec",
        gap = "30 seconds", watermarkDelay = "10 seconds"))
    val out = spark.read.parquet(s"$tmp/out")
      .select("user_id", "session_start", "session_end")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 100L, 130L)),
      s"expected the end==watermark session emitted, got: $out")
  }

  test("session_window gap boundary: an event EXACTLY gap seconds after the last one merges") {
    // the second predicate the q99 oracle replays: Spark merges
    // TOUCHING windows ([100,130) + [130,160) -> one session
    // [100,160)), so the gaps-and-islands break condition is
    // `diff > gap`, not `>=`. Found the hard way: sf0.1 has exactly
    // one user with consecutive events 21600s apart and the `>=`
    // oracle came out one session high.
    val tmp = java.nio.file.Files.createTempDirectory("graft-sgb").toString
    Seq((1L, 100L, 1.0), (1L, 130L, 2.0), (2L, 10000L, 9.0))
      .toDF("user_id", "sec", "value").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/in")
    def stream = spark.readStream
      .schema("user_id LONG, sec LONG, value DOUBLE")
      .parquet(s"$tmp/in")
    runOnce(s"$tmp/out", s"$tmp/chk")(
      StreamOps.sessionAgg(stream, "user_id", "sec",
        gap = "30 seconds", watermarkDelay = "10 seconds"))
    val out = spark.read.parquet(s"$tmp/out")
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 100L, 160L, 2L)),
      s"expected one merged session [100,160) with 2 events, got: $out")
  }

  test("stream-stream interval join attributes clicks within the delay bound") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssj").toString
    Seq((10L, 7L, 1000L), (11L, 7L, 2000L), (12L, 8L, 3000L))
      .toDF("imp_id", "user_id", "imp_sec").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/imp")
    Seq((10L, 1030L), (11L, 2500L), (12L, 2990L))
      .toDF("clk_imp_id", "clk_sec").coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/clk")
    val imp = spark.readStream.schema("imp_id LONG, user_id LONG, imp_sec LONG")
      .parquet(s"$tmp/imp")
    val clk = spark.readStream.schema("clk_imp_id LONG, clk_sec LONG")
      .parquet(s"$tmp/clk")
    runOnce(s"$tmp/out", s"$tmp/chk")(
      StreamOps.clickAttribution(imp, clk, maxDelaySec = 60,
        watermarkDelay = "5 minutes"))
    val out = spark.read.parquet(s"$tmp/out")
      .select("imp_id", "user_id", "imp_at", "clk_at")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // imp 10: click 30s later -> attributed; imp 11: 500s later -> outside
    // the 60s bound; imp 12: click 10s BEFORE the impression -> dropped
    assert(out.toSeq == Seq((10L, 7L, 1000L, 1030L)))
  }

  test("rate control: maxFilesPerTrigger bounds each micro-batch (multi-batch execution)") {
    // the file-source analogue of the Kafka leg's maxOffsetsPerTrigger
    // (consume_jobs.py's DStream maxRatePerPartition): 3 one-row files
    // + cap 1 file/trigger must execute as 3 bounded micro-batches,
    // even under AvailableNow — SURVEY §2.10's rate-control aspect
    // exercised through real MicroBatchExecution, not config-only
    val tmp = java.nio.file.Files.createTempDirectory("graft-rate").toString
    (1 to 3).foreach { i =>
      Seq((i.toLong, s"doc $i")).toDF("id", "text").coalesce(1)
        .write.mode("append").parquet(s"$tmp/in")
    }
    val stream = spark.readStream
      .schema("id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$tmp/in")
    val q = stream.writeStream.outputMode("append")
      .format("parquet").option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    assert(batches.length == 3,
      s"expected 3 capped micro-batches, saw ${batches.length}")
    assert(batches.forall(_.numInputRows == 1),
      s"each batch must carry exactly one file's rows; got ${batches.map(_.numInputRows).mkString(",")}")
    assert(spark.read.parquet(s"$tmp/out").count() == 3)
  }
}
