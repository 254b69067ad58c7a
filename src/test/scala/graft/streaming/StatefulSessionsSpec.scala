package graft.streaming

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark
import StatefulSessions._

class StatefulSessionsSpec extends AnyFunSuite {
  import spark.implicits._

  private def runOnce(tmp: String): Unit = {
    val stream = spark.readStream
      .schema("user_id LONG, sec LONG, value DOUBLE")
      .parquet(s"$tmp/in").as[Event]
    // idleTimeout off: a registered processing-time timeout counts as
    // pending work, so the AvailableNow drain would never terminate
    val q = sessionize(stream, gapSec = 1800, idleTimeout = false)
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("idle timeout flushes a silent user's session and evicts state") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-idle").toString
    Seq(Event(9L, 100L, 2.5)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/in")
    val stream = spark.readStream
      .schema("user_id LONG, sec LONG, value DOUBLE")
      .parquet(s"$tmp/in").as[Event]
    val q = sessionize(stream, gapSec = 2, idleTimeout = true)
      .writeStream.outputMode("append")
      .format("parquet")
      .option("path", s"$tmp/out")
      .option("checkpointLocation", s"$tmp/chk")
      .trigger(Trigger.ProcessingTime("500 milliseconds")).start()
    // the single event opens a session; after gapSec of processing time
    // with no further events the timeout must flush it downstream
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    var flushed = Seq.empty[ClosedSession]
    while (flushed.isEmpty && System.nanoTime() < deadline) {
      Thread.sleep(500)
      flushed = try spark.read.parquet(s"$tmp/out").as[ClosedSession].collect().toSeq
        catch { case _: Exception => Seq.empty }
    }
    q.stop()
    assert(flushed == Seq(ClosedSession(9L, 100L, 100L, 1L, 2.5)),
      s"timeout flush missing/incorrect: $flushed")
  }

  test("stateful sessionization closes sessions across micro-batches") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-state").toString
    // batch 1: user 1 has two events 10s apart, then a 2000s-gap event
    Seq(Event(1L, 100L, 1.0), Event(1L, 110L, 2.0), Event(1L, 2200L, 5.0),
      Event(2L, 50L, 1.0))
      .toDF().coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
    runOnce(tmp)
    val closed1 = spark.read.parquet(s"$tmp/out").as[ClosedSession].collect()
    // user 1's first session (100-110, 2 events, sum 3.0) closed by the
    // 2200 event; the 2200 session and user 2's stay open in state
    assert(closed1.toSeq == Seq(ClosedSession(1L, 100L, 110L, 2L, 3.0)))

    // batch 2: recovery from checkpoint — a late event for user 2
    // beyond the gap closes the session held in the state store
    Seq(Event(2L, 99999L, 9.0)).toDF().coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    runOnce(tmp)
    val closed2 = spark.read.parquet(s"$tmp/out").as[ClosedSession].collect()
    assert(closed2.toSet == Set(
      ClosedSession(1L, 100L, 110L, 2L, 3.0),
      ClosedSession(2L, 50L, 50L, 1L, 1.0)))
  }

  test("cross-batch late event beyond the gap is its own session, not a merge") {
    // gap 1800; batch 1 opens {100000}; batch 2 delivers sec=10 — a
    // merge would produce one session spanning an internal gap 55x the
    // limit (the invariant the operator exists to enforce); it must
    // instead emit {10} closed and leave the open session untouched
    val tmp = java.nio.file.Files.createTempDirectory("graft-late").toString
    Seq(Event(1L, 100000L, 1.0)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp/in")
    runOnce(tmp)
    Seq(Event(1L, 10L, 7.0)).toDF().coalesce(1)
      .write.mode("append").parquet(s"$tmp/in")
    runOnce(tmp)
    val closed = spark.read.parquet(s"$tmp/out").as[ClosedSession].collect()
    assert(closed.toSeq == Seq(ClosedSession(1L, 10L, 10L, 1L, 7.0)),
      s"late event must close alone: ${closed.toSeq}")
    // and a late CHAIN that touches the open session's start does merge:
    // open {1000}; late events 400+900 chain (gap 500 apart < 1800) and
    // 900 is within gap of 1000 — all one session, nothing closes
    val tmp2 = java.nio.file.Files.createTempDirectory("graft-late2").toString
    Seq(Event(5L, 100000L, 1.0)).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$tmp2/in")
    runOnce(tmp2)
    Seq(Event(5L, 97000L, 2.0), Event(5L, 98500L, 3.0)).toDF().coalesce(1)
      .write.mode("append").parquet(s"$tmp2/in")
    runOnce(tmp2)
    val closed2 = spark.read.parquet(s"$tmp2/out").as[ClosedSession].collect()
    assert(closed2.isEmpty, s"touching late chain must merge, not close: ${closed2.toSeq}")
  }
}
