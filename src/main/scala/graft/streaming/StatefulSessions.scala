package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: session windows via
  * KeyValueGroupedDataset.flatMapGroupsWithState — the arbitrary-state
  * API the reference never reaches (its streaming job is a stateless
  * parse-and-land; SURVEY §2.10) but that a streaming analytics surface
  * needs for inactivity-gap sessionization.
  *
  * State per user = the open session; an event beyond the gap closes
  * and emits it. With `idleTimeout` on (the production default), a user
  * who simply goes SILENT also gets their session flushed and state
  * evicted after the gap of processing time — otherwise silent users
  * leak state forever and their final session never emits. At scale
  * state lives in the state store (RocksDB provider in production),
  * partitioned by the group key — one exchange on user_id per batch.
  *
  * `idleTimeout = false` disables the processing-time timeout for
  * drain-style tests and batch replays: a registered timeout counts as
  * pending work, so Trigger.AvailableNow / processAllAvailable would
  * otherwise never see the stream as caught-up.
  */
object StatefulSessions {

  case class Event(user_id: Long, sec: Long, value: Double)
  case class OpenSession(start: Long, last: Long, n: Long, sum: Double)
  case class ClosedSession(user_id: Long, start_sec: Long, end_sec: Long,
      n_events: Long, sum_value: Double)

  def sessionizeGroup(gapSec: Long, idleTimeout: Boolean)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val flushed = state.getOption.map(s =>
        ClosedSession(userId, s.start, s.last, s.n, s.sum))
      state.remove()
      return flushed.iterator
    }
    val sorted = events.toSeq.sortBy(e => (e.sec, e.value))
    var open = state.getOption
    // cross-batch late events more than gapSec OLDER than the open
    // session's start are NOT part of it (merging them would span an
    // internal gap bigger than the limit — the invariant the operator
    // exists to enforce, and the within-batch walk would have split
    // them). They form their own earlier chain, gap-split among
    // themselves, merged into the open session only if the chain ends
    // within gapSec of its (possibly batch-lowered) start.
    var late: Option[OpenSession] = None
    val closed = Seq.newBuilder[ClosedSession]
    for (e <- sorted) {
      open match {
        case Some(s) if s.start - e.sec > gapSec =>
          late match {
            case Some(c) if e.sec - c.last > gapSec =>
              closed += ClosedSession(userId, c.start, c.last, c.n, c.sum)
              late = Some(OpenSession(e.sec, e.sec, 1, e.value))
            case Some(c) =>
              late = Some(c.copy(last = math.max(c.last, e.sec),
                n = c.n + 1, sum = c.sum + e.value))
            case None =>
              late = Some(OpenSession(e.sec, e.sec, 1, e.value))
          }
        case Some(s) if e.sec - s.last > gapSec =>
          closed += ClosedSession(userId, s.start, s.last, s.n, s.sum)
          open = Some(OpenSession(e.sec, e.sec, 1, e.value))
        case Some(s) =>
          // min/max, not plain assignment: sorting is per-BATCH only, so
          // a cross-batch late event (sec < state's last) must not move
          // `last` backward (a later event would then measure its gap
          // from the stale low-water mark and split a live session, and
          // a closed session could emit end < start) nor leave `start`
          // above the true earliest event
          open = Some(s.copy(start = math.min(s.start, e.sec),
            last = math.max(s.last, e.sec), n = s.n + 1, sum = s.sum + e.value))
        case None =>
          open = Some(OpenSession(e.sec, e.sec, 1, e.value))
      }
    }
    (late, open) match {
      case (Some(c), Some(s)) if s.start - c.last <= gapSec =>
        // the open session's start dropped (in-gap late events) far
        // enough to touch the late chain — they are one session
        open = Some(s.copy(start = math.min(s.start, c.start),
          n = s.n + c.n, sum = s.sum + c.sum))
      case (Some(c), _) =>
        closed += ClosedSession(userId, c.start, c.last, c.n, c.sum)
      case _ => ()
    }
    open.foreach { s =>
      state.update(s)
      if (idleTimeout) state.setTimeoutDuration(gapSec * 1000)
    }
    closed.result().iterator
  }

  /** Wire the stateful sessionizer over a (possibly streaming) event
    * Dataset; append mode. */
  def sessionize(events: Dataset[Event], gapSec: Long,
      idleTimeout: Boolean = true): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val conf =
      if (idleTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, conf)(
        sessionizeGroup(gapSec, idleTimeout))
  }
}
