package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine.{events, table}
import graft.operators.{AsOfJoin, RangeJoin}
import graft.streaming.StreamingIngest

/** Event-stream operator surface over the `events` table: event-time
  * bucketing, sessionization (gaps-and-islands), backward as-of join,
  * and a real Structured-Streaming windowed aggregation.
  *
  * Event-time reads go through [[graft.Engine.events]], which
  * normalizes `ts` to ns-since-epoch LONG whatever the parquet
  * encoding (raw int64 ns or TIMESTAMP micros — Engine.epochNs);
  * every output reduces it to BIGINT epoch seconds with exact integer
  * arithmetic so both engines hash identically. */
object EventOps {

  /** Normalized ns-long → epoch seconds with exact integer division
    * (`div`) — no float drift at second boundaries on either engine. */
  private def epochSec(colName: String): Column = expr(s"$colName div 1000000000")

  /** Event-time bucketing: per (hour, type) counts and value sums —
    * the dashboard "offers per day" trend shape (PLAN_REALISATION.md:481). */
  private def q27(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sec = epochSec("ts")
    events(s, dir)
      .groupBy(
        // sign-keeping % (not pmod): matches DuckDB's % for pre-epoch
        // timestamps, so both engines bucket negatives identically
        (sec - (sec % lit(3600L))).as("hour_epoch"),
        $"event_type")
      .agg(
        count(lit(1)).as("cnt"),
        roundSafe(sum($"value"), 2).as("sum_val"),
        roundSafe(avg($"value"), 4).as("avg_val"))
      .orderBy($"hour_epoch", $"event_type")
  }

  private val q27Sql =
    """WITH e AS (SELECT epoch_ns(ts) // 1000000000 AS sec, event_type, value
                    FROM events)
       SELECT sec - sec % 3600 AS hour_epoch,
       event_type, count(*) AS cnt,
       round(sum(CAST(value AS DOUBLE)) + 1e-9, 2) AS sum_val,
       round((avg(CAST(value AS DOUBLE))) + 1e-9, 4) AS avg_val
       FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Sessionization: a 30-minute inactivity gap starts a new session
    * (gaps-and-islands via lag + running sum; one shuffle on user_id). */
  private def q28(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir)
      .select($"user_id", $"event_id", epochSec("ts").as("sec"))
    val w = Window.partitionBy($"user_id").orderBy($"sec", $"event_id")
    ev
      .withColumn("prev_sec", lag($"sec", 1).over(w))
      .withColumn("new_sess",
        when($"prev_sec".isNull || $"sec" - $"prev_sec" > 1800, 1).otherwise(0))
      .withColumn("session_id",
        sum($"new_sess").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .groupBy($"user_id", $"session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min($"sec").as("start_sec"),
        (max($"sec") - min($"sec")).as("dur_sec"))
      .orderBy($"user_id", $"session_id")
  }

  private val q28Sql =
    """WITH e AS (SELECT user_id, event_id,
                  epoch_ns(ts) // 1000000000 AS sec FROM events),
       g AS (SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                              OR sec - lag(sec) OVER w > 1800
                            THEN 1 ELSE 0 END AS ns
             FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
       s AS (SELECT *, CAST(sum(ns) OVER (
               PARTITION BY user_id ORDER BY sec, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM g)
       SELECT user_id, session_id, count(*) AS n_events,
              min(sec) AS start_sec, max(sec) - min(sec) AS dur_sec
       FROM s GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Backward as-of join: each purchase matched to the user's latest
    * click at-or-before it (custom operator; DuckDB replays it with a
    * native ASOF LEFT JOIN). */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir)
      .select($"event_id", $"user_id", $"event_type", epochSec("ts").as("sec"))
    val purchases = ev.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"sec")
    // unique right rows per (key, ord): keep the max click id per second
    val clicks = ev.where($"event_type" === "click")
      .groupBy($"user_id", $"sec".as("click_sec"))
      .agg(max($"event_id").as("click_id"))
      .select($"user_id", $"click_sec", $"click_id")
    AsOfJoin.backward(purchases, clicks, "user_id", "sec", "click_sec",
        Seq("click_id", "click_sec"))
      .select($"event_id", $"user_id", $"sec",
        $"click_id", $"click_sec",
        ($"sec" - $"click_sec").as("gap_sec"))
      .orderBy($"event_id")
  }

  private val q29Sql =
    """WITH e AS (SELECT event_id, user_id, event_type,
                  epoch_ns(ts) // 1000000000 AS sec FROM events),
       p AS (SELECT event_id, user_id, sec FROM e WHERE event_type = 'purchase'),
       c AS (SELECT user_id, sec AS click_sec, max(event_id) AS click_id
             FROM e WHERE event_type = 'click' GROUP BY 1, 2)
       SELECT p.event_id, p.user_id, p.sec, c.click_id, c.click_sec,
              p.sec - c.click_sec AS gap_sec
       FROM p ASOF LEFT JOIN c
         ON p.user_id = c.user_id AND c.click_sec <= p.sec
       ORDER BY p.event_id"""

  /** Structured-Streaming event-time windowed aggregation (real
    * MicroBatchExecution over the parquet source, AvailableNow). */
  private def q30(s: SparkSession, dir: String): DataFrame =
    StreamingIngest.windowedEventCounts(s, dir)
      .orderBy(col("day_epoch"), col("event_type"))

  private val q30Sql =
    """WITH e AS (SELECT epoch_ns(ts) // 1000000000 AS sec, event_type, value
                    FROM events)
       SELECT sec - (((sec % 86400) + 86400) % 86400) AS day_epoch,
       event_type, count(*) AS cnt, round(sum(CAST(value AS DOUBLE)) + 1e-9, 2) AS sum_val
       FROM e GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Banded range join: events joined to per-user activity intervals
    * ([first event, first event + 1 day]) — equi-join on (user, band
    * bucket) + residual BETWEEN, not a nested-loop theta join. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = events(s, dir)
      .select($"user_id", $"event_id", epochSec("ts").as("sec"))
    val intervals = ev.groupBy($"user_id")
      .agg(min($"sec").as("lo"))
      .withColumn("hi", $"lo" + 86400L)
    RangeJoin
      .banded(ev, intervals, "sec", "lo", "hi", bandWidth = 21600L, Seq("user_id"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("first_day_events"))
      .orderBy($"user_id")
  }

  private val q41Sql =
    """WITH e AS (SELECT user_id, event_id,
                  epoch_ns(ts) // 1000000000 AS sec FROM events),
       f AS (SELECT user_id, min(sec) AS lo, min(sec) + 86400 AS hi
             FROM e GROUP BY user_id)
       SELECT e.user_id, count(*) AS first_day_events
       FROM e JOIN f ON e.user_id = f.user_id AND e.sec BETWEEN f.lo AND f.hi
       GROUP BY e.user_id ORDER BY e.user_id"""

  /** Ordered funnel: users reaching view → first click AT/AFTER their
    * first view → first purchase at/after that click. Each stage is one
    * grouped min over the (already user-keyed) previous stage — three
    * shuffles on user_id, stage populations only ever shrink, so the
    * join inputs narrow as the funnel deepens. Timestamps never leave
    * the plan (ns-long in Spark, native timestamp in DuckDB — same
    * ordering, so the stage sets agree). */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val e = table(s, dir, "events").select(col("user_id"), col("event_type"), col("ts"))
    val v = e.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("t1"))
    val c = e.where(col("event_type") === "click").join(v, "user_id")
      .where(col("ts") >= col("t1"))
      .groupBy("user_id").agg(min(col("ts")).as("t2"))
    val p = e.where(col("event_type") === "purchase").join(c, "user_id")
      .where(col("ts") >= col("t2"))
      .groupBy("user_id").agg(min(col("ts")).as("t3"))
    v.agg(count(lit(1)).as("users")).select(lit("1_view").as("stage"), col("users"))
      .unionByName(c.agg(count(lit(1)).as("users"))
        .select(lit("2_click").as("stage"), col("users")))
      .unionByName(p.agg(count(lit(1)).as("users"))
        .select(lit("3_purchase").as("stage"), col("users")))
      .orderBy(col("stage"))
  }

  private val q82Sql =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'view' GROUP BY 1),
        c AS (SELECT e.user_id, min(ts) AS t2 FROM events e JOIN v USING (user_id)
          WHERE event_type = 'click' AND ts >= t1 GROUP BY 1),
        p AS (SELECT e.user_id, min(ts) AS t3 FROM events e JOIN c USING (user_id)
          WHERE event_type = 'purchase' AND ts >= t2 GROUP BY 1)
       SELECT '1_view' AS stage, count(*)::BIGINT AS users FROM v
       UNION ALL SELECT '2_click', count(*)::BIGINT FROM c
       UNION ALL SELECT '3_purchase', count(*)::BIGINT FROM p
       ORDER BY stage"""

  /** First-order Markov transition matrix over per-user event streams:
    * next event via lead() on the user-keyed window (one shuffle on
    * user_id), then transition counts and row-normalized probabilities
    * (per-state totals broadcast back). The behavioral-model companion
    * to q82's fixed funnel. */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = table(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type").as("cur"))
      .withColumn("nxt", lead(col("cur"), 1).over(w))
      .where(col("nxt").isNotNull)
      .groupBy(col("cur"), col("nxt"))
      .agg(count(lit(1)).as("c"))
    val totals = trans.groupBy(col("cur")).agg(sum(col("c")).as("tot"))
    trans.join(broadcast(totals), "cur")
      .select(col("cur"), col("nxt"), col("c"),
        roundSafe(col("c").cast("double") / col("tot").cast("double"), 6).as("p"))
      .orderBy(col("cur"), col("nxt"))
  }

  private val q85Sql =
    """WITH t AS (SELECT event_type AS cur,
          lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        FROM events),
        c AS (SELECT cur, nxt, count(*)::BIGINT AS c FROM t
              WHERE nxt IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT cur, sum(c) AS tot FROM c GROUP BY 1)
       SELECT c.cur, c.nxt, c.c, round(c.c::DOUBLE / tot.tot::DOUBLE + 1e-9, 6) AS p
       FROM c JOIN tot USING (cur) ORDER BY cur, nxt"""

  /** Mergeable-sketch rollup: per-day Apache DataSketches HLL sketches
    * of distinct users, unioned up to the month WITHOUT touching raw
    * rows again (hll_sketch_agg → hll_union_agg) — the warehouse
    * pattern where daily sketch columns are stored once and any
    * coarser rollup is a cheap sketch union. Graded like q38/q48:
    * exact count + an estimate-within-5% flag (sketch bytes are not
    * engine-portable; the bound is). Day→ns arithmetic is exact
    * integer math on the raw ns longs. */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val e = events(s, dir).select(col("user_id"),
      // ns-long → epoch days → month bucket. `div`, not `/`: Spark's
      // `/` on longs is DOUBLE division (ulp ~256 ns at 2024-epoch
      // magnitudes), so a ts within a few hundred ns of a boundary
      // could floor into a different bucket than the oracle's exact
      // integer `//`. Same idiom as epochSec elsewhere in this file.
      expr("ts div 86400000000000").as("day"))
      .withColumn("month", expr("day div 30"))
    val daily = e.groupBy(col("month"), col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val monthly = daily.groupBy(col("month"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
    val exact = e.groupBy(col("month"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    exact.join(monthly, "month")
      .select(col("month").cast("long").as("month"), col("exact_users"),
        (abs(col("est") - col("exact_users")) <= col("exact_users") * 0.05)
          .cast("long").as("est_within_5pct"))
      .orderBy(col("month"))
  }

  private val q87Sql =
    """SELECT (epoch_ns(ts) // 86400000000000) // 30 AS month,
         count(DISTINCT user_id)::BIGINT AS exact_users,
         1::BIGINT AS est_within_5pct
       FROM events GROUP BY 1 ORDER BY 1"""

  /** Semi-structured props: pull the numeric k out of the JSON props
    * column (get_json_object — no fixed schema needed) and aggregate
    * per event type. Pure map-stage extraction + one hash agg. */
  private def q88(s: SparkSession, dir: String): DataFrame =
    graft.Engine.spread(table(s, dir, "events"))
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), countDistinct(col("k")).as("k_distinct"),
        roundSafe(avg(col("k")), 6).as("k_avg"), max(col("k")).as("k_max"))
      .orderBy(col("event_type"))

  private val q88Sql =
    """SELECT event_type, count(*)::BIGINT AS n,
         count(DISTINCT k)::BIGINT AS k_distinct,
         round(avg(k) + 1e-9, 6) AS k_avg, max(k) AS k_max
       FROM (SELECT event_type,
               regexp_extract(props, '"k": ([0-9]+)', 1)::BIGINT AS k FROM events)
       GROUP BY 1 ORDER BY 1"""

  // NOTE: initialization order — constants referenced by the (lazy)
  // SQL vals that `all` forces must be declared ABOVE `all`, or they
  // read as zero/null during object init (the q97 "+ 0" bug).
  private val AttrDelaySec = 3600L
  private val SessGapSec = 21600L
  private val SessWatermarkSec = 3600L

  val all: Seq[Q] = Seq(
    Q("q27_time_bucket_agg", q27 _, Some(q27Sql)),
    Q("q28_sessionize", q28 _, Some(q28Sql)),
    Q("q29_asof_join", q29 _, Some(q29Sql)),
    Q("q30_stream_window_agg", q30 _, Some(q30Sql)),
    Q("q41_range_join", q41 _, Some(q41Sql)),
    Q("q82_funnel", q82 _, Some(q82Sql)),
    Q("q85_event_transitions", q85 _, Some(q85Sql)),
    Q("q87_sketch_rollup", q87 _, Some(q87Sql)),
    Q("q88_json_props", q88 _, Some(q88Sql)),
    Q("q91_stream_enrich", q91 _, Some(q91Sql)),
    Q("q93_cohort_retention", q93 _, Some(q93Sql)),
    Q("q97_stream_interval_join", q97 _, Some(q97Sql)),
    Q("q99_stream_session_window", q99 _, Some(q99Sql)))

  /** Cohort retention: users bucketed by first-active week, counted in
    * each later week as an offset from their cohort — the classic
    * retention triangle. Exact integer week arithmetic on the raw ns
    * longs; two user-keyed aggregations plus one distinct-count per
    * (cohort, offset) cell. At scale every shuffle keys on user_id or
    * the small (cohort, offset) pair — nothing global. */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val weeks = events(s, dir)
      .select(col("user_id"),
        // integer `div` for exact oracle parity (see q87's day bucket)
        expr("ts div 604800000000000").as("week"))
      .distinct()
    val cohorts = weeks.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    weeks.join(cohorts, "user_id")
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private lazy val q93Sql =
    """WITH w AS (SELECT DISTINCT user_id,
          epoch_ns(ts) // 604800000000000 AS week FROM events),
        c AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY 1)
       SELECT cohort_week, week - cohort_week AS week_offset,
         count(DISTINCT w.user_id)::BIGINT AS users
       FROM w JOIN c USING (user_id)
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Stream–static broadcast enrichment through MicroBatchExecution
    * (events stream ⋈ customer dim → per-segment/type aggregate). */
  private def q91(s: SparkSession, dir: String): DataFrame =
    StreamingIngest.enrichedEventCounts(s, dir)
      .orderBy(col("c_mktsegment"), col("event_type"))

  private lazy val q91Sql =
    """SELECT c_mktsegment, event_type, count(*)::BIGINT AS cnt,
         round(sum(CAST(value AS DOUBLE)) + 1e-9, 2) AS sum_val
       FROM events JOIN customer ON user_id = c_custkey
       GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Watermarked stream-stream interval join through real
    * MicroBatchExecution (view ⋈ click within the attribution window,
    * keyed on user) — q91's batch-replay pattern applied to the
    * two-stream stateful join: an inner interval join emits matches
    * as they arrive, so the availableNow run equals the batch interval
    * join the oracle states. */
  private def q97(s: SparkSession, dir: String): DataFrame =
    StreamingIngest.attributedClicks(s, dir, AttrDelaySec)
      .orderBy(col("imp_id"), col("imp_at"), col("clk_at"))

  private lazy val q97Sql =
    s"""WITH v AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec
                   FROM events WHERE event_type = 'view'),
         c AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec
               FROM events WHERE event_type = 'click')
        SELECT v.user_id AS imp_id, v.user_id AS user_id,
               v.sec AS imp_at, c.sec AS clk_at
        FROM v JOIN c ON v.user_id = c.user_id
             AND c.sec >= v.sec AND c.sec <= v.sec + $AttrDelaySec
        ORDER BY imp_id, imp_at, clk_at"""

  /** Native session_window through MicroBatchExecution: per-user
    * inactivity-gap sessions over the events table, append-mode
    * emission of watermark-closed sessions only. Oracle =
    * gaps-and-islands replay (sessions [min, last+gap), break only
    * when the gap EXCEEDS SessGapSec: Spark merges touching windows —
    * an event exactly gap seconds after the last extends the session;
    * sf0.1 has exactly one such pair and StreamOpsSpec pins the rule)
    * filtered to ends the final watermark passed (inclusive:
    * end == watermark emits, also spec-pinned). */
  private def q99(s: SparkSession, dir: String): DataFrame =
    StreamingIngest.sessionizedEvents(s, dir, SessGapSec, SessWatermarkSec)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), roundSafe(col("value_sum"), 2).as("value_sum"))
      .orderBy(col("user_id"), col("session_start"))

  private lazy val q99Sql =
    s"""WITH ev AS (SELECT user_id, epoch_ns(ts) // 1000000000 AS sec, value
                    FROM events),
        wm AS (SELECT max(sec) - $SessWatermarkSec AS w FROM ev),
        brk AS (SELECT user_id, sec, value,
            CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec) IS NULL
                 OR sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec)
                    > $SessGapSec
                 THEN 1 ELSE 0 END AS is_new
          FROM ev),
        grp AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY sec
                  ROWS UNBOUNDED PRECEDING) AS sid FROM brk),
        sess AS (SELECT user_id, min(sec) AS session_start,
                   max(sec) + $SessGapSec AS session_end,
                   count(*)::BIGINT AS n_events,
                   round(sum(CAST(value AS DOUBLE)) + 1e-9, 2) AS value_sum
                 FROM grp GROUP BY user_id, sid)
        SELECT user_id, session_start, session_end, n_events, value_sum
        FROM sess CROSS JOIN wm WHERE session_end <= w
        ORDER BY user_id, session_start"""
}
