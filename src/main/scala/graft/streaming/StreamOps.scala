package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming operator surface beyond the reference's stateless ingest:
  * native session windows and watermarked stream-stream joins — the
  * two stateful shapes [[StatefulSessions]]' arbitrary-state form does
  * not cover. Both shard state by key across the cluster (state store
  * instance per shuffle partition) and bound it with watermarks, so
  * they run unchanged against a 1000-executor Kafka deployment.
  */
object StreamOps {

  /** Inactivity-gap sessionization via the BUILT-IN session_window
    * (merging windows in the streaming aggregation state) — the
    * declarative counterpart of StatefulSessions.sessionizeGroup;
    * append mode emits a session once the watermark passes its end. */
  def sessionAgg(events: DataFrame, keyCol: String, secCol: String,
      gap: String, watermarkDelay: String,
      valueCol: String = "value"): DataFrame =
    events
      .withColumn("ts", timestamp_seconds(col(secCol)))
      .withWatermark("ts", watermarkDelay)
      .groupBy(col(keyCol), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("value_sum"))
      .select(col(keyCol),
        unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"),
        col("n_events"), col("value_sum"))

  /** Watermarked stream-stream interval join: each click pairs with
    * the impression it follows within `maxDelaySec`. Equi-join on the
    * impression id plus an event-time range — Spark buffers both sides
    * in watermark-bounded state; the time bound is what lets the state
    * store evict (an unbounded stream-stream join would grow forever).
    *
    * Schema contract: `impressions` needs (imp_id, imp_sec) AND a
    * `user_id` passthrough column; `clicks` needs (clk_imp_id, clk_sec)
    * and must NOT carry `user_id` (the output select would be
    * ambiguous). The attributedClicks caller aliases accordingly. */
  def clickAttribution(impressions: DataFrame, clicks: DataFrame,
      maxDelaySec: Long, watermarkDelay: String): DataFrame = {
    val imp = impressions
      .withColumn("imp_ts", timestamp_seconds(col("imp_sec")))
      .withWatermark("imp_ts", watermarkDelay)
    val clk = clicks
      .withColumn("clk_ts", timestamp_seconds(col("clk_sec")))
      .withWatermark("clk_ts", watermarkDelay)
    imp.join(clk,
      col("imp_id") === col("clk_imp_id") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr(s"INTERVAL $maxDelaySec SECONDS"))
      .select(col("imp_id"), col("user_id"),
        unix_timestamp(col("imp_ts")).as("imp_at"),
        unix_timestamp(col("clk_ts")).as("clk_at"))
  }
}
