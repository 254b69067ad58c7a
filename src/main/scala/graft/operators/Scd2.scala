package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history build: collapse an event
  * stream of (entity, ts, attribute) observations into versioned
  * validity intervals — the warehouse-side primitive behind "what was
  * this offer's sector AS OF March" queries, and the batch analogue of
  * the streaming upsert the reference's warehouse loader performs
  * (load_to_bigquery.py's MERGE-shaped dedup-then-replace).
  *
  * Scale shape: both windows partition by the entity key — ONE shuffle
  * on entity, no global sort, per-entity state bounded by that
  * entity's change count. Change detection (lag) runs before the
  * second window, so the versioned set the lead() pass sees is already
  * collapsed to changes only.
  */
object Scd2 {

  /** @param events   observation rows
    * @param entityCol entity/business key
    * @param tsCol     observation time (orderable)
    * @param tieCol    deterministic tiebreak within equal timestamps
    * @param attrCol   the tracked attribute
    * @return (entity, attr, valid_from, valid_to, is_current) — one row
    *         per version; valid_to is null on the open version
    */
  def history(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame =
    historyKeepTie(events, entityCol, tsCol, tieCol, attrCol).drop("__tie")

  /** [[history]] plus the change row's tiebreak value as `__tie` —
    * what [[mergeHistory]] needs to replay same-timestamp version
    * order when it rebuilds a touched entity from its versions. */
  def historyKeepTie(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(tieCol))
    // null-safe change detection: plain =!= evaluates to NULL when
    // either side is null, which would silently drop every transition
    // INTO or OUT OF a null attribute value. <=> treats null as a
    // value, so null periods become versions like any other. The first
    // row per entity has __prev = null from lag's default — genuinely
    // indistinguishable from a change out of null, which is the right
    // call: both open a version.
    val changes = events
      .select(col(entityCol), col(tsCol), col(tieCol), col(attrCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(byTime))
      .withColumn("__first", row_number().over(byTime) === 1)
      .where(col("__first") || !(col("__prev") <=> col(attrCol)))
    changes
      .withColumn("valid_to", lead(col(tsCol), 1).over(byTime))
      .select(
        col(entityCol),
        col(attrCol),
        col(tsCol).as("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)).as("is_current"),
        col(tieCol).as("__tie"))
  }

  /** Incremental SCD2: fold an APPEND-ONLY batch of new observations
    * into standing history without re-reading prior events.
    *
    * Contract: every batch row's (ts, tie) must sort AFTER all prior
    * events of its entity (the date-cutoff ingest pattern) — version
    * collapse is lossy about in-run events, so an out-of-order row
    * could not split a previously collapsed run correctly. The
    * violation mode is SILENT: an out-of-order batch produces history
    * that diverges from a full recompute rather than failing (the
    * late row lands between collapsed versions whose in-run events are
    * gone). Ingest paths that cannot prove the cutoff should run
    * [[appendOnlyViolations]] first and fail/quarantine on non-empty —
    * one entity-keyed join against the prior open versions, cheap
    * relative to the merge itself.
    *
    * Shape: untouched entities pass through with zero recompute (an
    * anti-join against the batch's entity set — at warehouse scale the
    * overwhelming majority); touched entities rebuild from (their
    * standing versions replayed as pseudo-events) ∪ (their batch rows)
    * — input sized by the BATCH's entities, not the corpus. The q92
    * oracle pins merged == full recompute exactly.
    *
    * @param priorHist output of [[historyKeepTie]] (same entity/ts/
    *                  tie/attr column names as the events)
    */
  def mergeHistory(
      priorHist: DataFrame,
      batch: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame =
    mergeHistoryKeepTie(priorHist, batch, entityCol, tsCol, tieCol, attrCol)
      .drop("__tie")

  /** Batch rows that violate [[mergeHistory]]'s append-only contract
    * AS WITNESSED BY the collapsed history: rows whose (ts, tie) does
    * not sort strictly after the entity's latest version's
    * (valid_from, __tie). NECESSARY but not SUFFICIENT for the full
    * contract: history() collapses same-attr runs, so a prior event
    * that did not open a version (same value as its predecessor)
    * leaves no trace here — a batch row landing between the last
    * CHANGE and a later run-interior event passes this check, and the
    * merge then diverges from a recompute over the RAW event log
    * (while still equaling a recompute over the collapsed prior
    * events, which is all this table can witness). Guard against that
    * residual case upstream, e.g. with a per-entity max-event-ts
    * watermark carried beside the history. One small aggregation over
    * priorHist plus one entity-keyed equi-join; empty result ⇒ the
    * merge is sound relative to collapsed priors. Null-safe on the
    * entity key, like the merge's own joins. */
  def appendOnlyViolations(
      priorHist: DataFrame,
      batch: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String): DataFrame = {
    val lastPrior = priorHist
      .groupBy(col(entityCol).as("__p_ent"))
      .agg(max(struct(col("valid_from"), col("__tie"))).as("__p_max"))
    batch.join(lastPrior, col(entityCol) <=> col("__p_ent"), "inner")
      .where(!(struct(col(tsCol), col(tieCol)) > col("__p_max")))
      .drop("__p_ent", "__p_max")
  }

  /** [[mergeHistory]] preserving `__tie`, so the result is CLOSED
    * under iteration: tonight's output is tomorrow's `priorHist`
    * without ever recomputing from raw events. Null-safe on the
    * entity key (history()'s window partitioning groups null keys as
    * one entity; the split joins must agree or a null-keyed entity
    * would both pass through stale AND miss its rebuild). */
  def mergeHistoryKeepTie(
      priorHist: DataFrame,
      batch: DataFrame,
      entityCol: String,
      tsCol: String,
      tieCol: String,
      attrCol: String): DataFrame = {
    val touched = batch.select(col(entityCol).as("__t_ent")).distinct()
    val onEntity = col(entityCol) <=> col("__t_ent")
    val untouched = priorHist.join(touched, onEntity, "left_anti")
    val priorAsEvents = priorHist
      .join(touched, onEntity, "left_semi")
      .select(col(entityCol), col("valid_from").as(tsCol),
        col("__tie").as(tieCol), col(attrCol))
    val batchEvents = batch
      .select(col(entityCol), col(tsCol), col(tieCol), col(attrCol))
    val rebuilt = historyKeepTie(priorAsEvents.unionByName(batchEvents),
      entityCol, tsCol, tieCol, attrCol)
    untouched.unionByName(rebuilt)
  }
}
