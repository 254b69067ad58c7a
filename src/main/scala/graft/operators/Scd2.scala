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
        when(col("valid_to").isNull, lit(1L)).otherwise(lit(0L)).as("is_current"))
  }
}
