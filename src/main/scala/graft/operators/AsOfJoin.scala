package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — for each left row, the latest right row with
  * `rightOrd <= leftOrd` within the same key — an operator Spark lacks
  * natively (SPARK-22947).
  *
  * Implementation is the union+carry-forward form, not a range join:
  * both sides are tagged and unioned, sorted within each key by
  * (ord, side) with right-before-left on ties, and the right payload is
  * carried forward with `last(_, ignoreNulls)` over an unbounded-
  * preceding row frame. Cost at 100 TB: ONE shuffle of (left ∪ right)
  * on the key + a per-partition sort — no O(left × right) range
  * explosion, no broadcast requirement, and skewed keys split under
  * AQE. This is the same plan shape Flink/Kappa pipelines use for
  * temporal joins.
  *
  * Right rows must be unique per (key, rightOrd) — pre-aggregate ties
  * upstream (e.g. max_by) or carried values are nondeterministic.
  */
object AsOfJoin {

  /** Backward as-of with an optional tolerance: matches with
    * `leftOrd - rightOrd > toleranceOpt` are nulled out (pandas
    * merge_asof semantics). */
  def backward(left: DataFrame, right: DataFrame, key: String,
      leftOrd: String, rightOrd: String, rightPayload: Seq[String],
      toleranceOpt: Option[Long] = None): DataFrame = {
    val rStruct = struct(rightPayload.map(col): _*)
    val rp = right.select(rStruct.as("__rp")).schema("__rp").dataType
    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val lp = left.select(lStruct.as("__lp")).schema("__lp").dataType

    // pandas merge_asof drops NaN ordinals; a null rightOrd would sort
    // nulls-first and carry its payload against a DIFFERENT row's
    // matched ordinal, so enforce the same precondition here. Null
    // KEYS likewise: Window.partitionBy groups null keys into ONE
    // partition, so a null-keyed right row would match null-keyed left
    // rows — but SQL ASOF / pandas equi-keys never match on NULL.
    // Dropping null-keyed right rows preserves left-join semantics:
    // null-keyed LEFT rows stay in the output with a null match.
    val r2 = right.where(col(rightOrd).isNotNull && col(key).isNotNull).select(
      col(key).as("__k"), col(rightOrd).as("__ord"), lit(0).as("__side"),
      rStruct.as("__rp"), lit(null).cast(lp).as("__lp"))
    val l2 = left.select(
      col(key).as("__k"), col(leftOrd).as("__ord"), lit(1).as("__side"),
      lit(null).cast(rp).as("__rp"), lStruct.as("__lp"))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ord"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = r2.unionByName(l2)
      .withColumn("__match", last(col("__rp"), ignoreNulls = true).over(w))
      .withColumn("__mord", last(when(col("__side") === 0, col("__ord")),
        ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .withColumn("__match",
        toleranceOpt.map(t =>
          when(col("__ord") - col("__mord") <= t, col("__match"))
            .otherwise(lit(null).cast(rp)))
          .getOrElse(col("__match")))

    val leftCols = left.columns.map(c => col(s"__lp.$c"))
    val matchCols = rightPayload.map(c => col(s"__match.$c"))
    carried.select((leftCols ++ matchCols).toIndexedSeq: _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with
    * `rightOrd >= leftOrd` in the same key — implemented by running the
    * backward join over negated order columns. NUMERIC ordinals only
    * (negation): date/timestamp callers convert to epoch numbers first
    * (as every caller in this engine does — events normalize to
    * ns-longs), and Long.MinValue is out of domain (its negation
    * wraps). [[backward]] has no such restriction. */
  def forward(left: DataFrame, right: DataFrame, key: String,
      leftOrd: String, rightOrd: String, rightPayload: Seq[String],
      toleranceOpt: Option[Long] = None): DataFrame = {
    val negL = left.withColumn("__neg_ord", -col(leftOrd))
    val negR = right.withColumn("__neg_rord", -col(rightOrd))
    backward(negL, negR, key, "__neg_ord", "__neg_rord", rightPayload, toleranceOpt)
      .drop("__neg_ord")
  }
}
