package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys — the manual fallback for
  * cases AQE's runtime skew-join splitting can't reach (single-key
  * aggregation hot spots, pair-generating self-joins over one giant
  * block).
  *
  * Pattern: salt the key into `saltBuckets` sub-keys, aggregate
  * partially per sub-key (spreads one reducer's load across the
  * cluster), then merge the partials in a second, tiny aggregation.
  */
object Skew {

  /** Two-phase salted count/sum aggregation over a possibly-skewed key.
    * Deterministic salting (hash of a row-identifying column, not
    * rand()) keeps reruns and retries stable.
    *
    * Honest scope note: for PLAIN count/sum Spark's hash aggregate
    * already partial-aggregates map-side (a hot key reaches its
    * reducer as one row per upstream task), so this helper adds a
    * shuffle for nothing there. The two-phase shape earns its keep
    * when the partial-aggregation escape hatch is absent: aggregation
    * buffers that grow with the group (collect_list/set, exact
    * distinct) or downstream per-key processing after the first phase
    * — it is the documented TEMPLATE for those, kept deliberately
    * minimal. */
  def saltedAgg(df: DataFrame, key: Column, saltSource: Column,
      valueCol: Column, saltBuckets: Int): DataFrame = {
    val salted = df.groupBy(key.as("key"),
        pmod(xxhash64(saltSource), lit(saltBuckets)).as("salt"))
      .agg(count(lit(1)).as("pc"), sum(valueCol).as("ps"))
    salted.groupBy(col("key"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("total"))
  }

  /** Cap pair explosion inside a blocking key: rows beyond `maxPerBlock`
    * per block (by deterministic rank on `orderCol`) move to overflow
    * blocks that only pair among themselves. Bounds the worst block at
    * maxPerBlock^2 comparisons at the cost of missing cross-overflow
    * pairs — the standard recall/cost dial for 100 TB dedup. */
  def capBlocks(df: DataFrame, blockCol: Column, orderCol: Column,
      maxPerBlock: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerBlock > 0, s"maxPerBlock must be positive, got $maxPerBlock")
    // reserved working columns must not already exist (RangeJoin's
    // __bucket precedent): silently overwriting a caller's __rn and
    // dropping it would corrupt the output
    Seq("__rn", "__capped_block").foreach { c =>
      require(!df.columns.contains(c), s"capBlocks: input already has a '$c' column")
    }
    val w = Window.partitionBy(blockCol).orderBy(orderCol)
    // coalesce the null block: concat is null-intolerant, so a NULL
    // block key would null __capped_block for its whole block — the
    // one block a skew cap most needs to cap (dirty-data hot key)
    // would ride uncapped through null-safe consumers
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__capped_block",
        concat(coalesce(blockCol.cast("string"), lit("__null_block__")), lit("#"),
          (((col("__rn") - 1) / maxPerBlock).cast("int")).cast("string")))
      .drop("__rn")
  }
}
