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
    * rand()) keeps reruns and retries stable. */
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
    val w = Window.partitionBy(blockCol).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__capped_block",
        concat(blockCol.cast("string"), lit("#"),
          (((col("__rn") - 1) / maxPerBlock).cast("int")).cast("string")))
      .drop("__rn")
  }
}
