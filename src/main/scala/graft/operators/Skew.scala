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
    * pairs — the standard recall/cost dial for 100 TB dedup.
    *
    * Pay-per-use (round 8): the original one-phase plan ranked EVERY
    * block through a full window shuffle — BucketCapProbe measured that
    * at ~45% operator overhead even when no bucket exceeded the cap
    * (SCALE.md round-7 table). Two-phased and fully LAZY now: a
    * map-side-combined count finds the blocks that exceed the cap (one
    * row per distinct block, tiny output), and that key set splits the
    * input with broadcast left-anti/left-semi joins — under-cap rows
    * pass straight through with sub-bucket 0 (no shuffle, no sort) and
    * only rows in over-cap blocks reach the rank window. Output is
    * row-identical to the one-phase plan. The three consumers of `df`
    * (size count, anti branch, semi branch) share one computation of
    * any exchange in `df`'s plan via ReuseExchange — every production
    * caller feeds a spread (repartitioned) or scratch-staged scan, so
    * the upstream runs once per action; callers adding a capBlocks over
    * expensive exchange-free lineage should stage it first (the
    * Stages.apply idiom). The over-cap key set is broadcast: its size
    * is bounded by distinct-blocks-over-cap (≤ rows/cap), vanishingly
    * small for a production cap set above the p99 legitimate block.
    *
    * `mostBlocksOver` is the ENGAGEMENT-PROFILE dial, set per call
    * site, both shapes measured (SCALE.md round-8): when the cap is a
    * safety valve that rarely fires (LSH hot-bucket guard, title-block
    * guard — the default), pay-per-use wins because under-cap rows
    * skip the rank shuffle entirely. When the caller KNOWS most rows
    * sit in over-cap blocks — low-cardinality blocking keys split
    * intentionally, Matching's sector/location blocks — the split is
    * pure overhead (the window ranks nearly everything anyway, and the
    * count + anti/semi passes re-scan the input three times): q95
    * measured the two-phase plan at +39% over the one-phase window
    * (3.15 → 4.38 s back-to-back). `mostBlocksOver = true` takes the
    * single window pass over all blocks. Output is row-identical
    * either way (SkewSpec pins it). */
  def capBlocks(df: DataFrame, blockCol: Column, orderCol: Column,
      maxPerBlock: Int, mostBlocksOver: Boolean = false): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(maxPerBlock > 0, s"maxPerBlock must be positive, got $maxPerBlock")
    // reserved working columns must not already exist (RangeJoin's
    // __bucket precedent): silently overwriting a caller's column and
    // dropping it would corrupt the output
    Seq("__rn", "__cb_key", "__capped_block").foreach { c =>
      require(!df.columns.contains(c), s"capBlocks: input already has a '$c' column")
    }
    // coalesce the null block: concat is null-intolerant, so a NULL
    // block key would null __capped_block for its whole block — the
    // one block a skew cap most needs to cap (dirty-data hot key)
    // would ride uncapped through null-safe consumers. The string key
    // also makes the anti/semi joins null-safe for free.
    val keyed = df.withColumn("__cb_key",
      coalesce(blockCol.cast("string"), lit("__null_block__")))
    def subBlock(rnCol: Column): Column =
      concat(col("__cb_key"), lit("#"),
        (((rnCol - 1) / maxPerBlock).cast("int")).cast("string"))
    val w = Window.partitionBy(col("__cb_key")).orderBy(orderCol)
    if (mostBlocksOver) {
      // one window pass over every block — cheapest when the split
      // would route nearly all rows through the rank window anyway
      keyed.withColumn("__rn", row_number().over(w))
        .withColumn("__capped_block", subBlock(col("__rn")))
        .drop("__rn", "__cb_key")
    } else {
      // phase 1: which blocks exceed the cap (partial-aggregated count —
      // a hot block reaches its reducer as one row per upstream task)
      val overKeys = keyed
        .groupBy(col("__cb_key")).agg(count(lit(1)).as("__cb_n"))
        .where(col("__cb_n") > maxPerBlock).select(col("__cb_key"))
      // phase 2: under-cap rows pass through (rank 1 ⇒ sub-bucket 0 —
      // what the one-phase window assigned every row of an in-cap block);
      // over-cap rows pay the rank shuffle, and only them
      val under = keyed.join(broadcast(overKeys), Seq("__cb_key"), "left_anti")
        .withColumn("__capped_block", subBlock(lit(1)))
      val over = keyed.join(broadcast(overKeys), Seq("__cb_key"), "left_semi")
        .withColumn("__rn", row_number().over(w))
        .withColumn("__capped_block", subBlock(col("__rn"))).drop("__rn")
      under.unionByName(over).drop("__cb_key")
    }
  }
}
