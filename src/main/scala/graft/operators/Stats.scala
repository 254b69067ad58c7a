package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-shape statistics for corpus/metric QA: closed-form
  * per-group linear regression, robust (median/MAD) outlier scoring,
  * and exact integer-domain equi-width histograms.
  *
  * All three are single-pass-per-stage aggregate plans: the grouped
  * regression is ONE hash aggregate (Spark's covar_pop/var_pop/corr
  * are single-pass partial-aggregable); the robust outlier pass is two
  * small grouped medians broadcast back against the fact rows; the
  * histogram is a one-row min/max broadcast into a map-side bin
  * assignment + hash aggregate. No global sorts, no windows over the
  * whole table.
  */
object Stats {

  /** Per-group OLS of y on x: slope/intercept/r², via the
    * covariance/variance closed form (what SQL regr_slope computes).
    * All statistics are restricted to COMPLETE (x, y) pairs, matching
    * SQL's regr_* family: covar_pop already skips a row when either
    * side is null, so feeding var_pop/avg the raw columns (which skip
    * only their OWN nulls) would mix statistics over different row
    * subsets and silently skew slope/intercept on nullable data. `n`
    * is the group's total row count (profiling semantics), not the
    * pair count. */
  def groupedRegression(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x0 = col(xCol).cast("double"); val y0 = col(yCol).cast("double")
    val both = x0.isNotNull && y0.isNotNull
    val x = when(both, x0); val y = when(both, y0)
    df.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        (covar_pop(y, x) / var_pop(x)).as("slope"),
        (avg(y) - covar_pop(y, x) / var_pop(x) * avg(x)).as("intercept"),
        (corr(y, x) * corr(y, x)).as("r2"))
  }

  /** Per-group robust center/spread + outlier counts: median, MAD, and
    * how many rows sit beyond `k` robust standard deviations
    * (1.4826·MAD ≈ σ for normal data). Two grouped exact-median
    * aggregations (the second over |v − median|), each joined back via
    * broadcast — the fact table is scanned twice but never shuffled on
    * anything wider than the group key. */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String, k: Double): DataFrame = {
    val v = col(valueCol).cast("double")
    // null-SAFE join-backs: groupBy keeps a null group, so the medians
    // exist for it — an equi-join would silently drop its rows from the
    // output (groupedRegression reports the null group; so must this)
    // Column-API percentile, not an expr() splice: a value column
    // named "a-b" or "order value" would parse as an EXPRESSION (or
    // throw) inside the SQL string while every other reference here
    // resolves it as a column — silently wrong medians
    val med = df.groupBy(col(groupCol))
      .agg(percentile(v, lit(0.5)).as("med"))
      .withColumnRenamed(groupCol, "__g_med")
    val withMed = df.select(col(groupCol), v.as("__v"))
      .join(broadcast(med), col(groupCol) <=> col("__g_med")).drop("__g_med")
    val mad = withMed.groupBy(col(groupCol))
      .agg(percentile(abs(col("__v") - col("med")), lit(0.5)).as("mad"))
      .withColumnRenamed(groupCol, "__g_mad")
    withMed.join(broadcast(mad), col(groupCol) <=> col("__g_mad")).drop("__g_mad")
      .groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n"),
        sum(when(abs(col("__v") - col("med")) > lit(k) * lit(1.4826) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"),
        first(col("med")).as("med"),
        first(col("mad")).as("mad"))
  }

  /** Exact equi-width histogram over an integer-domain column (callers
    * with decimal money should pre-scale to cents so bin boundaries are
    * exact integers — no float-boundary ambiguity between engines).
    * Bin width = floor(range/bins)+1, so the max value lands in the
    * last bin and every bin index is in [0, bins). Null values are
    * excluded (min/max ignore them; a null would otherwise survive as
    * a phantom null-bin row). A domain whose range overflows long
    * (mixed-sign extremes, e.g. hash values) fails loudly instead of
    * binning with a garbage negative width. */
  def intHistogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0)
    val v = col(valueCol).cast("long")
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx"))
    df.select(v.as("__v"))
      .where(col("__v").isNotNull)
      .join(broadcast(bounds))
      .withColumn("width",
        when(col("mx") - col("mn") < 0,
          raise_error(lit(s"intHistogram($valueCol): max - min overflows long"))
            .cast("long"))
          .otherwise(floor((col("mx") - col("mn")) / bins).cast("long") + lit(1L)))
      .withColumn("bin", floor((col("__v") - col("mn")) / col("width")).cast("long"))
      .groupBy(col("bin"), col("mn"), col("width"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bin"),
        (col("mn") + col("bin") * col("width")).as("lo"),
        (col("mn") + (col("bin") + 1) * col("width") - 1).as("hi"),
        col("cnt"))
  }

  /** Column form of the robust z-score for reuse in filters.
    *
    * mad = 0 convention (common when >50% of a group's values are
    * identical): a zero deviation scores 0, any nonzero deviation
    * scores +Infinity — so `robustZ(...) > k` classifies exactly like
    * [[robustOutliers]]'s multiply form (`abs(v-med) > k·1.4826·mad`),
    * instead of Spark's divide-by-zero NULL silently dropping those
    * rows from a filter. robustOutliers keeps the multiply form
    * internally: it avoids a division whose rounding could flip a row
    * exactly on the k boundary relative to the SQL oracle's identical
    * multiply expression. */
  def robustZ(v: Column, med: Column, mad: Column): Column =
    when(mad === 0,
      when(abs(v - med) === 0, lit(0.0)).otherwise(lit(Double.PositiveInfinity)))
      .otherwise(abs(v - med) / (lit(1.4826) * mad))
}
