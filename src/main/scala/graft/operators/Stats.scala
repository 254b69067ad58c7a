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
    * covariance/variance closed form (what SQL regr_slope computes). */
  def groupedRegression(df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val x = col(xCol).cast("double"); val y = col(yCol).cast("double")
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
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("med"))
      .withColumnRenamed(groupCol, "__g_med")
    val withMed = df.select(col(groupCol), v.as("__v"))
      .join(broadcast(med), col(groupCol) <=> col("__g_med")).drop("__g_med")
    val mad = withMed.groupBy(col(groupCol))
      .agg(expr("percentile(abs(__v - med), 0.5)").as("mad"))
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
    * last bin and every bin index is in [0, bins). */
  def intHistogram(df: DataFrame, valueCol: String, bins: Int): DataFrame = {
    require(bins > 0)
    val v = col(valueCol).cast("long")
    val bounds = df.agg(min(v).as("mn"), max(v).as("mx"))
    df.select(v.as("__v"))
      .join(broadcast(bounds))
      .withColumn("width", floor((col("mx") - col("mn")) / bins).cast("long") + lit(1L))
      .withColumn("bin", floor((col("__v") - col("mn")) / col("width")).cast("long"))
      .groupBy(col("bin"), col("mn"), col("width"))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("bin"),
        (col("mn") + col("bin") * col("width")).as("lo"),
        (col("mn") + (col("bin") + 1) * col("width") - 1).as("hi"),
        col("cnt"))
  }

  /** Column form of the robust z-score for reuse in filters. */
  def robustZ(v: Column, med: Column, mad: Column): Column =
    abs(v - med) / (lit(1.4826) * mad)
}
