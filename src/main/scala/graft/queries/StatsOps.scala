package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.table
import graft.operators.{Scd2, Stats}

/** Warehouse-history + distribution-statistics surface: SCD2 version
  * intervals (q73), per-group closed-form regression (q74), robust
  * median/MAD outlier scoring (q75), and an exact integer-domain
  * equi-width histogram (q76). All oracles replay the identical
  * arithmetic in DuckDB; q76 works in scaled integer cents so bin
  * boundaries are exact on both engines.
  */
object StatsOps {

  /** SCD2 over order priority per customer: each run of equal
    * priorities (by order date, orderkey tiebreak) becomes one
    * validity interval. */
  private def q73(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "orders").select(
      col("o_custkey"),
      to_date(col("o_orderdate")).as("d"),
      col("o_orderkey"),
      col("o_orderpriority"))
    Scd2.history(ev, "o_custkey", "d", "o_orderkey", "o_orderpriority")
      .select(col("o_custkey"), col("o_orderpriority").as("priority"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("priority"))
  }

  private val q73Sql =
    """WITH ev AS (SELECT o_custkey, o_orderdate::DATE AS d, o_orderkey, o_orderpriority
          FROM orders),
        ch AS (SELECT *, lag(o_orderpriority)
                 OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev FROM ev),
        f AS (SELECT o_custkey, o_orderpriority, d, o_orderkey FROM ch
              WHERE prev IS NULL OR prev <> o_orderpriority)
        SELECT o_custkey, o_orderpriority AS priority, d AS valid_from,
          lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS valid_to,
          (CASE WHEN lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey)
                IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_current
        FROM f ORDER BY o_custkey, valid_from, priority"""

  /** Per-returnflag OLS of extended price on quantity. */
  private def q74(s: SparkSession, dir: String): DataFrame =
    Stats.groupedRegression(table(s, dir, "lineitem"),
        "l_returnflag", "l_quantity", "l_extendedprice")
      .select(col("l_returnflag"), col("n"),
        roundSafe(col("slope"), 6).as("slope"),
        roundSafe(col("intercept"), 6).as("intercept"),
        roundSafe(col("r2"), 6).as("r2"))
      .orderBy(col("l_returnflag"))

  private val q74Sql =
    """SELECT l_returnflag, count(*)::BIGINT AS n,
         round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 6) AS slope,
         round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 6) AS intercept,
         round(corr(l_extendedprice, l_quantity) * corr(l_extendedprice, l_quantity)
               + 1e-9, 6) AS r2
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  /** Robust outlier scan of event values per type (3 robust sigmas). */
  private def q75(s: SparkSession, dir: String): DataFrame =
    Stats.robustOutliers(table(s, dir, "events").select(col("event_type"), col("value")),
        "event_type", "value", 3.0)
      .select(col("event_type"), col("n"), col("n_outliers"),
        roundSafe(col("med"), 6).as("med"), roundSafe(col("mad"), 6).as("mad"))
      .orderBy(col("event_type"))

  private val q75Sql =
    """WITH m AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
        d AS (SELECT e.event_type, e.value, m.med FROM events e JOIN m USING (event_type)),
        md AS (SELECT event_type, median(abs(value - med)) AS mad FROM d GROUP BY 1)
       SELECT d.event_type, count(*)::BIGINT AS n,
         sum(CASE WHEN abs(d.value - d.med) > 3.0 * 1.4826 * md.mad
             THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
         round(max(d.med) + 1e-9, 6) AS med,
         round(max(md.mad) + 1e-9, 6) AS mad
       FROM d JOIN md USING (event_type) GROUP BY 1 ORDER BY 1"""

  private val HistBins = 20

  /** Equi-width histogram of order totals in exact integer cents. */
  private def q76(s: SparkSession, dir: String): DataFrame =
    Stats.intHistogram(
        table(s, dir, "orders")
          .select(round(col("o_totalprice") * 100).cast("long").as("cents")),
        "cents", HistBins)
      .select(col("bin"), col("lo"), col("hi"), col("cnt"))
      .orderBy(col("bin"))

  private val q76Sql =
    s"""WITH c AS (SELECT round(o_totalprice * 100)::BIGINT AS v FROM orders),
        b AS (SELECT min(v) AS mn, max(v) AS mx FROM c),
        w AS (SELECT mn, (mx - mn) // $HistBins + 1 AS width FROM b),
        h AS (SELECT (v - mn) // width AS bin, mn, width FROM c CROSS JOIN w)
        SELECT bin::BIGINT AS bin, (mn + bin * width)::BIGINT AS lo,
          (mn + (bin + 1) * width - 1)::BIGINT AS hi, count(*)::BIGINT AS cnt
        FROM h GROUP BY bin, mn, width ORDER BY bin"""

  val all: Seq[Q] = Seq(
    Q("q73_scd2_history", q73 _, Some(q73Sql)),
    Q("q74_grouped_regression", q74 _, Some(q74Sql)),
    Q("q75_robust_outliers", q75 _, Some(q75Sql)),
    Q("q76_histogram", q76 _, Some(q76Sql)))
}
