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
         round(regr_slope(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) + 1e-9, 6) AS slope,
         round(regr_intercept(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) + 1e-9, 6) AS intercept,
         round(corr(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) *
               corr(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE))
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
    """WITH m AS (SELECT event_type, median(CAST(value AS DOUBLE)) AS med FROM events GROUP BY 1),
        d AS (SELECT e.event_type, CAST(e.value AS DOUBLE) AS value, m.med FROM events e JOIN m USING (event_type)),
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

  private val SampleK = 20

  /** Weighted sampling without replacement (Efraimidis–Spirakis
    * priority sampling), derandomized: u comes from the portable md5
    * hash of the doc id, key = u^(1/w) with w = doc length, per-source
    * top-k by key. One window per source — the reproducible
    * quality-weighted corpus draw (pairs with q43's uniform strata and
    * q58's mixture weights). Keys are rounded (9 dp) BEFORE ranking so
    * both engines rank identical values; doc_id breaks residual ties. */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = table(s, dir, "documents")
    val u = (pmod(graft.functions.TextFunctions.tokenHash(
        concat(lit("ws#"), col("doc_id").cast("string"))), lit(1048576L))
      .cast("double") + lit(0.5)) / lit(1048576.0)
    val w = greatest(col("n_chars").cast("double"), lit(1.0))
    val keyed = docs.select(col("source"), col("doc_id"),
      roundSafe(pow(u, lit(1.0) / w), 9).as("key"))
    val win = Window.partitionBy(col("source")).orderBy(col("key").desc, col("doc_id"))
    keyed.withColumn("rk", row_number().over(win))
      .where(col("rk") <= SampleK)
      .select(col("source"), col("doc_id"), col("key"), col("rk").cast("long").as("rk"))
      .orderBy(col("source"), col("rk"))
  }

  private val q81Sql = {
    val hash = graft.functions.TextFunctions.sqlTokenHash("'ws#' || doc_id::VARCHAR")
    s"""WITH k AS (SELECT source, doc_id,
            round(pow((($hash % 1048576)::DOUBLE + 0.5) / 1048576.0,
                      1.0 / greatest(n_chars::DOUBLE, 1.0)) + 1e-9, 9) AS key
          FROM documents),
        r AS (SELECT *, row_number() OVER (PARTITION BY source
                ORDER BY key DESC, doc_id) AS rk FROM k)
        SELECT source, doc_id, key, rk::BIGINT AS rk FROM r
        WHERE rk <= $SampleK ORDER BY source, rk"""
  }

  /** Chi-square independence cells for source × lang: observed count,
    * expected under independence, per-cell contribution. Marginals are
    * two tiny aggs broadcast back onto the |sources|×|langs| cell table
    * — the whole test is one scan plus broadcasts at any corpus size. */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val docs = table(s, dir, "documents")
    val obs = docs.groupBy(col("source"), col("lang")).agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy(col("source")).agg(sum(col("o")).as("rt"))
    val colT = obs.groupBy(col("lang")).agg(sum(col("o")).as("ct"))
    val tot = obs.agg(sum(col("o")).cast("double").as("n"))
    obs.join(broadcast(rowT), "source")
      .join(broadcast(colT), "lang")
      .join(broadcast(tot))
      .withColumn("e", col("rt") * col("ct") / col("n"))
      .select(col("source"), col("lang"), col("o"),
        roundSafe(col("e"), 6).as("expected"),
        roundSafe((col("o") - col("e")) * (col("o") - col("e")) / col("e"), 6)
          .as("chi2_cell"))
      .orderBy(col("source"), col("lang"))
  }

  private val q83Sql =
    """WITH obs AS (SELECT source, lang, count(*)::BIGINT AS o
          FROM documents GROUP BY 1, 2),
        rt AS (SELECT source, sum(o) AS rt FROM obs GROUP BY 1),
        ct AS (SELECT lang, sum(o) AS ct FROM obs GROUP BY 1),
        n AS (SELECT sum(o)::DOUBLE AS n FROM obs)
       SELECT obs.source, obs.lang, o,
         round(rt * ct / n.n + 1e-9, 6) AS expected,
         round((o - rt * ct / n.n) * (o - rt * ct / n.n) / (rt * ct / n.n) + 1e-9, 6)
           AS chi2_cell
       FROM obs JOIN rt USING (source) JOIN ct USING (lang) CROSS JOIN n
       ORDER BY source, lang"""

  /** Grouped top-k through the custom [[graft.functions.TopKPairs]]
    * TypedImperativeAggregate: ONE hash aggregate with map-side
    * k-bounded heaps instead of the window idiom's full per-group sort
    * — each partition forwards ≤ k rows per group across the exchange.
    * The oracle replays it as the window form (identical tie order:
    * score desc, id asc), pinning the aggregate's semantics. */
  private def q84(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.TopKAgg.topK(col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"), (col("pos") + 1).cast("long").as("rank"),
        roundSafe(col("col").getField("score"), 2).as("price"),
        col("col").getField("id").as("o_orderkey"))
      .orderBy(col("o_orderpriority"), col("rank"))

  private val q84Sql =
    """SELECT o_orderpriority, rank::BIGINT AS rank,
         round(o_totalprice + 1e-9, 2) AS price, o_orderkey
       FROM (SELECT *, row_number() OVER (PARTITION BY o_orderpriority
               ORDER BY o_totalprice DESC, o_orderkey) AS rank FROM orders)
       WHERE rank <= 3 ORDER BY o_orderpriority, rank"""

  /** Column profiling (data-quality QA): per-column row/null/distinct
    * counts for the orders table — the schema-drift / completeness
    * monitor a warehouse load runs after every batch. One aggregate
    * per profiled column, unioned; each is a single-pass hash agg. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val o = table(s, dir, "orders")
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")
    cols.map { c =>
      o.agg(
        count(lit(1)).as("n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("column_name"), col("n"), col("n_null"), col("n_distinct"))
    }.reduce(_ unionByName _).orderBy(col("column_name"))
  }

  private val q86Sql = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderpriority")
    cols.map { c =>
      s"""SELECT '$c' AS column_name, count(*)::BIGINT AS n,
            sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
            count(DISTINCT $c)::BIGINT AS n_distinct FROM orders"""
    }.mkString("", " UNION ALL ", " ORDER BY column_name")
  }

  val all: Seq[Q] = Seq(
    Q("q73_scd2_history", q73 _, Some(q73Sql)),
    Q("q74_grouped_regression", q74 _, Some(q74Sql)),
    Q("q75_robust_outliers", q75 _, Some(q75Sql)),
    Q("q76_histogram", q76 _, Some(q76Sql)),
    Q("q81_weighted_sample", q81 _, Some(q81Sql)),
    Q("q83_chi_square", q83 _, Some(q83Sql)),
    Q("q84_topk_agg", q84 _, Some(q84Sql)),
    Q("q86_column_profile", q86 _, Some(q86Sql)),
    // oracle = q73's full-recompute CTE: incremental merge must equal
    // rebuilding the whole history from scratch
    Q("q92_scd2_merge", q92 _, Some(q73Sql)),
    Q("q94_asof_dimension", q94 _, Some(q94Sql)))

  /** Point-in-time dimension lookup — the consumption side of SCD2:
    * each fact row joins the version whose validity interval covers
    * its date (equi-join on the entity + residual interval predicate;
    * zero-length same-day versions self-exclude, so exactly one
    * version matches per fact). This is the "what was the customer's
    * priority WHEN the order happened" query the history exists for.
    * Capped to a key slice so the verify output stays proportionate —
    * the join shape is identical uncapped. */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "orders").select(
      col("o_custkey"), to_date(col("o_orderdate")).as("d"),
      col("o_orderkey"), col("o_orderpriority"))
    val hist = Scd2.history(ev, "o_custkey", "d", "o_orderkey", "o_orderpriority")
      .select(col("o_custkey").as("h_cust"), col("o_orderpriority").as("asof_priority"),
        col("valid_from"), col("valid_to"))
    ev.where(col("o_custkey") % 10 === 3)
      .join(hist, col("o_custkey") === col("h_cust") &&
        col("valid_from") <= col("d") &&
        (col("valid_to").isNull || col("d") < col("valid_to")))
      .select(col("o_orderkey"), col("o_custkey"), col("d"), col("asof_priority"))
      .orderBy(col("o_orderkey"))
  }

  private lazy val q94Sql =
    """WITH ev AS (SELECT o_custkey, o_orderdate::DATE AS d, o_orderkey, o_orderpriority
          FROM orders),
        ch AS (SELECT *, lag(o_orderpriority)
                 OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS prev FROM ev),
        f AS (SELECT o_custkey, o_orderpriority, d, o_orderkey FROM ch
              WHERE prev IS NULL OR prev <> o_orderpriority),
        v AS (SELECT o_custkey AS h_cust, o_orderpriority AS asof_priority,
                d AS valid_from,
                lead(d) OVER (PARTITION BY o_custkey ORDER BY d, o_orderkey) AS valid_to
              FROM f)
       SELECT e.o_orderkey, e.o_custkey, e.d, v.asof_priority
       FROM ev e JOIN v ON e.o_custkey = v.h_cust
         AND v.valid_from <= e.d
         AND (v.valid_to IS NULL OR e.d < v.valid_to)
       WHERE e.o_custkey % 10 = 3
       ORDER BY e.o_orderkey"""

  /** Incremental SCD2 fold: standing history from pre-1997 orders,
    * 1997+ orders as the append-only batch, merged without re-reading
    * prior events — graded against full recomputation. */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val ev = table(s, dir, "orders").select(
      col("o_custkey"),
      to_date(col("o_orderdate")).as("d"),
      col("o_orderkey"),
      col("o_orderpriority"))
    val cutoff = lit(java.sql.Date.valueOf("1997-01-01"))
    val prior = Scd2.historyKeepTie(ev.where(col("d") < cutoff),
      "o_custkey", "d", "o_orderkey", "o_orderpriority")
    Scd2.mergeHistory(prior, ev.where(col("d") >= cutoff),
        "o_custkey", "d", "o_orderkey", "o_orderpriority")
      .select(col("o_custkey"), col("o_orderpriority").as("priority"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("o_custkey"), col("valid_from"), col("priority"))
  }
}
