package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Engine.table

/** The relational operator surface of SURVEY.md §2 (scans, projections,
  * filters, joins, aggregations, windows, sorts, set ops, scalar
  * functions), re-expressed over the driver's TPC-H-ish tables.
  *
  * Scale design: dimension joins are explicitly `broadcast()` (region /
  * nation / supplier stay tiny at any SF); fact-fact joins shuffle on
  * their equi-keys and rely on AQE for runtime coalescing + skew
  * splitting; every aggregate is a hash aggregate with map-side partial
  * combine; filters sit directly on scan columns so Catalyst pushes
  * them into the parquet reader.
  */
object Relational {

  /** Aggregation A1-A4: grouped sum/avg/count with expression arithmetic
    * (TPC-H Q1 shape). Ref: extract_sectors.py:390-395, parse_jobs.py:462. */
  private def q01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(sum($"l_quantity"), 2).as("sum_qty"),
        roundSafe(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("sum_disc_price"),
        roundSafe(avg($"l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("cnt"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  private val q01Sql =
    """SELECT l_returnflag, l_linestatus,
       round(sum(CAST(l_quantity AS DOUBLE)), 2) AS sum_qty,
       round((sum(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)))) + 1e-9, 2) AS sum_disc_price,
       round((avg(CAST(l_discount AS DOUBLE))) + 1e-9, 6) AS avg_disc,
       count(*) AS cnt
       FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""

  /** Projection/filter P1-P5: predicates directly on scan columns so they
    * push into the parquet reader (PushedFilters), derived-column math.
    * Ref: consume_jobs.py:116-139. */
  private def q02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .filter($"l_shipdate" >= lit("2001-01-01").cast("timestamp") &&
        $"l_discount" > 0.05 && $"l_quantity" >= 30)
      .select(
        $"l_orderkey",
        $"l_linenumber".cast("long").as("line_no"),
        to_date($"l_shipdate").as("ship_date"),
        roundSafe($"l_extendedprice" * (lit(1) - $"l_discount") * (lit(1) + $"l_tax"), 4)
          .as("charge"))
      .orderBy($"l_orderkey", $"line_no")
  }

  private val q02Sql =
    """SELECT l_orderkey, l_linenumber::BIGINT AS line_no,
       CAST(l_shipdate AS DATE) AS ship_date,
       round((CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) * (1 + CAST(l_tax AS DOUBLE))) + 1e-9, 4) AS charge
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '2001-01-01' AND CAST(l_discount AS DOUBLE) > 0.05
         AND CAST(l_quantity AS DOUBLE) >= 30
       ORDER BY l_orderkey, line_no"""

  /** Join J2: star-schema join, small dims broadcast, facts shuffled on
    * equi-keys (TPC-H Q5 shape). Ref: load_to_bigquery.py:156-176. */
  private def q03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "lineitem")
      .join(table(s, dir, "orders"), $"l_orderkey" === $"o_orderkey")
      .join(table(s, dir, "customer"), $"o_custkey" === $"c_custkey")
      .join(broadcast(table(s, dir, "nation")), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(table(s, dir, "region")), $"n_regionkey" === $"r_regionkey")
      .where($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(
        roundSafe(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2).as("revenue"),
        countDistinct($"o_orderkey").as("n_orders"))
      .orderBy($"n_name")
  }

  private val q03Sql =
    """SELECT n_name,
       round((sum(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)))) + 1e-9, 2) AS revenue,
       count(DISTINCT o_orderkey) AS n_orders
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       JOIN region   ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
       GROUP BY n_name ORDER BY n_name"""

  /** Join J1: left-anti (the reference's dedup "drop listed ids" join,
    * deduplicate.py:304-306, expressed natively). */
  private def q04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "customer")
      .join(table(s, dir, "orders"), $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name")
      .orderBy($"c_custkey")
  }

  private val q04Sql =
    """SELECT c_custkey, c_name FROM customer
       WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
       ORDER BY c_custkey"""

  /** Left-semi join (EXISTS): customers with at least one big order. */
  private def q05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bigOrders = table(s, dir, "orders").filter($"o_totalprice" > 400000)
    table(s, dir, "customer")
      .join(bigOrders, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  private val q05Sql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
       WHERE EXISTS (SELECT 1 FROM orders
                     WHERE o_custkey = c_custkey AND CAST(o_totalprice AS DOUBLE) > 400000)
       ORDER BY c_custkey"""

  /** Join J4: self-pairing within a block — the idiomatic form of the
    * reference's O(n^2)-inside-a-UDF dedup comparison
    * (deduplicate.py:236-270). Pairs of suppliers in one nation. */
  private def q06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sup = table(s, dir, "supplier")
    val a = sup.select($"s_suppkey".as("k1"), $"s_name".as("name1"), $"s_nationkey".as("nk"))
    val b = sup.select($"s_suppkey".as("k2"), $"s_name".as("name2"), $"s_nationkey".as("nkb"))
    a.join(b, $"nk" === $"nkb" && $"k1" < $"k2")
      .select($"nk".cast("long").as("nationkey"), $"k1", $"k2")
      .orderBy($"nationkey", $"k1", $"k2")
  }

  private val q06Sql =
    """SELECT a.s_nationkey::BIGINT AS nationkey,
              a.s_suppkey AS k1, b.s_suppkey AS k2
       FROM supplier a JOIN supplier b
         ON a.s_nationkey = b.s_nationkey AND a.s_suppkey < b.s_suppkey
       ORDER BY nationkey, k1, k2"""

  /** Window W1: keep-best-per-group via row_number — the *intended*
    * dedup semantics of the reference (dead helper deduplicate.py:142-167,
    * see SURVEY §2.11.1). */
  private def q07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
    table(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .orderBy($"o_custkey")
  }

  private val q07Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice FROM (
         SELECT *, row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_totalprice AS DOUBLE) DESC, o_orderkey) AS rn
         FROM orders) t
       WHERE rn = 1 ORDER BY o_custkey"""

  /** Window frames: running total + lag per customer (dashboard trend
    * queries, PLAN_REALISATION.md:481-527). */
  private def q08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    table(s, dir, "orders")
      .select(
        $"o_custkey", $"o_orderkey",
        round(sum($"o_totalprice").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("run_total"),
        round(lag($"o_totalprice", 1).over(w), 2).as("prev_price"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  private val q08Sql =
    """SELECT o_custkey, o_orderkey,
       round(sum(CAST(o_totalprice AS DOUBLE)) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
       round(lag(CAST(o_totalprice AS DOUBLE), 1) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 2) AS prev_price
       FROM orders ORDER BY o_custkey, o_orderkey"""

  /** Sort/limit O1-O2: top-k (Spark plans TakeOrderedAndProject — no full
    * sort at scale). Rank on the ROUNDED value so both engines rank
    * identical numbers. Ref: extract_sectors.py:396-399. */
  private def q09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .groupBy($"o_custkey")
      .agg(round(sum($"o_totalprice"), 2).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"revenue".desc, $"o_custkey")
      .limit(20)
  }

  private val q09Sql =
    """SELECT o_custkey, round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS revenue,
              count(*) AS n_orders
       FROM orders GROUP BY o_custkey
       ORDER BY revenue DESC, o_custkey LIMIT 20"""

  /** Set op U1: union of two projections + distinct
    * (deduplicate.py:287-300). */
  private def q10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = table(s, dir, "customer")
    val a = c.filter($"c_mktsegment" === "BUILDING")
      .select($"c_nationkey".cast("long").as("nationkey"))
    val b = c.filter($"c_mktsegment" === "MACHINERY")
      .select($"c_nationkey".cast("long").as("nationkey"))
    a.union(b).distinct().orderBy($"nationkey")
  }

  private val q10Sql =
    """SELECT c_nationkey::BIGINT AS nationkey FROM customer
       WHERE c_mktsegment = 'BUILDING'
       UNION
       SELECT c_nationkey::BIGINT FROM customer
       WHERE c_mktsegment = 'MACHINERY'
       ORDER BY nationkey"""

  /** Conditional aggregation A4 + quality-score arithmetic P6
    * (extract_salary.py:405-410, parse_jobs.py:437-441). */
  private def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        count(when($"o_totalprice" > 150000, 1)).as("big_cnt"),
        roundSafe(avg($"o_totalprice"), 2).as("avg_price"),
        roundSafe(avg(when($"o_orderstatus" === "O", 1.0).otherwise(0.0)), 4)
          .as("frac_open"),
        count(lit(1)).as("cnt"))
      .orderBy($"o_orderpriority")
  }

  private val q11Sql =
    """SELECT o_orderpriority,
       count(CASE WHEN CAST(o_totalprice AS DOUBLE) > 150000 THEN 1 END) AS big_cnt,
       round((avg(CAST(o_totalprice AS DOUBLE))) + 1e-9, 2) AS avg_price,
       round((avg(CASE WHEN o_orderstatus = 'O' THEN 1.0 ELSE 0.0 END)) + 1e-9, 4) AS frac_open,
       count(*) AS cnt
       FROM orders GROUP BY 1 ORDER BY 1"""

  /** Aggregation A1: grouped collect (the reference's dedup blocking
    * collect_list, deduplicate.py:208-231) — sorted for determinism. */
  private def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "customer")
      .groupBy($"c_mktsegment")
      .agg(
        // joined to one string: the driver's comparator sorts rows by
        // every output column, which array-typed cells break
        concat_ws(",", sort_array(collect_set($"c_nationkey".cast("long")))).as("nations"),
        count(lit(1)).as("cnt"))
      .orderBy($"c_mktsegment")
  }

  private val q12Sql =
    """SELECT c_mktsegment,
       array_to_string(list_sort(list_distinct(list(c_nationkey::BIGINT))), ',') AS nations,
       count(*) AS cnt
       FROM customer GROUP BY 1 ORDER BY 1"""

  /** Scalar string functions §2.8: regexp_extract, split/element_at,
    * case funcs, levenshtein, md5, concat_ws. */
  private def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "part")
      .select(
        $"p_partkey",
        regexp_extract($"p_brand", "Brand#([0-9]+)", 1).cast("long").as("brand_num"),
        element_at(split($"p_name", " "), 1).as("name_first"),
        upper($"p_name").as("name_upper"),
        length($"p_name").cast("long").as("name_len"),
        levenshtein($"p_brand", lit("Brand#13")).cast("long").as("brand_lev"),
        md5(concat_ws("|", $"p_brand", $"p_type")).as("tag_md5"),
        concat_ws("-", $"p_brand", $"p_type").as("tag"))
      .orderBy($"p_partkey")
  }

  private val q13Sql =
    """SELECT p_partkey,
       regexp_extract(p_brand, 'Brand#([0-9]+)', 1)::BIGINT AS brand_num,
       string_split(p_name, ' ')[1] AS name_first,
       upper(p_name) AS name_upper,
       length(p_name)::BIGINT AS name_len,
       levenshtein(p_brand, 'Brand#13')::BIGINT AS brand_lev,
       md5(concat_ws('|', p_brand, p_type)) AS tag_md5,
       concat_ws('-', p_brand, p_type) AS tag
       FROM part ORDER BY p_partkey"""

  /** Date/time functions §2.8: year/month/day parts, month truncation,
    * day arithmetic (consume_jobs.py:117-121, load_to_bigquery.py:179-183). */
  private def q14(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .select(
        $"o_orderkey",
        year($"o_orderdate").cast("long").as("yr"),
        month($"o_orderdate").cast("long").as("mo"),
        dayofmonth($"o_orderdate").cast("long").as("dy"),
        date_trunc("month", $"o_orderdate").cast("date").as("month_start"),
        datediff(lit("2002-01-01").cast("date"), to_date($"o_orderdate"))
          .cast("long").as("days_to_2002"))
      .orderBy($"o_orderkey")
  }

  private val q14Sql =
    """SELECT o_orderkey,
       year(o_orderdate)::BIGINT AS yr,
       month(o_orderdate)::BIGINT AS mo,
       day(o_orderdate)::BIGINT AS dy,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')::BIGINT
         AS days_to_2002
       FROM orders ORDER BY o_orderkey"""

  /** SQL text interface (the engine's spark.sql surface): one dialect-
    * portable statement executed verbatim by BOTH engines. */
  private val q34Text =
    """SELECT n_name,
       round((sum(CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)))) + 1e-9, 2) AS revenue,
       count(*) AS cnt
       FROM lineitem
       JOIN orders   ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation   ON c_nationkey = n_nationkey
       GROUP BY n_name ORDER BY n_name"""

  private def q34(s: SparkSession, dir: String): DataFrame = {
    Seq("lineitem", "orders", "customer", "nation").foreach { t =>
      table(s, dir, t).createOrReplaceTempView(t)
    }
    s.sql(q34Text)
  }

  /** Aggregation A3: global scalar aggregate, no grouping
    * (parse_jobs.py:462-463, extract_skills.py:359-365). */
  private def q36(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders").agg(
      count(lit(1)).as("n_orders"),
      roundSafe(avg($"o_totalprice"), 2).as("avg_price"),
      round(sum($"o_totalprice"), 2).as("total_price"),
      countDistinct($"o_custkey").as("n_customers"))
  }

  private val q36Sql =
    """SELECT count(*) AS n_orders,
       round((avg(CAST(o_totalprice AS DOUBLE))) + 1e-9, 2) AS avg_price,
       round(sum(CAST(o_totalprice AS DOUBLE)), 2) AS total_price,
       count(DISTINCT o_custkey) AS n_customers
       FROM orders"""

  /** Multi-level aggregation (beyond the reference's surface): ROLLUP
    * over (year, priority) — subtotal + grand-total rows in one pass. */
  private def q37(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .select(year($"o_orderdate").cast("long").as("yr"),
        $"o_orderpriority", $"o_totalprice")
      .rollup($"yr", $"o_orderpriority")
      .agg(count(lit(1)).as("cnt"), round(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"yr".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }

  private val q37Sql =
    """SELECT year(o_orderdate)::BIGINT AS yr, o_orderpriority,
       count(*) AS cnt, round(sum(o_totalprice), 2) AS total
       FROM orders
       GROUP BY ROLLUP (yr, o_orderpriority)
       ORDER BY yr ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""

  /** Approximate distinct (HLL) next to the exact count — the sketch
    * path a 100 TB deployment uses for dashboard cardinalities. Sketch
    * internals differ across engines, so the gate is rows-only plus a
    * relative-error bound asserted in tests. */
  private def q38(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Spark's HLL++ sketch value itself can't be replayed by another
    // engine, so the hashed contract is (exact count, error-bound flag):
    // the oracle asserts the approx landed within 10% of exact (5x the
    // 2% rsd — deterministic for a given dataset; EntrySpec pins the
    // tighter 5% margin at sf0.01).
    //
    // NOT countDistinct + approx in one agg: that shape forces
    // RewriteDistinctAggregates to evaluate the HLL++ sketch per
    // DISTINCT (flag, partkey) group, and the first exchange then
    // carries a 410-word (~3.3 KB) partial-sketch buffer on every
    // group — ~200 MB shuffled at sf0.1 for a 60k-pair dedup
    // (plans/r17/q38_approx_distinct_before.txt, r17 optimization).
    // HLL insertion is duplicate-insensitive (same hash → same
    // register; merging per-group sketches == inserting all values),
    // so dedup the narrow pairs first and sketch the survivors:
    // identical estimate, exact = count of non-null deduped keys
    // (count(col) skips the at-most-one (flag, NULL) survivor exactly
    // as countDistinct did), and both exchanges carry two narrow
    // columns (guide §2.3 — shuffle fewer bytes).
    table(s, dir, "lineitem")
      .select($"l_returnflag", $"l_partkey")
      .dropDuplicates("l_returnflag", "l_partkey")
      .groupBy($"l_returnflag")
      .agg(
        count($"l_partkey").as("exact_parts"),
        approx_count_distinct($"l_partkey", 0.02).as("approx"))
      .select($"l_returnflag", $"exact_parts",
        (abs($"approx" - $"exact_parts") <= $"exact_parts" * 0.1)
          .cast("long").as("approx_within_10pct"))
      .orderBy($"l_returnflag")
  }

  private val q38Sql =
    """SELECT l_returnflag, count(DISTINCT l_partkey)::BIGINT AS exact_parts,
       1::BIGINT AS approx_within_10pct
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * ANSI percentile_cont == DuckDB quantile_cont). */
  private def q39(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.75)"), 4).as("p75"))
      .orderBy($"o_orderpriority")
  }

  private val q39Sql =
    """SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 4) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.75), 4) AS p75
       FROM orders GROUP BY 1 ORDER BY 1"""

  /** Pivot: order counts per (year x priority) as a wide table. */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    table(s, dir, "orders")
      .select(year($"o_orderdate").cast("long").as("yr"), $"o_orderpriority")
      .groupBy($"yr")
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L, priorities) // only the pivot cells — never the yr key
      .orderBy($"yr")
  }

  private val q40Sql =
    """SELECT year(o_orderdate)::BIGINT AS yr,
       count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
       count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
       count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
       count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
       count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
       FROM orders GROUP BY 1 ORDER BY 1"""

  /** Relational set ops beyond the reference's union (U1): INTERSECT
    * and EXCEPT with distinct semantics, labeled in one result. */
  private def q42(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custNations = table(s, dir, "customer")
      .select($"c_nationkey".cast("long").as("nationkey"))
    val suppNations = table(s, dir, "supplier")
      .select($"s_nationkey".cast("long").as("nationkey"))
    val both = custNations.intersect(suppNations)
      .select(lit("both").as("side"), $"nationkey")
    val custOnly = custNations.except(suppNations)
      .select(lit("cust_only").as("side"), $"nationkey")
    both.unionByName(custOnly).orderBy($"side", $"nationkey")
  }

  private val q42Sql =
    """SELECT 'both' AS side, nationkey FROM (
         SELECT c_nationkey::BIGINT AS nationkey FROM customer
         INTERSECT
         SELECT s_nationkey::BIGINT FROM supplier)
       UNION ALL
       SELECT 'cust_only' AS side, nationkey FROM (
         SELECT c_nationkey::BIGINT AS nationkey FROM customer
         EXCEPT
         SELECT s_nationkey::BIGINT FROM supplier)
       ORDER BY side, nationkey"""

  /** CUBE with grouping_id — all four aggregation granularities of the
    * (priority, status) pair in one pass (§2.4's granularity ladder the
    * dashboards climb; rollup is q37). */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .select($"o_orderpriority", $"o_orderstatus", $"o_totalprice")
      .cube($"o_orderpriority", $"o_orderstatus")
      .agg(
        grouping_id().cast("long").as("gid"),
        count(lit(1)).as("cnt"),
        roundSafe(sum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderpriority".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
  }

  private val q46Sql =
    """SELECT o_orderpriority, o_orderstatus,
       GROUPING(o_orderpriority, o_orderstatus)::BIGINT AS gid,
       count(*) AS cnt, round(sum(o_totalprice) + 1e-9, 2) AS total
       FROM orders
       GROUP BY CUBE (o_orderpriority, o_orderstatus)
       ORDER BY o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""

  /** Ranking-window family §2.5: ntile, percent_rank, cume_dist,
    * lag/lead in one partitioned window (single shuffle on the
    * partition key; all five functions share the sort). */
  private def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    table(s, dir, "orders")
      .select(
        $"o_orderkey", $"o_orderpriority",
        ntile(4).over(w).cast("long").as("quartile"),
        roundSafe(percent_rank().over(w), 6).as("pct_rank"),
        roundSafe(cume_dist().over(w), 6).as("cdist"),
        roundSafe(lag($"o_totalprice", 1).over(w), 2).as("prev_price"),
        roundSafe(lead($"o_totalprice", 1).over(w), 2).as("next_price"))
      .orderBy($"o_orderkey")
  }

  private val q47Sql =
    """SELECT o_orderkey, o_orderpriority,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w + 1e-9, 6) AS pct_rank,
       round(cume_dist() OVER w + 1e-9, 6) AS cdist,
       round(lag(o_totalprice, 1) OVER w + 1e-9, 2) AS prev_price,
       round(lead(o_totalprice, 1) OVER w + 1e-9, 2) AS next_price
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
       ORDER BY o_orderkey"""

  /** Approximate percentile (t-digest-style sketch) next to the exact
    * interpolated percentile — like q38, the sketch value itself is
    * engine-specific, so the hashed contract is (exact, error-bound
    * flag): the 5% tolerance is far above the rank error of accuracy
    * 1000 on any tested SF. */
  private def q48(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    table(s, dir, "orders")
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50_exact"),
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("approx"))
      .select($"o_orderpriority", $"p50_exact",
        (abs($"approx" - $"p50_exact") <= abs($"p50_exact") * 0.05)
          .cast("long").as("approx_within_5pct"))
      .orderBy($"o_orderpriority")
  }

  private val q48Sql =
    """SELECT o_orderpriority, round(quantile_cont(o_totalprice, 0.5), 4) AS p50_exact,
       1::BIGINT AS approx_within_5pct
       FROM orders GROUP BY 1 ORDER BY 1"""

  val all: Seq[Q] = Seq(
    Q("q01_agg", q01 _, Some(q01Sql)),
    Q("q02_filter_project", q02 _, Some(q02Sql)),
    Q("q03_star_join", q03 _, Some(q03Sql)),
    Q("q04_left_anti", q04 _, Some(q04Sql)),
    Q("q05_left_semi", q05 _, Some(q05Sql)),
    Q("q06_self_join_pairs", q06 _, Some(q06Sql)),
    Q("q07_window_keep_best", q07 _, Some(q07Sql)),
    Q("q08_window_running", q08 _, Some(q08Sql)),
    Q("q09_topk", q09 _, Some(q09Sql)),
    Q("q10_union_distinct", q10 _, Some(q10Sql)),
    Q("q11_conditional_agg", q11 _, Some(q11Sql)),
    Q("q12_grouped_collect", q12 _, Some(q12Sql)),
    Q("q13_string_funcs", q13 _, Some(q13Sql)),
    Q("q14_date_funcs", q14 _, Some(q14Sql)),
    Q("q34_sql_interface", q34 _, Some(q34Text)),
    Q("q36_global_agg", q36 _, Some(q36Sql)),
    Q("q37_rollup", q37 _, Some(q37Sql)),
    Q("q38_approx_distinct", q38 _, Some(q38Sql)),
    Q("q39_percentiles", q39 _, Some(q39Sql)),
    Q("q40_pivot", q40 _, Some(q40Sql)),
    Q("q42_intersect_except", q42 _, Some(q42Sql)),
    Q("q46_cube", q46 _, Some(q46Sql)),
    Q("q47_window_ranks", q47 _, Some(q47Sql)),
    Q("q48_approx_percentile", q48 _, Some(q48Sql)))
}
