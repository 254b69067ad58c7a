package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{lit, round}

package object queries {

  /** Cross-engine-stable rounding for float AGGREGATES whose exact
    * decimal value can land ON a rounding half (sums/avgs of 2-decimal
    * money): Spark rounds the shortest decimal repr HALF_UP while
    * DuckDB rounds the binary double, so exact halves disagree. The
    * 1e-9 nudge (applied identically on both sides — see sqlRoundSafe)
    * moves every half strictly above the boundary; data grids here are
    * >= 1e-6 apart so no other value crosses. The DuckDB oracles inline
    * the identical `round((expr) + 1e-9, s)` form — keep the two in
    * lockstep when changing the guard. */
  def roundSafe(c: Column, scale: Int): Column = round(c + lit(1e-9), scale)

  /** One driver-gradeable query: a Spark plan builder plus (where the
    * semantics are ANSI-SQL-expressible) a DuckDB oracle over the same
    * parquet tables. Output-column conventions, so the Spark parquet
    * schema and the DuckDB result schema agree byte-for-byte:
    *   - integers  -> BIGINT  (Spark `.cast("long")`, SQL `::BIGINT`)
    *   - floats    -> DOUBLE, rounded at a fixed scale on BOTH sides so
    *                  parallel-summation ulp drift can't break hashes
    *   - temporals -> DATE (never raw ns timestamps)
    *   - identical aliases on both sides; deterministic full ORDER BY
    */
  final case class Q(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String] = None)
}
