package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {

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
