package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2 (or one of
  * the added large-scale-pipeline operators), expressed Spark-first over
  * the driver's TPC-H-ish test tables; [[oracleSql]] carries the DuckDB
  * equivalent the driver hashes against.
  */
object SparkEntry {

  private def families: Seq[Q] =
    Relational.all ++ TextOps.all ++ VectorOps.all ++ EventOps.all ++ DomainOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
