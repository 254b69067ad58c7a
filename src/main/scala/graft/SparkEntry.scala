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

  private def families: Seq[Q] = {
    val fams =
      Relational.all ++ TextOps.all ++ VectorOps.all ++ EventOps.all ++
        DomainOps.all ++ TrainingOps.all ++ MatchOps.all ++ KernelOps.all ++
        MediaOps.all ++ GraphOps.all ++ SearchOps.all ++ StatsOps.all ++
        IndexOps.all ++ PipelineOps.all ++ CvOps.all
    // toMap would silently DROP a name collision — the shadowed query
    // would vanish from Bench, Verify and the oracle gate with the only
    // symptom being a count nothing checks
    val dup = fams.groupBy(_.name).collect { case (n, qs) if qs.size > 1 => n }
    require(dup.isEmpty, s"duplicate query names: ${dup.mkString(", ")}")
    fams
  }

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. A composite over the documents corpus: quality-score the
    * docs, language-ID them, keep the decent ones, and rank the top
    * terms per predicted language — scan, codegen text kernels,
    * generator, hash aggregate, window top-k in one plan. Delegates to
    * the oracle-gated q102 (TextOps) so the smoke plan and the
    * correctness-gated plan are one definition. */
  def entry(spark: SparkSession): DataFrame =
    TextOps.q102(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    families.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
