package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table plumbing shared by every query entry point.
  *
  * Scale notes (100 TB design intent): all table loads go through
  * [[Engine.table]] so a future move from loose parquet files to a
  * partitioned/bucketed catalog is a one-line change. Sessions created
  * here pin `spark.sql.shuffle.partitions` to the local core count and
  * enable AQE (runtime coalescing + skew-join splitting), which is what
  * a 1000-executor deployment would run with too.
  */
object Engine {

  /** All driver-provided test tables (TESTDATA.md). */
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def session(appName: String = "graft", cores: String = "32"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark's vectorized
      // reader refuses; read as raw ns-since-epoch longs and reduce with
      // exact integer arithmetic (see EventOps).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // engine extensions: bounded-edit-distance rewrite (GraftExtensions)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // getOrCreate IGNORES every builder config when a session already
    // exists in the JVM — a silent mismatch here means ns parquet reads
    // throw, the optimizer extension is absent, and the core count lies.
    // Fail loudly instead (the configs below are session-scoped, so a
    // same-JVM second caller CAN differ only on master/extensions).
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true"
        && spark.conf.get("spark.sql.extensions", "").contains("GraftExtensions"),
      "pre-existing SparkSession lacks graft configs (nanosAsLong/extensions) — " +
        "stop it before calling Engine.session")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  /** Read one TESTDATA table from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Round-robin repartition to the session's shuffle parallelism.
    *
    * For the probe side of pair-generating joins (LSH buckets, blocked
    * self-joins, ANN candidate scans): join work is quadratic in block
    * sizes while probe parallelism is whatever the upstream SCAN
    * produced, so a small or compacted input (a single file split)
    * silently serializes the whole join onto one core. Spreading the
    * linear-size probe rows first is cheap relative to the join and
    * restores full-cluster parallelism at any scale. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sessionState.conf.numShufflePartitions)
}
