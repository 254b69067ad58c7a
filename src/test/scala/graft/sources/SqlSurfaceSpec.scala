package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** DDL surface (SURVEY S10): the warehouse schema as Spark SQL
  * partitioned-table DDL, plus writes and partition-pruned reads. */
class SqlSurfaceSpec extends AnyFunSuite {

  test("CREATE TABLE ... USING parquet PARTITIONED BY round-trips") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    spark.sql("DROP TABLE IF EXISTS fact_offres_test")
    spark.sql(s"""
      CREATE TABLE fact_offres_test (
        offre_id STRING, titre_poste STRING, entreprise_id STRING,
        salaire_min BIGINT, competences ARRAY<STRING>,
        date_publication DATE)
      USING parquet
      PARTITIONED BY (date_publication)
      LOCATION '$wh/fact_offres_test'""")
    spark.sql("""
      INSERT INTO fact_offres_test VALUES
        ('J1', 'Dev', 'ENT_A', 500000, array('Python'), DATE '2025-12-01'),
        ('J2', 'Ops', 'ENT_B', 400000, array('Docker'), DATE '2025-12-02')""")
    val pruned = spark.sql("""
      SELECT offre_id FROM fact_offres_test
      WHERE date_publication = DATE '2025-12-01'""")
    assert(pruned.collect().map(_.getString(0)).toSeq == Seq("J1"))
    // partition pruning visible in the plan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(spark.sql("SHOW PARTITIONS fact_offres_test").count() == 2)
    spark.sql("DROP TABLE fact_offres_test")
  }

  test("warehouse writer emulates CLUSTER BY with sorted partitions") {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh2").toString
    import spark.implicits._
    val df = Seq(("J1", "ENT_B", java.sql.Date.valueOf("2025-12-01")),
      ("J2", "ENT_A", java.sql.Date.valueOf("2025-12-01")))
      .toDF("offre_id", "entreprise_id", "date_publication")
    new ParquetWarehouse(wh).write(df, "fact", Some("date_publication"),
      Seq("entreprise_id"))
    val back = spark.read.parquet(s"$wh/fact")
    assert(back.count() == 2)
    assert(back.columns.contains("date_publication"))
  }

  test("bucketed tables co-locate the join: no exchange in the plan") {
    import spark.implicits._
    spark.sql("DROP TABLE IF EXISTS fact_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS dim_bucketed_test")
    val fact = (0L until 10000L).map(i => (i % 500, i, i * 2.0))
      .toDF("ent_id", "offre_id", "amount")
    val dim = (0L until 500L).map(i => (i, s"ent_$i"))
      .toDF("ent_id", "nom")
    BucketedWarehouse.writeBucketed(fact, "fact_bucketed_test", "ent_id", 8)
    BucketedWarehouse.writeBucketed(dim, "dim_bucketed_test", "ent_id", 8)
    val joined = spark.table("fact_bucketed_test")
      .join(spark.table("dim_bucketed_test").hint("merge"), "ent_id")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed equi-join must read co-located buckets shuffle-free:\n$plan")
    assert(joined.count() == 10000L)
    spark.sql("DROP TABLE IF EXISTS fact_bucketed_test")
    spark.sql("DROP TABLE IF EXISTS dim_bucketed_test")
  }
}
