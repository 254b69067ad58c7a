package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: points joined to intervals containing them.
  *
  * The naive form (`point BETWEEN lo AND hi` with no equi-key) plans as
  * a broadcast-nested-loop join — O(points x intervals), the classic
  * 100 TB killer. The banded form buckets the value domain at a fixed
  * width: each interval replicates into the ceil((hi-lo)/w)+1 buckets
  * it overlaps, each point maps to exactly one bucket, and the join
  * becomes an EQUI-join on (extra keys, bucket) plus a cheap residual
  * BETWEEN filter. One shuffle, hash join, replication factor =
  * avg interval span / band width (pick w near the median span).
  */
object RangeJoin {

  /** Join `points` (with `valueCol`) to `intervals` (with loCol/hiCol,
    * inclusive) on bucket + optional shared equi-keys.
    *
    * Preconditions: the two frames must share ONLY the `equiKeys`
    * column names and neither may carry a `__bucket` column (checked);
    * empty intervals (hi < lo) are dropped, matching BETWEEN
    * semantics; intervals spanning more than `maxBandsPerInterval`
    * buckets fail fast rather than exploding the shuffle (an
    * open-ended sentinel like hi = Long.MaxValue would otherwise ask
    * sequence() for ~1e14 elements — model open ends by clamping to
    * the observed domain instead). */
  def banded(points: DataFrame, intervals: DataFrame,
      valueCol: String, loCol: String, hiCol: String,
      bandWidth: Long, equiKeys: Seq[String] = Nil,
      maxBandsPerInterval: Int = 1 << 20): DataFrame = {
    require(bandWidth > 0, "bandWidth must be positive")
    val shared = points.columns.toSet intersect intervals.columns.toSet
    require(shared == equiKeys.toSet,
      s"frames must share exactly the equiKeys columns; shared=$shared")
    require(!points.columns.contains("__bucket") &&
      !intervals.columns.contains("__bucket"), "__bucket is reserved")

    val loB = floor(col(loCol) / bandWidth).cast("long")
    val hiB = floor(col(hiCol) / bandWidth).cast("long")
    val p = points.withColumn("__bucket",
      floor(col(valueCol) / bandWidth).cast("long"))
    val i = intervals
      .where(col(hiCol) >= col(loCol)) // empty intervals match nothing
      .withColumn("__bucket", explode(
        when(hiB - loB + 1 <= maxBandsPerInterval, sequence(loB, hiB))
          .otherwise(raise_error(concat(
            lit(s"interval spans more than $maxBandsPerInterval bands of $bandWidth: "),
            col(loCol).cast("string"), lit(".."), col(hiCol).cast("string"))))))
    p.join(i, Seq("__bucket") ++ equiKeys)
      .where(col(valueCol).between(col(loCol), col(hiCol)))
      .drop("__bucket")
  }
}
