package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional clustering — the lake-layout
  * primitive behind multi-column file skipping: rows sorted by the
  * bit-interleaved key land so that EVERY clustered column has narrow
  * min/max ranges per file, so a point/range predicate on ANY of them
  * prunes most files from the scan (Delta/Iceberg OPTIMIZE ZORDER's
  * mechanism). One range shuffle on the z-value; the interleave itself
  * is pure integer Column math (codegen, engine-portable).
  */
object ZOrder {

  /** Morton-interleave two non-negative int columns, `bits` bits each:
    * bit i of x lands at 2i, bit i of y at 2i+1. Values must fit in
    * `bits` bits (callers range-normalize first; [[zValue]] masks to
    * guard). Unrolled to a sum of shift/AND terms — no UDF. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits per dimension must be 1..31")
    val xm = x.cast("long").bitwiseAND(lit((1L << bits) - 1))
    val ym = y.cast("long").bitwiseAND(lit((1L << bits) - 1))
    (0 until bits).map { i =>
      val xb = shiftright(xm, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i))
      val yb = shiftright(ym, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
      (xb + yb): Column
    }.reduce(_ + _)
  }

  /** SQL replay of [[zValue]] for engine-parity oracles. */
  def sqlZValue(x: String, y: String, bits: Int): String = {
    val mask = (1L << bits) - 1
    val terms = (0 until bits).flatMap { i =>
      Seq(s"((($x & $mask) >> $i) & 1) * ${1L << (2 * i)}",
        s"((($y & $mask) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }

  /** Physically cluster `df` by the z-value of two columns: range
    * shuffle + in-partition sort, so downstream partitioned/bucketed
    * writes produce files with tight per-file min/max on BOTH columns.
    * The sort key is dropped from the result. */
  def clusterBy(df: DataFrame, xCol: String, yCol: String, bits: Int): DataFrame =
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
}
