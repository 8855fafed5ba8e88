package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-order (Morton) clustering: interleave the bits of two dimension
 * columns and lay data out sorted by the interleaved value, so
 * per-file min/max statistics become selective for BOTH dimensions at
 * once — the standard multi-dimensional data-skipping layout for a
 * 100 TB lake where queries filter on (series, time) or (user, time)
 * rectangles rather than a single prefix column.
 *
 * The z-value is plain integer arithmetic (shift/mask/add) — no UDF,
 * stays in codegen, and any SQL engine reproduces it bit-for-bit.
 */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative longs:
    * bit i of x lands at position 2i, bit i of y at 2i+1. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).map { i =>
      shiftright(x, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(y, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Range-partition + sort by the z-value of (xCol, yCol) into
    * `files` output partitions — write the result with a plain
    * `.write.parquet` and each file covers a compact z-range (≈ a
    * rectangle in (x, y) space), so file-level min/max stats prune
    * two-dimensional range predicates. */
  def cluster(df: DataFrame, xCol: String, yCol: String, files: Int,
      bits: Int = 16): DataFrame = {
    val z = zValue2(col(xCol), col(yCol), bits)
    df.withColumn("__z", z)
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
