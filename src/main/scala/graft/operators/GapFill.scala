package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Time-grid gap-fill with linear interpolation: densify a sparse
 * per-key series onto a regular bucket grid and fill the holes by
 * interpolating between the nearest observed neighbors. The missing
 * step between the reference's raw datapoint stream and its
 * fixed-frequency statistic windows (`StatWindowAgg` emits only
 * buckets that HAVE data; dashboards and rate-of-change math want a
 * dense series), and the standard resampling pass before any
 * time-series model training.
 *
 * Scale shape: the grid is generated per key with `sequence()` —
 * bounded by each key's own time span over the bucket width, never a
 * driver loop or a global calendar cross-join. Neighbor lookup is two
 * RUNNING window frames per key — backward neighbors over the
 * ascending sort, forward neighbors as a running frame over the
 * DESCENDING sort. The descending re-sort is deliberate: the "natural"
 * `[currentRow, unboundedFollowing]` frame is quadratic in Spark
 * (UnboundedFollowingWindowFunctionFrame re-scans the partition tail
 * for every row — measured 23 s where the two-sort form takes
 * ~centiseconds on the same grid), while running
 * `[unboundedPreceding, currentRow]` frames are streaming O(n).
 * One shuffle on the key total; per-key volume bounds both sorts.
 *
 * Integer discipline: values enter as non-negative long "cents" and
 * the interpolation is the two-sided form
 * `(pv·(nb−b) + nv·(b−pb)) div (nb−pb)` whose numerator is a sum of
 * non-negative products — so truncating division (Spark `div`) and
 * floor division (DuckDB `//`) agree, and the filled series is
 * hash-exact across engines. The one-sided form
 * `pv + (nv−pv)·(b−pb) div span` would go negative on falling
 * segments, where the two engines' integer divisions round apart.
 */
object GapFill {

  /**
   * @param observed (keyCol, bucketCol: long grid index, valCol: long
   *                 ≥ 0) at most one row per (key, bucket) — pre-aggregate
   *                 upstream
   * @return dense (key, bucket, value, src) — src `obs` for observed
   *         rows, `interp` for holes strictly between observations;
   *         grid spans each key's [min, max] observed bucket
   */
  def linear(observed: DataFrame, keyCol: String = "key",
      bucketCol: String = "bucket", valCol: String = "value"): DataFrame = {
    val grid = observed.groupBy(col(keyCol))
      .agg(min(col(bucketCol)).as("__lo"), max(col(bucketCol)).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"))).as(bucketCol))
    val joined = grid.join(observed, Seq(keyCol, bucketCol), "left")
    val back = Window.partitionBy(keyCol).orderBy(col(bucketCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val fwd = Window.partitionBy(keyCol).orderBy(col(bucketCol).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val obsB = when(col(valCol).isNotNull, col(bucketCol))
    joined
      .withColumn("__pv", last(col(valCol), ignoreNulls = true).over(back))
      .withColumn("__pb", last(obsB, ignoreNulls = true).over(back))
      .withColumn("__nv", last(col(valCol), ignoreNulls = true).over(fwd))
      .withColumn("__nb", last(obsB, ignoreNulls = true).over(fwd))
      .select(col(keyCol), col(bucketCol),
        when(col(valCol).isNotNull, col(valCol))
          .otherwise(expr(s"(__pv * (__nb - `$bucketCol`) + " +
            s"__nv * (`$bucketCol` - __pb)) div (__nb - __pb)"))
          .cast("long").as(valCol),
        when(col(valCol).isNotNull, lit("obs")).otherwise(lit("interp"))
          .as("src"))
  }
}
