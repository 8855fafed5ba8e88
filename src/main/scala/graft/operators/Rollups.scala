package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Incremental rollup maintenance: keep per-(series, day) aggregates as
 * MERGEABLE partial state (decimal sum, count, min, max) so a new hour
 * of data updates the day rollup by merging two small state tables —
 * never by rescanning the day's raw datapoints. This is the
 * minute→hour→day cascade the reference materializes as three separate
 * scrape frequencies (`frequency_to_period`,
 * `/root/reference/dataquality/metric.py:92-101`) done lake-side: at
 * 100 TB the raw re-aggregation is the cost that matters, and partial
 * state makes each refresh O(increment).
 *
 * Sums are DECIMAL so merge order cannot change a bit of the result;
 * averages are derived (sum/count) only at finalize time.
 */
object Rollups {

  /** Partial-aggregate state per (seriesCol, day): mergeable columns
    * only. `day` is the UTC day epoch (86 400-aligned). */
  def dayState(dp: DataFrame, seriesCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    // Non-finite datapoints are no-data, matching the streaming path
    // (StreamingAlarmPipeline's isFinite drop): under ANSI (Spark 4.x
    // default) NaN→decimal throws CAST_INVALID_INPUT — it does NOT
    // cast to null — and ±Inf overflows the cast; under non-ANSI a
    // NaN is non-null, so count(value) would include rows the decimal
    // sum dropped and decalibrate finalize's avg. Nulling them out
    // BEFORE every aggregate keeps s/n/mn/mx consistent on one column.
    val v = when(!isnan(col(valueCol)) &&
      abs(col(valueCol)) < lit(Double.PositiveInfinity), col(valueCol))
    dp.groupBy(col(seriesCol).as("series"),
        (floor(unix_timestamp(col(tsCol)) / 86400) * 86400).cast("long").as("day"))
      .agg(sum(v.cast("decimal(28,8)")).as("s"),
        count(v).as("n"),
        min(v).as("mn"),
        max(v).as("mx"))
  }

  /** Merge any number of state tables — same shape in, same shape out
    * (sum of sums, sum of counts, min of mins, max of maxes). */
  def merge(states: DataFrame*): DataFrame =
    states.reduce(_.unionByName(_))
      .groupBy("series", "day")
      .agg(sum("s").cast("decimal(28,8)").as("s"), sum("n").as("n"),
        min("mn").as("mn"), max("mx").as("mx"))

  /** Finalize state into the published statistics (O-12's shape). */
  def finalize(state: DataFrame): DataFrame =
    state.select(col("series"), col("day"),
      (col("s").cast("double") / col("n")).as("avg_value"),
      col("s").cast("double").as("sum_value"),
      col("mn").as("min_value"), col("mx").as("max_value"),
      col("n").as("n_points"))
}
