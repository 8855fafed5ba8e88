package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Interval union ("islands and gaps"): merge overlapping or touching
 * `[start, end]` intervals per key into maximal disjoint islands, and
 * roll the islands up into per-key coverage. The workhorse behind
 * uptime/SLA coverage over the reference's alarm state intervals
 * (an alarm is "in ALARM" over a time range; total breach time is the
 * union of ranges, not their sum — double-counting overlaps is the
 * classic SLA-report bug) and, pipeline-side, behind merging
 * char-span annotations (PII spans, quality spans) into disjoint
 * regions before redaction.
 *
 * Shape: one shuffle on the key, one per-key sort by (start, end,
 * tie), then two window passes over the SAME frame — running max of
 * `end` over preceding rows → island-open flag, running sum of flags
 * → island id — so Catalyst plans a single Window operator; the
 * grouped island rollup re-uses the partitioning the window just
 * established (no second exchange; AQE folds it). Per-key volume
 * bounds the sort, not total volume. Epochs are integer seconds
 * end-to-end — no float, so island ids and coverage sums are
 * hash-exact across engines and merge orders.
 *
 * Touching intervals (`start == prev island end`) merge: coverage
 * semantics treat `[0,10],[10,20]` as 20 contiguous seconds.
 */
object Intervals {

  /** One row per merged island: bounds, source-interval count, and
    * covered seconds. Input columns are integer epoch seconds. */
  def mergeIslands(intervals: DataFrame, keyCol: String = "key",
      startCol: String = "start_epoch", endCol: String = "end_epoch")
      : DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol))
    // running max of end over STRICTLY preceding rows: null on the
    // first row of a key → new island there by the coalesce
    val prevMax = max(col(endCol)).over(
      w.rowsBetween(Window.unboundedPreceding, -1))
    val isNew = when(col(startCol) > coalesce(prevMax, lit(Long.MinValue)), 1L)
      .otherwise(0L)
    intervals
      .withColumn("__island",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("__island").as("island_index"))
      .agg(
        min(col(startCol)).as("island_start"),
        max(col(endCol)).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered_sec", col("island_end") - col("island_start"))
  }

  /** Per-key coverage rollup over the merged islands: union seconds
    * (no double counting), island count, raw interval count, and the
    * largest single gap between consecutive islands. */
  def coverage(intervals: DataFrame, keyCol: String = "key",
      startCol: String = "start_epoch", endCol: String = "end_epoch")
      : DataFrame = {
    val islands = mergeIslands(intervals, keyCol, startCol, endCol)
    val w = Window.partitionBy(keyCol).orderBy(col("island_start"))
    islands
      .withColumn("__gap",
        col("island_start") - lag(col("island_end"), 1).over(w))
      .groupBy(col(keyCol))
      .agg(
        sum(col("covered_sec")).as("covered_sec"),
        count(lit(1)).as("n_islands"),
        sum(col("n_intervals")).as("n_intervals"),
        coalesce(max(col("__gap")), lit(0L)).as("max_gap_sec"),
        min(col("island_start")).as("first_start"),
        max(col("island_end")).as("last_end"))
  }
}
