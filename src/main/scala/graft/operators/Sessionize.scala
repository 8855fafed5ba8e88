package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization: consecutive events of the same user closer
 * than `gapSec` belong to one session. The standard event-analytics
 * operator the reference's event lake (`events` table) calls for when
 * minute-level metrics get rolled up into user activity.
 *
 * One shuffle on the user key, one sort per user, two window passes
 * (lag → gap flag, running sum → session index) that share the same
 * window frame, so Catalyst plans a single Window operator. Per-user
 * data volume bounds the sort, not total volume — the layout that
 * holds when one partition holds millions of users at 100 TB. A
 * secondary sort key (`tieCol`) makes ordering total, so session
 * indices are deterministic under equal timestamps.
 */
object Sessionize {

  /** Events + `session_index` (1-based per user, in time order). */
  def assign(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val isNew = when(prev.isNull ||
      unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSec, 1L)
      .otherwise(0L)
    events.withColumn("session_index",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: bounds, size, duration. */
  def sessions(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, gapSec: Long): DataFrame =
    assign(events, userCol, tsCol, tieCol, gapSec)
      .groupBy(col(userCol), col("session_index"))
      .agg(
        min(unix_timestamp(col(tsCol))).as("start_epoch"),
        max(unix_timestamp(col(tsCol))).as("end_epoch"),
        count(lit(1)).as("n_events"))
      .withColumn("duration_sec", col("end_epoch") - col("start_epoch"))

  /** Top within-session event-type paths: every length-`n` window of
    * each session's time-ordered event sequence, counted corpus-wide
    * — the navigation-pattern generalization of the fixed funnel
    * (which asks about ONE ordered path; this surfaces which paths
    * exist). Occurrences count per window, so a session repeating a
    * loop contributes each lap.
    *
    * Scale: the per-session `collect_list` is bounded by session
    * length (gap-bounded by construction), the n-gram explode is
    * linear in events, and the path count is map-side combinable.
    * The struct sort key (t, tie) makes window order total, so path
    * strings are deterministic under equal timestamps. */
  def pathNgrams(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapSec: Long, n: Int,
      minCount: Long = 1L): DataFrame = {
    require(n >= 2, "a path needs at least two steps")
    assign(events, userCol, tsCol, tieCol, gapSec)
      .groupBy(col(userCol), col("session_index"))
      .agg(sort_array(collect_list(struct(
        unix_timestamp(col(tsCol)).as("t"), col(tieCol).as("tie"),
        col(typeCol).as("et")))).as("evs"))
      .select(expr("transform(evs, x -> x.et)").as("seq"))
      .filter(size(col("seq")) >= n)
      .select(explode(expr(
        s"transform(sequence(0, size(seq) - $n), " +
          s"i -> concat_ws('>', slice(seq, i + 1, $n)))")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") >= minCount)
  }
}
