package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Dashboard dedup + grouping (O-36; reference:
 * stacks/metrics_streamer.py:290-415): group widgets per dashboard
 * name, dedupe, and order deterministically — the presentation-layer
 * aggregation the reference does with Python sets.
 */
object Dashboards {

  /** Input: (dashboard, widget_title) rows — one per metric. Output:
    * one row per dashboard with its sorted distinct widget titles. */
  def group(metrics: DataFrame): DataFrame =
    metrics.groupBy(col("dashboard"))
      .agg(sort_array(collect_set(col("widget_title"))).as("widgets"),
        countDistinct(col("widget_title")).as("n_widgets"))
}
