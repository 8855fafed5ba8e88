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

  /** Rendered per-metric graph widgets (metrics_streamer.py:345-369):
    * one width-10 graph per metric on its dashboard, dashboard names
    * regionalized `<name>-<region>`. Height 6 is the CloudWatch
    * GraphWidget default the reference inherits. Input rows:
    * (dashboard, widget_title). */
  def graphWidgets(metrics: DataFrame, region: String): DataFrame =
    metrics.select(
      concat(col("dashboard"), lit(s"-$region")).as("dashboard_name"),
      lit("graph").as("widget_type"),
      col("widget_title").as("content"),
      lit(10).as("width"), lit(6).as("height"))
      .distinct()

  /** Category dashboards' text widgets (metrics_streamer.py:371-415):
    * for each category, one width-12 height-3 markdown widget per
    * member dashboard deep-linking to that dashboard — dedup on
    * (category, dashboard), exactly the reference's temp_list guard.
    * Input rows: (dashboard, category) with null category = no
    * category dashboard membership. */
  def categoryTextWidgets(metrics: DataFrame, region: String,
      accountId: String): DataFrame = {
    val db = concat(col("dashboard"), lit(s"-$region"))
    val md = concat(
      lit("## Navigate to **"), db, lit("** dashboard:\n\n"),
      lit("*Click here for [button:primary:"), db,
      lit(s"](https://$region.console.aws.amazon.com/cloudwatch/home" +
        s"?region=$region#dashboards:name="), db,
      lit(s";accountId=$accountId) dashboard*"))
    metrics.filter(col("category").isNotNull)
      .select(concat(col("category"), lit(s"-$region")).as("dashboard_name"),
        lit("text").as("widget_type"), md.as("content"),
        lit(12).as("width"), lit(3).as("height"))
      .distinct()
  }
}
