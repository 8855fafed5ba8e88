package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Threshold comparison + alarm state machine, batch variant (O-23;
 * reference: dataquality/sla.py:14-33 declares the config,
 * cdk_constructs/cw_alarm.py:32-62 wires it, and the M-of-N evaluation
 * itself runs inside the CloudWatch service). CloudWatch semantics
 * implemented:
 *
 *  - breach per datapoint: value <op> threshold for the four
 *    comparison operators (cw_alarm.py:42-45);
 *  - alarm when ≥ datapoints_to_alarm (M) of the last
 *    evaluation_periods (N) datapoints breach;
 *  - treat_missing_data ∈ NOT_BREACHING (default) | BREACHING | IGNORE
 *    | MISSING (cw_alarm.py:46-49): the series timeline is densified to
 *    one slot per period, and missing slots count as non-breaching /
 *    breaching / are skipped (window looks further back over real
 *    datapoints) / yield INSUFFICIENT_DATA when the whole window is
 *    empty;
 *  - state-change rows (OK→ALARM etc.) are flagged for notification
 *    (alarm actions fire on transition, not level).
 *
 * Scale: everything is window functions partitioned by series — one
 * shuffle on series_id, linear per-series scan, no driver-side state.
 * Timeline densification uses sequence() per series bounded by the
 * series' own [min,max] window, so a sparse series doesn't explode.
 */
object AlarmStateMachine {

  val StateOk = "OK"
  val StateAlarm = "ALARM"
  val StateInsufficient = "INSUFFICIENT_DATA"

  /** Per-datapoint breach predicate with operator dispatch
    * (cw_alarm.py:42-45). */
  def breaches(value: Column, op: Column, threshold: Column): Column =
    when(op === "GREATER_THAN_THRESHOLD", value > threshold)
      .when(op === "GREATER_THAN_OR_EQUAL_TO_THRESHOLD", value >= threshold)
      .when(op === "LESS_THAN_THRESHOLD", value < threshold)
      .when(op === "LESS_THAN_OR_EQUAL_TO_THRESHOLD", value <= threshold)

  /**
   * Evaluate alarm states over windowed series values.
   *
   * @param series (series_id, window_start:long, metricvalue:double) —
   *               output of StatWindowAgg
   * @param slas   (series_id, period, threshold, comparison_operator,
   *               datapoints_to_alarm, evaluation_periods,
   *               treat_missing_data) — tiny; broadcast
   * @return one row per (series_id, slot): window_start, metricvalue
   *         (null when the slot was missing), breaching, statevalue,
   *         prev_state, transitioned
   */
  /** Window-function lookback cap: rowsBetween needs a literal frame,
    * so votes are collected over this many slots and sliced to the
    * SLA's evaluation_periods. CloudWatch itself caps evaluation
    * windows far below this; configs beyond it fail loudly in
    * [[evaluate]] instead of silently truncating. */
  val MaxLookback = 100

  def evaluate(series: DataFrame, slas: DataFrame): DataFrame = {
    val tooWide = slas.filter(col("evaluation_periods") > MaxLookback).count()
    require(tooWide == 0,
      s"evaluation_periods beyond $MaxLookback unsupported by the batch window")
    val joined = series.join(broadcast(slas), Seq("series_id"), "inner")

    // Densify each series to one slot per period over its own span —
    // missing-data policies need explicit missing slots.
    val bounds = joined.groupBy(
        col("series_id"), col("period"), col("threshold"),
        col("comparison_operator"), col("datapoints_to_alarm"),
        col("evaluation_periods"), col("treat_missing_data"))
      .agg(min("window_start").as("_lo"), max("window_start").as("_hi"))
    val slots = bounds.select(
      col("series_id"), col("period"), col("threshold"),
      col("comparison_operator"), col("datapoints_to_alarm"),
      col("evaluation_periods"), col("treat_missing_data"),
      explode(sequence(col("_lo"), col("_hi"), col("period").cast("long")))
        .as("window_start"))

    val dense = slots.join(
      series.select(col("series_id").as("_sid"), col("window_start").as("_ws"),
        col("metricvalue")),
      slots("series_id") === col("_sid") && slots("window_start") === col("_ws"),
      "left").drop("_sid", "_ws")

    val present = col("metricvalue").isNotNull
    val realBreach = breaches(col("metricvalue"), col("comparison_operator"), col("threshold"))

    // Missing-slot breach contribution by policy. For IGNORE the window
    // ranges over the last N *real* datapoints, which we emulate by
    // carrying the slot's breach flag as null and counting over a
    // larger lookback of non-null flags.
    val slotBreach = when(present, realBreach)
      .when(col("treat_missing_data") === "BREACHING", lit(true))
      .when(col("treat_missing_data") === "NOT_BREACHING", lit(false))
      .otherwise(lit(null).cast("boolean")) // IGNORE / MISSING: slot doesn't vote

    // partition by the FULL SLA config, not just the series: a series
    // may carry several SLAs (warning + critical threshold), and mixing
    // their rows in one window would interleave vote streams and lag()
    // states across configs.
    val w = Window.partitionBy("series_id", "threshold",
        "comparison_operator", "datapoints_to_alarm", "evaluation_periods",
        "treat_missing_data")
      .orderBy("window_start")
    def lastN(c: Column, n: Column): Column = {
      // rowsBetween needs a literal frame; evaluation_periods is small
      // (CW caps at 100ish) so we sum flags over a max lookback and
      // mask by row distance.
      val maxLook = 100
      val frame = w.rowsBetween(-maxLook + 1, 0)
      // collect the last maxLook values and slice the trailing n
      val arr = collect_list(c).over(frame)
      slice(arr, greatest(size(arr) - n + 1, lit(1)), n)
    }

    // Window of the last N slot-votes. collect_list drops null votes,
    // which is exactly the IGNORE/MISSING semantics (the frame then
    // spans the last N *real* datapoints, up to the lookback cap); for
    // NOT_BREACHING/BREACHING no vote is null so the window is the
    // last N slots.
    val votes = lastN(slotBreach, col("evaluation_periods"))
    // Dense presence flags (never null) → sliced window = last N slots.
    val presentInWindow = lastN(when(present, 1).otherwise(0), col("evaluation_periods"))

    val breachCount = size(filter(votes, v => v))
    val anyReal = aggregate(presentInWindow, lit(0), (acc, x) => acc + x) > 0

    val state =
      when(col("treat_missing_data") === "MISSING" && !anyReal, StateInsufficient)
        .when(breachCount >= col("datapoints_to_alarm"), StateAlarm)
        .otherwise(StateOk)

    val withState = dense
      .withColumn("breaching", coalesce(slotBreach, lit(false)))
      .withColumn("statevalue", state)
    val prev = lag(col("statevalue"), 1).over(w)
    withState
      .withColumn("prev_state", prev)
      .withColumn("transitioned",
        prev.isNotNull && prev =!= col("statevalue"))
  }
}
