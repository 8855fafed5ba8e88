package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Per-series time-series math beyond plain statistics — the RATE /
 * time-weighted-average layer of a metrics engine (CloudWatch metric
 * math's RATE(m1) and trapezoid-free TWA), computed with one shuffle
 * on the series key and a sorted window per series.
 *
 * Determinism: RATE is a per-row double division of neighboring
 * points (no accumulation → IEEE-identical everywhere). TWA stays in
 * integer arithmetic (values as cents × whole-second gaps), so the
 * accumulated numerator is exact and engine-independent.
 */
object SeriesMath {

  /** First derivative per series: (v − v_prev) / (t − t_prev) in
    * units/second; rows with no predecessor or a zero gap are dropped
    * (a zero gap means duplicate-timestamp points — rate undefined). */
  def rate(dp: DataFrame, seriesCol: String, tsCol: String, tieCol: String,
      valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
    val t = unix_timestamp(col(tsCol))
    dp.withColumn("__pv", lag(col(valueCol), 1).over(w))
      .withColumn("__pt", lag(t, 1).over(w))
      .withColumn("__dt", t - col("__pt"))
      .filter(col("__pt").isNotNull && col("__dt") > 0)
      .withColumn("rate_per_sec", (col(valueCol) - col("__pv")) / col("__dt"))
      .drop("__pv", "__pt", "__dt")
  }

  /**
   * Time-weighted average per (series, UTC day): each point's value
   * (scaled to integer cents) is weighted by the whole-second gap to
   * the NEXT point of the same series within the day — last point of
   * the day carries no weight. Output keeps the exact integer
   * numerator/denominator plus their integer quotient, so any engine
   * reproduces it bit-for-bit.
   */
  def timeWeightedAvg(dp: DataFrame, seriesCol: String, tsCol: String,
      tieCol: String, valueCol: String): DataFrame = {
    val w = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
    val t = unix_timestamp(col(tsCol))
    val day = (floor(t / 86400) * 86400).cast("long")
    // drop non-finite readings BEFORE the gap window: floor(NaN*100)
    // casts to Long 0, which would silently weight a phantom zero by
    // its whole gap and drag the average down. Filtering instead
    // attributes the bad reading's interval to the previous point —
    // carry-forward, the standard treatment of a failed sample.
    dp.filter(!isnan(col(valueCol).cast("double")))
      .withColumn("__day", day)
      .withColumn("__cents", floor(col(valueCol) * 100).cast("long"))
      .withColumn("__nt", lead(t, 1).over(w))
      .withColumn("__nday", lead(day, 1).over(w))
      // weight = gap to next point, only while the next point is the
      // same series AND the same day
      .withColumn("__wt",
        when(col("__nday") === col("__day"), col("__nt") - t).otherwise(lit(0L)))
      .groupBy(col(seriesCol).as("series"), col("__day").as("day"))
      // accumulate in DECIMAL(38,0) so the sum itself cannot wrap; the
      // final cast back to long is range-checked (ANSI) — values past
      // ~1e12 fail loudly instead of flipping sign silently. Callers in
      // that regime should take the decimal sum directly.
      .agg(sum((col("__cents") * col("__wt")).cast("decimal(38,0)"))
          .cast("decimal(38,0)").cast("long").as("twa_num"),
        sum(col("__wt")).as("twa_den"))
      .filter(col("twa_den") > 0)
      // floor division (not `div`, which truncates toward zero): keeps
      // negative numerators bit-identical to engines whose integer `/`
      // floors (DuckDB `//`, Python `//`). pmod is non-negative for the
      // positive denominator guaranteed by the filter above, so
      // (num - pmod(num, den)) is an exact multiple of den.
      .withColumn("twa_cents",
        expr("(twa_num - pmod(twa_num, twa_den)) div twa_den"))
  }

  /**
   * Rolling range-frame aggregate over a pre-aggregated per-(key, day)
   * table: per row, the sum of `valCol` and the count of PRESENT days
   * across the trailing `windowDays`-day VALUE range — a RANGE frame,
   * not a ROWS frame, so absent days genuinely shrink the window
   * (`ROWS BETWEEN 6 PRECEDING` would reach back 6 *rows* and silently
   * span months on a sparse series; the classic rolling-metric bug).
   *
   * Scale: callers aggregate raw events to (key, day) FIRST — the
   * one full-volume shuffle is the map-side-combinable daily rollup;
   * the window then sorts only per-key day rows (≤ a few thousand per
   * key for years of data). Running the window over raw events would
   * re-sort the corpus for identical output.
   */
  def rollingRange(perDay: DataFrame, keyCol: String, dayCol: String,
      valCol: String, windowDays: Int): DataFrame = {
    require(windowDays >= 1, "window must cover at least one day")
    val w = Window.partitionBy(keyCol).orderBy(col(dayCol))
      .rangeBetween(-(windowDays - 1).toLong, 0L)
    perDay
      .withColumn(s"rolling_$valCol", sum(col(valCol)).over(w))
      .withColumn("rolling_days", count(lit(1)).over(w))
  }

  /**
   * Weekly seasonality profile: per key × hour-of-week, event count,
   * share of the key's total (ppm), and a peak flag. Hour-of-week is
   * PURE EPOCH ARITHMETIC — `(epoch div 3600) mod 168`, no calendar
   * functions — so every engine computes the identical phase (hour 0
   * = Thursday 00:00 UTC, epoch origin) and DST/locale can never
   * shift a bucket. Consumers wanting Monday-anchored labels add a
   * constant offset downstream.
   *
   * Scale: one map-side-combinable count per (key, hour-of-week) —
   * output cardinality is 168 × keys, so the share/peak windows run
   * on the tiny aggregate, never the raw events.
   */
  def weeklyProfile(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val wk = Window.partitionBy(keyCol)
    events
      .groupBy(col(keyCol),
        expr(s"(unix_timestamp(`$tsCol`) div 3600) % 168").as("hour_of_week"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("share_ppm",
        expr("(1000000L * n_events) div sum(n_events) over " +
          s"(partition by `$keyCol`)"))
      .withColumn("is_peak",
        col("n_events") === max(col("n_events")).over(wk))
  }
}
