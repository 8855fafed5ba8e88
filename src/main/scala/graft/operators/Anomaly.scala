package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Trailing-window z-score anomaly flagging over metric series — the
 * detection layer the reference's threshold alarms (O-23) stop short
 * of: "is this datapoint ≥ 3σ from its own recent history" instead of
 * a fixed threshold
 * (`/root/reference/dataquality/sla.py:14-33` only compares against a
 * constant).
 *
 * All arithmetic is integer (values scaled to cents), and the z-score
 * test is algebraically cleared of divisions:
 *   |x − μ| > z·σ  ⇔  (n·x − Σ)² > z²·(n·Σx² − Σ²)
 * so the flag is bit-identical in any engine — no float mean/stddev
 * whose rounding could flip an edge case between implementations.
 * One shuffle on the series key; the trailing frame is a bounded
 * running window per series.
 */
object Anomaly {

  /** @param events  (seriesCol, tsCol, tieCol, valueCol)
    * @param lookback trailing window size in rows (excluding current)
    * @param z        threshold in sigmas
    * @param minN     minimum history rows before flagging
    * @param wide     compute in DECIMAL(38,0) (default): the squared
    *                 terms reach x²·n², which overflows Long for
    *                 values beyond ~7e6 while DuckDB's HUGEINT does
    *                 not. Callers whose value envelope is known to be
    *                 below that can pass false for the ~2× cheaper
    *                 Long window sums — identical flags within the
    *                 safe envelope.
    * @return events + n_hist + is_anomaly */
  def zScoreFlags(events: DataFrame, seriesCol: String, tsCol: String,
      tieCol: String, valueCol: String, lookback: Int = 20, z: Int = 3,
      minN: Int = 10, wide: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    val numType = if (wide) "decimal(38,0)" else "long"
    // NaN guard BEFORE the cents fold: floor(NaN*100) casts to null in
    // decimal but to 0 in Long — a NaN history point would corrupt the
    // Long path as a phantom zero while the decimal path dropped it,
    // breaking the wide/narrow equivalence. Null it out explicitly so
    // both paths skip it, and count HISTORY on the same column so n
    // matches what s/sq actually aggregated.
    val finite = when(!isnan(col(valueCol)), col(valueCol))
    val x = floor(finite * 100).cast(numType)
    val n = count(x).over(w).cast(numType)
    val s = sum(x).over(w).cast(numType)
    val sq = sum((x * x).cast(numType)).over(w).cast(numType)
    events
      .withColumn("__x", x)
      .withColumn("n_hist", count(col("__x")).over(w))
      .withColumn("is_anomaly",
        // coalesce: a NaN-valued CURRENT row makes __x null and the
        // comparison null-propagates — without it the flag would be
        // NULL (not false), and a negated filter or pinned-boolean
        // consumer would diverge from the "NaN is never anomalous"
        // contract the NaN guard above establishes.
        when(col("n_hist") < minN, lit(false)).otherwise(
          coalesce(
            pow2(n * col("__x") - s) >
              lit(z.toLong * z) * (n * sq - pow2(s)),
            lit(false))))
      .drop("__x")
  }

  private def pow2(c: org.apache.spark.sql.Column) = c * c

  /**
   * Two-sided CUSUM level-shift detection per series — the SUSTAINED-
   * shift complement to [[zScoreFlags]]'s point outliers: a metric
   * that drifts 10% forever never trips a 3σ test, but its positive
   * CUSUM (s⁺ₜ = max(0, s⁺ₜ₋₁ + xₜ − μ − slack), and the mirrored s⁻)
   * accumulates without bound. μ is the integer mean of the first
   * `warmup` points; the first index where either side exceeds
   * `threshold` is the detected changepoint.
   *
   * Input is a PRE-BUCKETED series (e.g. hourly window sums, one row
   * per (series, bucket)): its length is bounded by the TIME RANGE,
   * not the event volume, so the per-series `collect_list` + one
   * compiled `aggregate` fold hold ~10k points for a year of hourly
   * buckets regardless of corpus size — the same per-series-bounded
   * state the alarm machine's windows carry. The recursion is
   * inherently sequential (max(0,·) is non-linear, no window form
   * exists); folding the sorted array once per series IS the minimal
   * distributed shape: one shuffle on the series key, then
   * embarrassingly parallel across series.
   *
   * All integer: caller scales values (cents); the warmup mean uses
   * truncating division (identical to the oracle's floor division on
   * the non-negative envelope this operator documents). Output one
   * row per series longer than warmup: (series, n_points, mu,
   * max_cusum, first_shift_idx — absolute 1-based bucket index, null
   * if never crossed).
   */
  def cusumShift(points: DataFrame, seriesCol: String, ordCol: String,
      valueCol: String, warmup: Int = 20, slack: Long = 0L,
      threshold: Long = 1L): DataFrame = {
    require(warmup > 0 && slack >= 0 && threshold > 0,
      "need warmup > 0, slack >= 0, threshold > 0")
    points.select(col(seriesCol).as("series"),
        struct(col(ordCol).cast("long").as("o"),
          col(valueCol).cast("long").as("x")).as("p"))
      .groupBy("series").agg(sort_array(collect_list("p")).as("ps"))
      .filter(size(col("ps")) > warmup)
      .withColumn("vs", expr("transform(ps, p -> p.x)"))
      .withColumn("mu", expr(
        s"aggregate(slice(vs, 1, $warmup), 0L, (a, x) -> a + x) div ${warmup}L"))
      .withColumn("st", expr(
        s"""aggregate(slice(vs, ${warmup + 1}, size(vs) - $warmup),
           |named_struct('sp', 0L, 'sn', 0L, 'mx', 0L, 'fi', 0, 'i', 0),
           |(a, x) -> named_struct(
           |'sp', greatest(0L, a.sp + x - mu - ${slack}L),
           |'sn', greatest(0L, a.sn + mu - x - ${slack}L),
           |'mx', greatest(a.mx, greatest(0L, a.sp + x - mu - ${slack}L),
           |greatest(0L, a.sn + mu - x - ${slack}L)),
           |'fi', CASE WHEN a.fi > 0 THEN a.fi
           |WHEN greatest(0L, a.sp + x - mu - ${slack}L) > ${threshold}L
           |OR greatest(0L, a.sn + mu - x - ${slack}L) > ${threshold}L
           |THEN a.i + 1 ELSE 0 END,
           |'i', a.i + 1))""".stripMargin.replace("\n", " ")))
      .select(col("series"), size(col("ps")).cast("long").as("n_points"),
        col("mu"), col("st.mx").as("max_cusum"),
        when(col("st.fi") > 0, col("st.fi") + lit(warmup)).cast("long")
          .as("first_shift_idx"))
  }
}
