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
}
