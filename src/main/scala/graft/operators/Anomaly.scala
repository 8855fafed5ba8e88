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
    * @return events + n_hist + is_anomaly */
  def zScoreFlags(events: DataFrame, seriesCol: String, tsCol: String,
      tieCol: String, valueCol: String, lookback: Int = 20, z: Int = 3,
      minN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(seriesCol).orderBy(col(tsCol), col(tieCol))
      .rowsBetween(-lookback, -1)
    // cents as DECIMAL(38,0): the squared terms reach x²·n² — Long
    // overflows for values beyond ~7e6, and DuckDB's HUGEINT would not,
    // so wide decimals keep the flag exact AND engine-identical at any
    // plausible metric magnitude (the output is only a boolean, so no
    // decimal ever reaches the result schema)
    val x = floor(col(valueCol) * 100).cast("decimal(38,0)")
    val n = count(lit(1)).over(w).cast("decimal(38,0)")
    val s = sum(x).over(w).cast("decimal(38,0)")
    val sq = sum((x * x).cast("decimal(38,0)")).over(w).cast("decimal(38,0)")
    events
      .withColumn("__x", x)
      .withColumn("n_hist", count(lit(1)).over(w))
      .withColumn("is_anomaly",
        when(col("n_hist") < minN, lit(false)).otherwise(
          pow2(n * col("__x") - s) >
            lit(z.toLong * z) * (n * sq - pow2(s))))
      .drop("__x")
  }

  private def pow2(c: org.apache.spark.sql.Column) = c * c
}
