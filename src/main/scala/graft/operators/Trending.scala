package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Exponentially time-decayed counts with a power-of-two half-life —
 * the "trending" score behind freshness-weighted source selection
 * (prefer sources whose volume is rising when filling a token
 * budget) and behind operational "is this alarm getting louder"
 * ranking over the reference's event lake.
 *
 * Integer discipline: an event aged `a` half-lives contributes
 * `2^(K−a)` units (0 beyond K half-lives), so the decayed total is an
 * exact integer sum in units of `2^−K` — no float `exp()`, whose
 * platform-varying last ulp would break hash-exact verification and
 * make re-aggregation order-sensitive. `recency_ppm` normalizes by
 * the all-events-fresh maximum: `10⁶ · decayed div (n · 2^K)` — 10⁶
 * for a burst at the horizon, → 0 for a stale key.
 *
 * Scale shape: one map-side-combinable aggregate per key — weights
 * are per-row expressions, the sum is associative, and no window or
 * sort appears; the anchor (horizon) is an aggregate-derived scalar
 * broadcast to the scan, not a driver-side constant baked per run
 * (so replays are deterministic for a fixed dataset).
 */
object Trending {

  /**
   * @param events       rows with `keyCol` and `tsCol` (timestamp)
   * @param halfLifeSec  decay half-life in seconds
   * @param horizonHalfLives K: ages beyond K half-lives contribute 0;
   *                     also the fixed-point scale 2^K
   * @return (key, n_events, decayed_units, recency_ppm) — decayed in
   *         units of 2^−K events
   */
  def decayedCounts(events: DataFrame, keyCol: String, tsCol: String,
      halfLifeSec: Long, horizonHalfLives: Int = 20): DataFrame = {
    require(halfLifeSec >= 1, "half-life must be positive seconds")
    require(horizonHalfLives >= 1 && horizonHalfLives <= 60,
      "horizon must keep 2^K in long range")
    val k = horizonHalfLives
    val anchor = events.agg(max(unix_timestamp(col(tsCol))).as("__t0"))
    val aged = events.select(col(keyCol), unix_timestamp(col(tsCol)).as("__t"))
      .crossJoin(broadcast(anchor))
      .withColumn("__age", expr(s"(__t0 - __t) div $halfLifeSec"))
    aged.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__age") <= k,
            expr(s"shiftleft(1L, cast($k - __age AS int))"))
          .otherwise(lit(0L))).as("decayed_units"))
      .withColumn("recency_ppm",
        expr(s"(1000000L * decayed_units) div (n_events * ${1L << k})"))
  }
}
