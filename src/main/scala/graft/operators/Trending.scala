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
    // Decayed sum and the ppm both run in DECIMAL(38,0): per-row terms
    // are ≤ 2^K so a long SUM wraps past ~2^(63−K) in-horizon events,
    // and `10⁶·decayed` / `n·2^K` each wrap long well inside the
    // documented K≤60 range (K=20 already overflows at ~8.8M events).
    // Decimal keeps the arithmetic exact at any event count; the final
    // BIGINT casts are ANSI-checked, so a key that genuinely exceeds
    // int64 fails loudly instead of reporting a negative score.
    aged.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("__age") <= k,
            expr(s"CAST(shiftleft(1L, cast($k - __age AS int)) " +
              "AS DECIMAL(38,0))"))
          .otherwise(expr("CAST(0 AS DECIMAL(38,0))"))).as("__du"))
      .select(col(keyCol), col("n_events"),
        expr("CAST(__du AS BIGINT)").as("decayed_units"),
        expr(s"CAST((CAST(1000000 AS DECIMAL(38,0)) * __du - " +
          s"pmod(CAST(1000000 AS DECIMAL(38,0)) * __du, " +
          s"CAST(n_events AS DECIMAL(38,0)) * ${1L << k})) / " +
          s"(CAST(n_events AS DECIMAL(38,0)) * ${1L << k}) AS BIGINT)")
          .as("recency_ppm"))
  }
}
