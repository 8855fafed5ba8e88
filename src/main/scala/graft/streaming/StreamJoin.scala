package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Watermarked stream-stream interval join — the remaining stateful
 * Structured Streaming surface next to the mapGroups state machines:
 * match left and right rows sharing a key whose event times fall
 * within `[l.ts − beforeSec, l.ts + afterSec]`. The enrichment shape
 * for "pair each impression with clicks within the attribution
 * window" when BOTH sides are live streams (the batch Attribution
 * operator handles the replay form).
 *
 * Both inputs carry watermarks and the join condition carries the
 * time bound, which is exactly what lets Spark EVICT state: a left
 * row can stop waiting once the right watermark passes
 * `l.ts + afterSec`, so per-key state is bounded by the window span ×
 * arrival rate, not the stream length. Inner-join results emit in the
 * micro-batch where the second side arrives — no timers, so a replay
 * needs no sentinel rows.
 *
 * Column names of `left` and `right` must be disjoint (rename before
 * calling); the key columns stay separate in the condition so the
 * caller controls the output projection.
 */
object StreamJoin {

  /** @param joinType "inner" (default) or "left_outer". The outer
    *        form emits an unmatched left row with nulls only after
    *        the GLOBAL watermark (min over both streams) passes the
    *        row's match window — "impressions with no click inside
    *        the attribution window", emitted exactly once, as soon
    *        as no future right row could still match. */
  def intervalJoin(left: DataFrame, right: DataFrame,
      lKeyCol: String, rKeyCol: String, ltsCol: String, rtsCol: String,
      beforeSec: Long, afterSec: Long, watermarkSec: Long,
      joinType: String = "inner"): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && watermarkSec >= 0,
      "non-negative window and watermark")
    require(Set("inner", "left_outer")(joinType),
      "inner or left_outer")
    val l = left.withWatermark(ltsCol, s"$watermarkSec seconds")
    val r = right.withWatermark(rtsCol, s"$watermarkSec seconds")
    l.join(r,
      col(lKeyCol) === col(rKeyCol) &&
        col(rtsCol) >= col(ltsCol) - expr(s"INTERVAL $beforeSec SECONDS") &&
        col(rtsCol) <= col(ltsCol) + expr(s"INTERVAL $afterSec SECONDS"),
      joinType)
  }
}
