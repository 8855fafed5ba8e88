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

  def intervalJoin(left: DataFrame, right: DataFrame,
      lKeyCol: String, rKeyCol: String, ltsCol: String, rtsCol: String,
      beforeSec: Long, afterSec: Long, watermarkSec: Long): DataFrame = {
    require(beforeSec >= 0 && afterSec >= 0 && watermarkSec >= 0,
      "non-negative window and watermark")
    val l = left.withWatermark(ltsCol, s"$watermarkSec seconds")
    val r = right.withWatermark(rtsCol, s"$watermarkSec seconds")
    l.join(r,
      col(lKeyCol) === col(rKeyCol) &&
        col(rtsCol) >= col(ltsCol) - expr(s"INTERVAL $beforeSec SECONDS") &&
        col(rtsCol) <= col(ltsCol) + expr(s"INTERVAL $afterSec SECONDS"))
  }
}
