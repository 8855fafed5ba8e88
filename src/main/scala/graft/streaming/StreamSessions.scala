package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming gap-based sessionization over the event stream —
 * Structured Streaming's native `session_window` (dynamic-gap window
 * merge in the state store) rather than a hand-rolled
 * flatMapGroupsWithState: Spark merges overlapping session windows
 * per key and emits a session once the watermark passes its close,
 * which is exactly gap semantics with bounded state. The batch twin is
 * [[graft.operators.Sessionize]]; the StreamingSpec asserts both
 * produce the same sessions for the same event sequence.
 *
 * Boundary rule (measured, Spark 4.1, pinned by the
 * q_sessions_stream_parity oracle row): `session_window` merges
 * events spaced EXACTLY `gap` apart — windows merge when the new
 * event's start equals the open session's end, an inclusive
 * comparison, not the [t, t+gap) half-open-overlap rule the window
 * bounds suggest. That matches the batch operator (`dt > gapSec`
 * opens a new session, so dt == gapSec stays merged) with the SAME
 * gap value on both sides; a 1801 s gap under gap="1801 seconds"
 * merges here and under `gapSec = 1801` merges in batch.
 */
object StreamSessions {

  /** One output row per closed session: (userCol, session_start,
    * session_end, n_events, sum_value). Every referenced column is a
    * parameter — a half-configurable signature that hardcoded `value`
    * would fail analysis on any differently-named events frame. */
  def sessionStats(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts", valueCol: String = "value",
      gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(col(userCol), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("sum_value"))
      .select(col(userCol),
        unix_timestamp(col("w.start")).as("session_start"),
        unix_timestamp(col("w.end")).as("session_end"),
        col("n_events"), col("sum_value"))
}
