package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming interval union — the stream twin of
 * [[graft.operators.Intervals]]: each interval `[s, e]` enters as an
 * event at `s` with a DYNAMIC session gap of `e − s` seconds, so
 * Structured Streaming's `session_window` state-store merge performs
 * the islands-and-gaps union incrementally: an open island extends
 * exactly while new intervals start at or before its current end
 * (the inclusive boundary rule pinned by q_sessions_stream_parity —
 * `session_window` merges on start == end, matching the batch
 * operator's `start > prevMax` island break), and an island is
 * emitted once the watermark passes its close. State per key is the
 * set of OPEN islands, not the interval history — the property that
 * makes a 100 TB interval stream tractable.
 *
 * Requires `end > start` for every interval: a zero-length interval
 * would need a zero session gap, which `session_window` rejects.
 */
object StreamIntervals {

  /** One output row per closed island: (keyCol, island_start,
    * island_end, n_intervals, covered_sec) — epochs in whole seconds,
    * matching [[graft.operators.Intervals.mergeIslands]] bounds
    * bit-for-bit for whole-second inputs. */
  def islands(intervals: DataFrame, keyCol: String = "key",
      tsCol: String = "start_ts", endCol: String = "end_ts",
      watermark: String = "0 seconds"): DataFrame =
    intervals
      .withWatermark(tsCol, watermark)
      .groupBy(col(keyCol), session_window(col(tsCol),
        concat((unix_timestamp(col(endCol)) - unix_timestamp(col(tsCol)))
          .cast("string"), lit(" seconds"))).as("w"))
      .agg(count(lit(1)).as("n_intervals"))
      .select(col(keyCol),
        unix_timestamp(col("w.start")).as("island_start"),
        unix_timestamp(col("w.end")).as("island_end"),
        col("n_intervals"))
      .withColumn("covered_sec", col("island_end") - col("island_start"))
}
