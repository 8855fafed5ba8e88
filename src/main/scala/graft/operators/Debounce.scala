package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Event debounce: drop repeat events of the same type from the same
 * user arriving within `windowSec` of the KEPT predecessor — double
 * clicks, retry storms, at-least-once duplicates from an upstream
 * queue. The ingestion-hygiene step before funnels/transition
 * matrices count anything.
 *
 * Semantics (anchor-based, the standard debounce): within a
 * (user, type) run, the first event is kept and becomes the anchor;
 * subsequent events are dropped while STRICTLY within `windowSec` of
 * the anchor, and the first event at-or-past `anchor + windowSec` is
 * kept and becomes the new anchor. Anchoring to the kept event (not
 * the previous event) is what stops a continuous drizzle of
 * sub-window events from being suppressed forever.
 *
 * All time arithmetic is in integer MICROSECONDS (`unix_micros`), so
 * the keep-set is bit-replayable in any engine. Ties on ts break by
 * `tieCol` for a total order.
 *
 * The anchor chain is a per-(user, type) sequential recurrence: one
 * shuffle on the (user, type) key, then a bounded fold over that
 * key's collected (ts, tie) pairs — per-task memory bounded by a
 * single user-type's event volume, the same per-key bound the
 * sessionizers rely on. (The fold is a higher-order `aggregate` —
 * interpreted, but over per-key-bounded arrays, not the corpus hot
 * path.)
 */
object Debounce {

  def debounce(events: DataFrame, windowSec: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    require(windowSec >= 0, "windowSec must be >= 0")
    val winMicros = windowSec * 1000000L
    // the keep accumulator is typed from the ACTUAL tie column (a
    // string event_id — UUIDs — is as legitimate as a bigint one);
    // a pinned ARRAY<BIGINT> zero would fail analysis with an opaque
    // higher-order type mismatch for any non-long tieCol
    val tieType = events.schema(tieCol).dataType
    val emptyKeep = array().cast(
      org.apache.spark.sql.types.ArrayType(tieType, containsNull = true))
    val grouped = events
      // NTZ timestamps cast through the (UTC) session zone — same
      // naive-as-UTC reading DuckDB's epoch_us applies
      .select(col(userCol), col(typeCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__t"), col(tieCol))
      .groupBy(userCol, typeCol)
      .agg(array_sort(collect_list(struct(
        col("__t"), col(tieCol).as("tie")))).as("evs"))
    val kept = aggregate(col("evs"),
      struct(lit(Long.MinValue).as("anchor"), emptyKeep.as("keep")),
      (acc, e) => {
        val isKept = e("__t") >= acc("anchor") + winMicros
        struct(
          when(isKept, e("__t")).otherwise(acc("anchor")).as("anchor"),
          when(isKept, concat(acc("keep"), array(e("tie"))))
            .otherwise(acc("keep")).as("keep"))
      },
      acc => acc("keep"))
    events.join(
      grouped.select(explode(kept).as(tieCol)), Seq(tieCol), "left_semi")
  }
}
