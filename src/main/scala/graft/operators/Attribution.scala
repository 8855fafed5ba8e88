package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Last-touch conversion attribution: for every conversion event,
 * which touch (view/click/…) by the same user most recently preceded
 * it within the lookback window — the question behind every
 * marketing-spend and journey-efficacy report, and the join shape
 * [[AsOfJoin]] exists for, specialized to an event stream where both
 * sides arrive interleaved in ONE table.
 *
 * Semantics: the attributed touch is the LAST eligible touch in the
 * total order (ts, kind, id) with kind ordering touches before
 * conversions at the same instant — so a same-timestamp touch IS
 * eligible — and eligibility requires conv_ts − touch_ts ≤ lookback.
 * Conversions with no eligible touch keep a row with null
 * attribution (the "dark conversions" a report must count, not
 * drop).
 *
 * Plan: one shuffle by user; the carry-forward is a max-STRUCT over
 * the unbounded-preceding-to-−1 frame — max over (t, id, type)
 * structs ignores the null conversion slots natively and replays
 * identically in any engine (no IGNORE NULLS dialect dependence).
 * Integer-microsecond arithmetic throughout.
 */
object Attribution {

  def lastTouch(events: DataFrame, conversionType: String,
      touchTypes: Seq[String], lookbackSec: Long,
      userCol: String = "user_id", typeCol: String = "event_type",
      tsCol: String = "ts", idCol: String = "event_id"): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    val lookbackMicros = lookbackSec * 1000000L
    val isTouch = col(typeCol).isin(touchTypes: _*)
    val isConv = col(typeCol) === conversionType
    val rows = events.filter(isTouch || isConv)
      .select(col(userCol), col(idCol), col(typeCol),
        unix_micros(col(tsCol).cast("timestamp")).as("__t"),
        when(isConv, 1).otherwise(0).as("__conv"))
    val w = Window.partitionBy(userCol)
      .orderBy(col("__t"), col("__conv"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val lastT = max(when(col("__conv") === 0,
      struct(col("__t").as("t"), col(idCol).as("id"),
        col(typeCol).as("tp")))).over(w)
    rows.withColumn("__last", lastT)
      .filter(col("__conv") === 1)
      .withColumn("__ok",
        col("__last").isNotNull &&
          col("__t") - col("__last.t") <= lookbackMicros)
      .select(col(idCol).as("conversion_id"), col(userCol),
        when(col("__ok"), col("__last.id")).as("touch_id"),
        when(col("__ok"), col("__last.tp")).as("touch_type"))
  }
}
