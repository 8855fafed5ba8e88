package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Point-in-time ("as-of") join: for every probe row, attach the most
 * recent quote value with the same key at or before the probe's
 * timestamp. The temporal primitive behind "metric value when the
 * alarm fired" / "price when the order was placed" queries that the
 * reference's minute-aligned scrape cadence implies
 * (`/root/reference/lambda/metric_stream_producer.py:127-128` keeps
 * the newest datapoint per window — this operator generalizes that to
 * arbitrary probe times).
 *
 * Spark-first formulation: no range join and no per-probe subquery —
 * both sides are unioned, sorted once per key, and a running
 * `last_value(ignoreNulls)` carries the latest quote forward into each
 * probe row. One hash shuffle + one sort per key group, the same
 * merge-scan shape a 1000-executor sort-merge join would use, so the
 * plan survives arbitrarily many probes and quotes per key. Quotes at
 * exactly the probe timestamp are visible (inclusive semantics, quote
 * sorts before probe on ties).
 *
 * Determinism requires at most one quote row per (key, ts) — pre-
 * aggregate the quote side otherwise (see `latestQuotePerTs`).
 */
object AsOfJoin {

  /** @param probes rows to enrich (all columns preserved)
    * @param quotes (keyCol, tsCol, valueCol) time-series
    * @return probes + `asof_<valueCol>` (null when no quote precedes) */
  def asOf(probes: DataFrame, quotes: DataFrame, keyCol: String,
      tsCol: String, valueCol: String): DataFrame = {
    val packed = probes.withColumn("__row",
      struct(probes.columns.map(col): _*))
    val rowType = packed.schema("__row").dataType
    // the quote value rides inside a one-field struct: the struct is
    // non-null for every quote row even when the VALUE is null, so
    // last(ignoreNulls) skips probe rows only — a newest quote whose
    // value is legitimately NULL propagates as NULL instead of
    // resurrecting an older non-null value
    val wrapType = quotes.select(struct(col(valueCol).as("v")).as("q"))
      .schema("q").dataType
    val pSide = packed.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      lit(null).cast(wrapType).as("__q"), lit(1).as("__p"), col("__row"))
    val qSide = quotes.select(col(keyCol).as("__k"), col(tsCol).as("__ts"),
      struct(col(valueCol).as("v")).as("__q"), lit(0).as("__p"),
      lit(null).cast(rowType).as("__row"))
    // quote rows (__p=0) sort before probe rows at equal ts → inclusive
    val w = Window.partitionBy("__k").orderBy(col("__ts"), col("__p"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    qSide.unionByName(pSide)
      .withColumn("__asof", last(col("__q"), ignoreNulls = true).over(w))
      .filter(col("__p") === 1)
      .select(col("__row.*"), col("__asof.v").as(s"asof_$valueCol"))
  }

  /** Collapse a quote side to one row per (key, ts) — max value wins —
    * so [[asOf]] is deterministic under duplicate timestamps. */
  def latestQuotePerTs(quotes: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame =
    quotes.groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
}
