package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * CloudWatch-statistic window aggregation (O-12/O-13/O-14/O-17;
 * reference: dataquality/stream.py:24-45 renders the queries,
 * lambda/metric_stream_producer.py:40-98 sets the window bounds, and
 * the statistic itself executes inside the CloudWatch service).
 *
 * The engine-side model: a raw datapoints fact table (series_id, ts,
 * value) aggregated into tumbling windows of each series' period with
 * the series' declared statistic. Scale notes:
 *  - definitions are broadcast (tiny by construction) so the fact side
 *    never shuffles for the join;
 *  - the groupBy keys on (series_id, window_start) — partial (map-side)
 *    aggregation collapses each partition before the single shuffle;
 *  - Sum/Average run over DECIMAL so results are independent of
 *    partitioning/merge order (a 100 TB shuffle must not change the
 *    answer in the low bits);
 *  - per-series skew (one hot series) is handled by AQE skew handling;
 *    the window key also spreads a hot series across time buckets.
 */
object StatWindowAgg {

  /** Supported CloudWatch statistic strings (README.md:72-75: Average,
    * Sum, Minimum, Maximum, SampleCount, pNN). */
  val standardStats: Seq[String] = Seq("Average", "Sum", "Minimum", "Maximum", "SampleCount")

  /** Accuracy handed to percentile_approx — shared with the streaming
    * pipeline so both paths run the identical GK summary. */
  private[graft] val PercentileAccuracy = 100000

  /** Total function: malformed ("p1.2.3", "p.") and out-of-range
    * ("p200") forms return None so callers fail fast with a clear
    * "unsupported statistic" instead of a mid-stream
    * NumberFormatException or QuantileSummaries range crash. */
  private[graft] def percentileFraction(stat: String): Option[Double] =
    if (stat.length > 1 && stat.head == 'p' && stat.tail.forall(c => c.isDigit || c == '.'))
      try {
        val f = stat.tail.toDouble / 100.0
        if (f > 0.0 && f <= 1.0) Some(f) else None
      } catch { case _: NumberFormatException => None }
    else None

  /**
   * Aggregate datapoints into per-series statistic windows.
   *
   * @param datapoints fact table with columns (series_id, ts:timestamp, value:double)
   * @param defs       definition table with (unique_id, statistic, period, frequency)
   *                   — tiny; broadcast
   * @param frequency  O-14 frequency filter (minute/hour/day), or null for all
   * @return (series_id, statistic, period, frequency, window_start:long, metricvalue:double)
   */
  def aggregate(datapoints: DataFrame, defs: DataFrame, frequency: String = null): DataFrame = {
    val defsF = if (frequency == null) defs else defs.filter(col("frequency") === frequency)

    // The distinct pNN statistics are definition METADATA (a handful of
    // strings), not data — resolving them driver-side keeps
    // percentile_approx's fraction foldable for codegen.
    val allStats = graft.pipeline.DriverBounds.boundedCollect(
      defsF.select("statistic").distinct(), 10000L,
      "StatWindowAgg distinct statistics (definition metadata)")
      .map(_.getString(0)).toSeq
    // fail fast on a typo'd/out-of-range statistic: without this, an
    // unmatched statistic silently produces NULL metricvalue rows
    allStats.foreach { s =>
      require(standardStats.contains(s) || percentileFraction(s).isDefined,
        s"unsupported statistic in definitions: $s")
    }
    val pStats: Seq[(String, Double)] =
      allStats.flatMap(s => percentileFraction(s).map(s -> _))

    val joined = datapoints.join(
      broadcast(defsF.select("unique_id", "statistic", "period", "frequency")),
      datapoints("series_id") === defsF("unique_id"), "inner")

    // O-17: windows are per-period; period is a group key so series
    // with different periods coexist in one pass.
    val windowStart = (floor(unix_timestamp(col("ts")) / col("period")) * col("period")).cast("long")

    val dec = col("value").cast("decimal(28,8)")
    val baseAggs = Seq[Column](
      count(col("value")).as("_count"),
      sum(dec).as("_sum"),
      min(col("value")).as("_min"),
      max(col("value")).as("_max"))
    // ONE shared percentile_approx over the fraction ARRAY: K separate
    // calls would maintain K independent GK summaries per group (each
    // at accuracy 100000) for the same inserted values — same results,
    // K× the aggregation state and CPU.
    val pAggs =
      if (pStats.isEmpty) Nil
      else Seq(percentile_approx(col("value"),
        array(pStats.map(p => lit(p._2)): _*), lit(PercentileAccuracy)).as("_pq"))

    val grouped = joined
      .groupBy(col("series_id"), col("statistic"), col("period"), col("frequency"),
        windowStart.as("window_start"))
      .agg(baseAggs.head, (baseAggs.tail ++ pAggs): _*)

    // Average divides AFTER casting the exact decimal sum to double so
    // the result doesn't depend on engine-specific decimal-division
    // scale rules (double ÷ long is IEEE-deterministic everywhere).
    val standard = when(col("statistic") === "Average",
        col("_sum").cast("double") / col("_count"))
      .when(col("statistic") === "Sum", col("_sum").cast("double"))
      .when(col("statistic") === "Minimum", col("_min"))
      .when(col("statistic") === "Maximum", col("_max"))
      .when(col("statistic") === "SampleCount", col("_count").cast("double"))
    val metricValue = pStats.zipWithIndex.foldLeft(standard) {
      case (acc, ((s, _), i)) =>
        acc.when(col("statistic") === s, col("_pq").getItem(i))
    }

    grouped.select(col("series_id"), col("statistic"), col("period"), col("frequency"),
      col("window_start"), metricValue.as("metricvalue"))
  }

  /** Single-statistic variant with an explicit period — the direct
    * engine form of one MetricDataQuery (stream.py:33-43). */
  def aggregateOne(datapoints: DataFrame, statistic: String, periodSeconds: Int,
      valueCol: String = "value", tsCol: String = "ts"): DataFrame = {
    val windowStart =
      (floor(unix_timestamp(col(tsCol)) / periodSeconds) * periodSeconds).cast("long")
    val dec = col(valueCol).cast("decimal(28,8)")
    val agg: Column = statistic match {
      case "Average"     => sum(dec).cast("double") / count(col(valueCol))
      case "Sum"         => sum(dec).cast("double")
      case "Minimum"     => min(col(valueCol))
      case "Maximum"     => max(col(valueCol))
      case "SampleCount" => count(col(valueCol)).cast("double")
      case p => percentileFraction(p) match {
        case Some(f) => percentile_approx(col(valueCol), lit(f), lit(PercentileAccuracy))
        case None => throw new IllegalArgumentException(s"unknown statistic: $p")
      }
    }
    datapoints.groupBy(col("series_id"), windowStart.as("window_start"))
      .agg(agg.as("metricvalue"))
  }
}
