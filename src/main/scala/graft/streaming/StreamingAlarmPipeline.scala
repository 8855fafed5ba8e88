package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.streaming.AlarmStream.{AlarmState, SlaConf, Transition}

/**
 * End-to-end streaming alarm pipeline: raw datapoints → per-period
 * statistic windows → M-of-N alarm transitions, the reference's full
 * flow (Firehose buffer → CloudWatch statistic → alarm evaluation,
 * kinesis_construct.py + cw_alarm.py) as ONE stateful operator.
 *
 * Why one operator and not StreamingStatAgg chained into AlarmStream:
 * `flatMapGroupsWithState` downstream of a streaming aggregation
 * cannot work in append mode — a window emits (stamped at its start)
 * only after the watermark passed its end, so every emitted row is
 * already "late" for any downstream event-time filter, and a second
 * watermark node would pin the global min-of-nodes watermark at its
 * initial value forever (deadlock). Windowing, the statistic, and the
 * alarm machine therefore share one `flatMapGroupsWithState`: state =
 * open windows' partial aggregates + the alarm ring buffer, windows
 * close when the (single, upstream) watermark passes their end, and
 * closures feed [[AlarmStream.applySlot]] in window order with gap
 * densification — bit-the-same alarm semantics as the two-stage form.
 *
 * Scale: state per series = O(open windows + evaluation_periods).
 * Open windows are bounded by watermark delay / period (a series
 * cannot accumulate unbounded windows — anything older than the
 * watermark is closed on the next firing). Partial aggregates are
 * map-side-combinable pairs (sum/count/min/max), so state size does
 * not grow with datapoint rate.
 *
 * Statistic note: Sum/Average accumulate in Double here (state-store
 * encodable), while the batch StatWindowAgg uses DECIMAL(28,8) —
 * identical for the oracle fixtures' 2-decimal values, but extreme
 * magnitudes can differ in the last ulp; document before comparing
 * bit-exactly against the batch path at adversarial scales.
 */
object StreamingAlarmPipeline {

  /** Raw datapoint with its (broadcast-joined) SLA config. */
  final case class ConfiguredPoint(
      seriesId: String, eventTime: java.sql.Timestamp, value: Double,
      period: Long, threshold: Double, comparisonOperator: String,
      datapointsToAlarm: Int, evaluationPeriods: Int,
      treatMissingData: String)

  /** Partial aggregate of one open window. */
  final case class WinAgg(sum: Double, count: Long, min: Double, max: Double)

  /** Per-series pipeline state: open windows + the alarm machine.
    * `conf` is captured from the first absorbed point so timer-only
    * invocations (watermark passes an open window with no new data)
    * can close windows before the machine ever evaluated a slot. */
  final case class PipeState(
      open: Map[Long, WinAgg], alarm: AlarmState, conf: Option[SlaConf])

  private def statValue(statistic: String, w: WinAgg): Double = statistic match {
    case "Sum"         => w.sum
    case "Average"     => w.sum / w.count
    case "Minimum"     => w.min
    case "Maximum"     => w.max
    case "SampleCount" => w.count.toDouble
    case other => throw new IllegalArgumentException(
      s"unsupported streaming statistic: $other")
  }

  /** Advance one series: absorb points into open windows, close every
    * window the watermark passed (in order, densifying gaps), handle
    * silent-series catch-up. Pure — unit-testable without Spark. */
  private[graft] def step(
      seriesId: String, points: Seq[ConfiguredPoint], st: PipeState,
      watermarkSec: Long, statistic: String):
      (PipeState, List[Transition], Option[Long]) = {
    val conf = points.headOption.map(p => SlaConf(p.period, p.threshold,
      p.comparisonOperator, p.datapointsToAlarm, p.evaluationPeriods,
      p.treatMissingData)).orElse(st.conf).orElse(st.alarm.conf)

    conf match {
      case None => (st, Nil, None)
      case Some(c) =>
        // 1) absorb points into open windows (late = window already
        //    evaluated → dropped, same contract as AlarmStream)
        var open = st.open
        points.foreach { p =>
          val ts = p.eventTime.getTime / 1000
          val w = math.floorDiv(ts, c.period) * c.period
          if (!st.alarm.lastWindow.exists(w <= _)) {
            val cur = open.getOrElse(w, WinAgg(0.0, 0L, Double.MaxValue, Double.MinValue))
            open = open.updated(w, WinAgg(cur.sum + p.value, cur.count + 1,
              math.min(cur.min, p.value), math.max(cur.max, p.value)))
          }
        }
        // 2) close windows the watermark passed, in window order,
        //    densifying inter-window gaps with missing votes
        val (toClose, stillOpen) = open.partition {
          case (w, _) => w + c.period <= watermarkSec
        }
        var alarm = st.alarm
        var out = List.empty[Transition] // reverse-chronological
        toClose.toSeq.sortBy(_._1).foreach { case (w, agg) =>
          alarm.lastWindow.foreach { last =>
            val (s2, gapOut) = AlarmStream.synthesizeSlots(alarm, seriesId,
              last, w, c)
            alarm = s2; out = gapOut ::: out
          }
          val (s3, tr) = AlarmStream.applySlot(alarm, seriesId, w,
            Some(statValue(statistic, agg)), c)
          alarm = s3; out = tr.toList ::: out
        }
        // 3) silent-series catch-up: no window remains open, but the
        //    watermark moved past further unreported slots (any point
        //    for those slots would be dropped as late from here on, so
        //    evaluating them now is final). Skipped while a window is
        //    still open — the gap densifies when that window closes.
        if (stillOpen.isEmpty) {
          val (s4, wmOut) = AlarmStream.advanceToWatermark(alarm, seriesId,
            watermarkSec)
          alarm = s4; out = wmOut.reverse ::: out
        }
        // 4) next timer: the earliest pending closure — either an open
        //    window's end or the silent series' next expected slot end
        val nextTimeout = (stillOpen.keys.map(_ + c.period) ++
          (if (stillOpen.isEmpty) alarm.lastWindow.map(_ + 2 * c.period) else None))
          .reduceOption(_ min _)
        (PipeState(stillOpen, alarm, Some(c)), out.reverse, nextTimeout)
    }
  }

  /**
   * @param datapoints streaming (series_id, ts:timestamp, value)
   * @param slas       static (series_id, period, threshold,
   *                   comparison_operator, datapoints_to_alarm,
   *                   evaluation_periods, treat_missing_data); tiny —
   *                   broadcast into a stateless stream-static join
   * @param statistic  CW statistic for all series of this stream
   * @param watermark  max out-of-order delay for raw datapoints
   */
  def evaluateStream(datapoints: DataFrame, slas: DataFrame,
      statistic: String, watermark: String = "10 minutes"): Dataset[Transition] = {
    val spark = datapoints.sparkSession
    import spark.implicits._
    statValue(statistic, WinAgg(0.0, 1L, 0.0, 0.0)) // fail fast on bad statistic
    datapoints
      .withWatermark("ts", watermark)
      .join(broadcast(slas), Seq("series_id")) // stateless stream-static join
      .select(col("series_id").as("seriesId"), col("ts").as("eventTime"),
        col("value").cast("double").as("value"),
        col("period").cast("long").as("period"), col("threshold").cast("double"),
        col("comparison_operator").as("comparisonOperator"),
        col("datapoints_to_alarm").cast("int").as("datapointsToAlarm"),
        col("evaluation_periods").cast("int").as("evaluationPeriods"),
        col("treat_missing_data").as("treatMissingData"))
      .as[ConfiguredPoint]
      // key by series AND full SLA config: a series may carry several
      // SLAs (warning + critical), and mixing their vote streams in
      // one machine would interleave states — same reason the batch
      // variant's window partitions by the full config
      .groupByKey(p => (p.seriesId, p.period, p.threshold,
        p.comparisonOperator, p.datapointsToAlarm, p.evaluationPeriods,
        p.treatMissingData))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (key: (String, Long, Double, String, Int, Int, String),
            it: Iterator[ConfiguredPoint], gs: GroupState[PipeState]) => {
          val st = gs.getOption.getOrElse(
            PipeState(Map.empty, AlarmStream.EmptyState, None))
          val wmSec = gs.getCurrentWatermarkMs() / 1000
          val (next, out, nextTimeout) = step(key._1, it.toSeq, st, wmSec, statistic)
          gs.update(next)
          nextTimeout.foreach { t =>
            if (t * 1000 > gs.getCurrentWatermarkMs()) gs.setTimeoutTimestamp(t * 1000)
          }
          out.iterator
        })
  }
}
