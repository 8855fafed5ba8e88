package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/**
 * Deterministic MemoryStream replay of a batch alarm fixture through
 * [[StreamingAlarmPipeline]] — the verification bridge that puts the
 * streaming path under the same DuckDB oracle as the batch machine
 * (reference semantics: cw_alarm.py alarm evaluation; the stream and
 * the batch variant must emit the same transition timeline).
 *
 * This is a VERIFICATION harness, not a production operator: feeding a
 * MemoryStream requires the fixture on the driver, so callers collect
 * the bounded declared-query fixture (≤ ~20k points/series at sf0.1).
 * Production streams use [[StreamingAlarmPipeline.evaluateStream]] on
 * a real source.
 *
 * ALL series and SLAs replay through ONE stream: the SLA table carries
 * a per-row `statistic` column (CloudWatch semantics — the statistic
 * is an alarm property), so the per-micro-batch fixed costs (query
 * start/stop, state-store setup, sink collection) are paid once
 * instead of once per SLA. Round 7 ran one stream per SLA; the single
 * stream cut the parity query ~3×.
 *
 * Determinism notes:
 *  - all real points land in ONE micro-batch (watermark still at its
 *    initial value, so nothing closes before every point is absorbed;
 *    the batch-split PropertySpec invariant proves boundaries don't
 *    matter, but one batch keeps the replay canonical);
 *  - then one sentinel point per series at its own hi+period+1s
 *    advances the watermark one second PAST every series' window hi
 *    end, closing it (Spark fires event-time timers only when the
 *    watermark strictly exceeds the timeout, so a sentinel at exactly
 *    hi+period would leave the last window open forever);
 *  - the GLOBAL watermark (max across sentinels) may run past an
 *    early-ending series' fixture — the machine then evaluates that
 *    series' sentinel window and synthesizes silent slots beyond its
 *    hi. Those evaluations are strictly after hi, cannot affect any
 *    transition at or before it (the stream is append-only and
 *    windows close in order), and are dropped by the per-series
 *    (lo, hi] output filter;
 *  - the transition at window lo is dropped per series: the batch
 *    machine's lag() has no predecessor row there, so it reports
 *    transitioned=false for its first window by construction.
 */
object StreamParity {
  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  private def live = ReplayRegistry.live

  /** Replay queries still running (empty unless a replay leaked) —
    * now covering EVERY child-session replay harness (this one and
    * [[PipelineReplay]]) via the shared [[ReplayRegistry]]. */
  def activeReplays: Seq[org.apache.spark.sql.streaming.StreamingQuery] =
    ReplayRegistry.activeReplays

  /** Replay every series' raw datapoints through one stream; returns
    * the transition stream over each series' windows (lo_s, hi_s],
    * sorted by (series, window).
    *
    * @param points all series' (series_id, ts, value) fixture rows
    * @param slas   static SLA config WITH a `statistic` column; one
    *               row per series (a series with several SLAs needs
    *               per-(series, period) bounds, which this harness
    *               does not model)
    *
    * The replay runs on a CHILD session (same SparkContext, own
    * SQLConf) with a handful of shuffle partitions: the stream carries
    * one stateful group per SLA, so the parent's partition count would
    * only multiply empty state-store tasks per micro-batch (32
    * partitions × micro-batches of pure overhead measured ~3× the
    * whole replay). */
  def replayTransitions(
      spark: SparkSession,
      points: Seq[(String, java.sql.Timestamp, Double)],
      slas: DataFrame): Seq[AlarmStream.Transition] = {
    if (points.isEmpty) return Seq.empty
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "2")
    import child.implicits._
    implicit val sq = child.sqlContext
    // rebuild the (tiny) SLA config frame on the child session — a
    // parent-session plan must not leak into the child's stream
    val childSlas = child.createDataFrame(
      java.util.Arrays.asList(slas.collect(): _*), slas.schema)
    // period may arrive as int or long depending on the caller's
    // config frame — normalize before the driver-side read
    val periodRows = childSlas.select(col("series_id"),
        col("period").cast("long")).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    // fail fast on the case this harness does not model (scaladoc):
    // ONE SLA row per series. Two same-series rows — even with equal
    // periods — make evaluateStream emit interleaved transition
    // streams that the (series, window)-keyed parity join fans out
    // into a silently wrong verdict.
    periodRows.groupBy(_._1).foreach { case (sid, ps) =>
      require(ps.length == 1,
        s"series $sid carries ${ps.length} SLA rows; the parity " +
          "harness models exactly one SLA per series")
    }
    val periods = periodRows.toMap
    // every fixture series needs its SLA row — a bare Map miss later
    // would be an undiagnosable key-not-found
    val orphans = points.iterator.map(_._1).toSet -- periods.keySet
    require(orphans.isEmpty,
      s"fixture series with no SLA row: ${orphans.toSeq.sorted.mkString(", ")}")
    // per-series fixture bounds at that series' own period
    val bounds: Map[String, (Long, Long)] = points.groupBy(_._1).map {
      case (sid, pts) =>
        val p = periods(sid)
        val secs = pts.map(_._2.getTime / 1000)
        sid -> (math.floorDiv(secs.min, p) * p, math.floorDiv(secs.max, p) * p)
    }
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val name = s"stream_parity_${runId.incrementAndGet()}"
    val q = StreamingAlarmPipeline.evaluateStream(
        mem.toDF().toDF("series_id", "ts", "value"),
        childSlas, statistic = "Sum", // default unused: every row has one
        watermark = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    live.add(q)
    try {
      mem.addData(points: _*)
      q.processAllAvailable()
      mem.addData(bounds.toSeq.map { case (sid, (_, hi)) =>
        (sid, new java.sql.Timestamp((hi + periods(sid)) * 1000 + 1000), 0.0)
      }: _*)
      q.processAllAvailable()
      child.table(name).as[AlarmStream.Transition].collect().toSeq
        .filter { t =>
          val (lo, hi) = bounds(t.seriesId)
          t.windowStart > lo && t.windowStart <= hi
        }
        .sortBy(t => (t.seriesId, t.windowStart))
    } finally {
      // deregister only once the query is actually down — a failed
      // stop() leaves it registered so a harness-level drain can see
      // and retry it (the round-7 leak mode)
      try q.stop() finally {
        if (!q.isActive) live.remove(q)
        child.catalog.dropTempView(name)
      }
    }
  }
}
