package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/**
 * Deterministic MemoryStream replay of a batch alarm fixture through
 * [[StreamingAlarmPipeline]] — the verification bridge that puts the
 * streaming path under the same DuckDB oracle as the batch machine
 * (reference semantics: cw_alarm.py alarm evaluation; the stream and
 * the batch variant must emit the same transition timeline).
 *
 * This is a VERIFICATION harness, not a production operator: feeding a
 * MemoryStream requires the fixture on the driver, so callers collect
 * one bounded series at a time (the declared-query fixture is ≤ ~20k
 * points/series at sf0.1). Production streams use
 * [[StreamingAlarmPipeline.evaluateStream]] on a real source.
 *
 * Determinism notes:
 *  - all real points land in ONE micro-batch (watermark still at its
 *    initial value, so nothing closes before every point is absorbed;
 *    the batch-split PropertySpec invariant proves boundaries don't
 *    matter, but one batch keeps the replay canonical);
 *  - a single sentinel point at hi+period+1s then advances the
 *    watermark one second PAST window hi's end, closing it (Spark
 *    fires event-time timers only when the watermark strictly exceeds
 *    the timeout, so a sentinel at exactly hi+period leaves the last
 *    window open forever). The sentinel's own window [hi+period,
 *    hi+2*period) stays open, so the pipeline never evaluates past hi
 *    and never enters silent-series synthesis — the replay stops
 *    exactly where the batch board stops;
 *  - the transition at window lo is dropped: the batch machine's
 *    lag() has no predecessor row there, so it reports
 *    transitioned=false for its first window by construction.
 */
object StreamParity {
  private val runId = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Replay one series' raw datapoints; returns its transition stream
    * over windows (lo, hi], sorted by window.
    *
    * The replay runs on a CHILD session (same SparkContext, own
    * SQLConf) with a handful of shuffle partitions: the stream carries
    * ONE stateful group, so the parent's partition count would only
    * multiply empty state-store tasks per micro-batch (32 partitions ×
    * 3 micro-batches of pure overhead measured ~3× the whole replay). */
  def replayTransitions(
      spark: SparkSession,
      points: Seq[(String, java.sql.Timestamp, Double)],
      slas: DataFrame,
      statistic: String,
      periodSec: Long): Seq[AlarmStream.Transition] = {
    if (points.isEmpty) return Seq.empty
    val child = spark.newSession()
    child.conf.set("spark.sql.shuffle.partitions", "2")
    import child.implicits._
    implicit val sq = child.sqlContext
    val seriesId = points.head._1
    val secs = points.map(_._2.getTime / 1000)
    val lo = math.floorDiv(secs.min, periodSec) * periodSec
    val hi = math.floorDiv(secs.max, periodSec) * periodSec
    val mem = MemoryStream[(String, java.sql.Timestamp, Double)]
    val name = s"stream_parity_${runId.incrementAndGet()}"
    // rebuild the (tiny) SLA config frame on the child session — a
    // parent-session plan must not leak into the child's stream
    val childSlas = child.createDataFrame(
      java.util.Arrays.asList(slas.collect(): _*), slas.schema)
    val q = StreamingAlarmPipeline.evaluateStream(
        mem.toDF().toDF("series_id", "ts", "value"),
        childSlas, statistic,
        watermark = "0 seconds")
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      mem.addData(points: _*)
      q.processAllAvailable()
      mem.addData((seriesId,
        new java.sql.Timestamp((hi + periodSec) * 1000 + 1000), 0.0))
      q.processAllAvailable()
      child.table(name).as[AlarmStream.Transition].collect().toSeq
        .filter(t => t.windowStart > lo && t.windowStart <= hi)
        .sortBy(_.windowStart)
    } finally {
      q.stop()
      child.catalog.dropTempView(name)
    }
  }

  /** Run several replays concurrently — independent single-series
    * streams that would otherwise serialize their per-micro-batch
    * fixed costs. */
  def replayAll[A](jobs: Seq[() => Seq[A]]): Seq[A] = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    Await.result(Future.sequence(jobs.map(j => Future(j()))), Duration.Inf)
      .flatten
  }
}
