package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession

/**
 * Stream-stream join state profiler — the PROFILE cell for
 * [[graft.streaming.StreamJoin.intervalJoin]]'s eviction contract:
 * drives the watermarked interval join at 1×/5×/10× arrival rate
 * (events/sec/side on a fixed key set) in time-ordered micro-batches
 * and records the per-batch state-store row counts. The claims this
 * substantiates, beyond StreamingSpec's pass/fail assertion:
 *
 *  - peak state scales LINEARLY with arrival rate (state =
 *    window-span × rate, the formulation's promise);
 *  - peak state is INDEPENDENT of stream length (the 3× duration run
 *    peaks at the 1× plateau);
 *  - so at a production rate R the state bill is
 *    (before+after+watermark+batch) × R × 2 sides rows, a number a
 *    capacity plan can be written against.
 *
 * Output: one JSON line per configuration:
 * {"rate":N,"durationSec":N,"batches":N,"peakStateRows":N,
 *  "finalStateRows":N,"modelBoundRows":N}
 */
object ProfileStreamState {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (before, after, wm, chunk) = (60L, 60L, 30L, 60L)
    def run(rate: Int, durationSec: Long): Unit = {
      def side(off: Long) =
        (0L until durationSec).flatMap(s => (0 until rate).map(j =>
          ((j % 4).toLong, new Timestamp((1000000L + s) * 1000L),
            (s * rate + j) * 2L + off)))
      val states = graft.streaming.PipelineReplay.measureIntervalJoinState(
        spark, side(0L), side(1L), before, after, wm, chunk)
      val model = (before + after + wm + chunk) * rate * 2L
      println(s"""{"rate":$rate,"durationSec":$durationSec,""" +
        s""""batches":${states.size},"peakStateRows":${states.max},""" +
        s""""finalStateRows":${states.last},"modelBoundRows":$model}""")
    }
    run(1, 600L)
    run(1, 1800L) // 3x duration: peak must hold at the 1x plateau
    run(5, 600L)
    run(10, 600L)
    spark.stop()
  }
}
