package graft.metrics

import java.time.Instant
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger
import graft.model.Frequency
import graft.registry.DefinitionRegistry

/**
 * Job entry points (O-37/O-38; reference: stacks/metrics_streamer.py
 * wires one scheduled Glue job per BusinessMetric set with args
 * --account_number/--metric_set_name, and EventBridge crons per
 * frequency).
 *
 * O-38 maps to one Spark application per metric set: `main(account,
 * metricSetName, sfDir, outDir)`. O-37's cron cadence maps to
 * Structured Streaming triggers ([[triggerFor]]) for the ingest path
 * and to an external scheduler invoking this main for batch sets —
 * the engine itself stays scheduler-agnostic.
 */
object MetricsMain {

  /** EventBridge-equivalent cron line per frequency
    * (metrics_streamer.py:105-133). */
  val cronFor: Map[Frequency, String] = Map(
    Frequency.Minute -> "cron(0/1 * * * ? *)",
    Frequency.Hour -> "cron(0 * * * ? *)",
    Frequency.Day -> "cron(0 0 * * ? *)")

  /** Streaming-trigger equivalent of the frequency cadence — the
    * Firehose 60 s buffer floor applies to minute cadence
    * (kinesis_construct.py:121-124). */
  def triggerFor(f: Frequency): Trigger =
    Trigger.ProcessingTime(s"${math.max(f.periodSeconds, 60)} seconds")

  /** O-38: one run of one account's metric set. Args:
    * account metricSetName sfDir outDir [epochSeconds]. */
  def main(args: Array[String]): Unit = {
    val account = if (args.length > 0) args(0) else DefinitionRegistry.DefaultAccount
    val setName = if (args.length > 1) args(1)
      else DefinitionRegistry.businessMetricSet.name
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 3) args(3) else "/tmp/graft_out"
    val at = if (args.length > 4) Instant.ofEpochSecond(args(4).toLong)
      else Instant.EPOCH

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-metrics-$setName")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    try {
      val published = MetricsJob.run(spark, sfDir, account, setName, at)
      MetricsJob.publish(published, outDir)
    } finally spark.stop()
  }
}
