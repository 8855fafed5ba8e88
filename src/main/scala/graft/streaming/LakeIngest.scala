package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType
import graft.catalog.Schemas

/**
 * Streaming JSON→Parquet partitioned lake ingest (O-8/O-9; reference:
 * the Kinesis→Firehose pipe, cdk_constructs/kinesis_construct.py:107-153
 * — 60 s buffers, JSON→Parquet conversion against the catalog schema,
 * 5-key Hive prefix, error records to a side output;
 * stacks/metrics_streamer.py:90-94).
 *
 * One Structured Streaming job replaces producer→Kinesis→Firehose→
 * add_partition: parse with the fixed schema (no inference — SURVEY
 * §1.3), derive partition columns BEFORE the write, land parquet with
 * partitionBy (partitions self-register; O-27 collapses away), and
 * append unparseable records to an errors path exactly like Firehose's
 * `metric_errors/` prefix.
 */
object LakeIngest {

  /** Raw record schema as the producer emits it (enriched
    * MetricDataResult, metric_stream_producer.py:100-135). */
  val rawSchema: StructType = Schemas.metrics

  /**
   * Start the ingest query over a stream of JSON strings (column
   * `value`), the Kinesis stand-in.
   *
   * @param trigger micro-batch cadence — 60 s parity with Firehose
   *                buffering hints; tests pass AvailableNow/short.
   */
  def start(records: DataFrame, outDir: String, errDir: String,
      checkpointDir: String, region: String = "local-1",
      trigger: Trigger = Trigger.ProcessingTime("60 seconds")): StreamingQuery = {

    val parsed = records
      .withColumn("parsed", from_json(col("value"), rawSchema,
        Map("mode" -> "PERMISSIVE")))

    records.sparkSession.sqlContext.setConf(
      "spark.sql.streaming.schemaInference", "false")

    parsed.writeStream
      .queryName("lake_ingest")
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val b = batch.persist()
        try {
          // corrupt-record side output (Firehose error prefix): a record
          // is corrupt when parsing yielded an all-null struct but the
          // raw line is non-null.
          val good = b.filter(col("parsed.id").isNotNull).select("parsed.*")
          val bad = b.filter(col("parsed.id").isNull && col("value").isNotNull)
            .select(col("value"))
          val ts = to_timestamp(col("metrictimestamp"))
          good
            .withColumn("region", lit(region))
            .withColumn("year", year(ts).cast("smallint"))
            .withColumn("month", month(ts).cast("smallint"))
            .withColumn("day", dayofmonth(ts).cast("smallint"))
            .withColumn("hour", hour(ts).cast("smallint"))
            .write.mode("append")
            .partitionBy("region", "year", "month", "day", "hour")
            .parquet(outDir)
          if (!bad.isEmpty) bad.write.mode("append").text(errDir)
        } finally { b.unpersist(); () }
      }
      .start()
  }
}
