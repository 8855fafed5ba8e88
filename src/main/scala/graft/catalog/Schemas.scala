package graft.catalog

import org.apache.spark.sql.types._

/**
 * Fixed lake schemas, externally declared exactly like the reference's
 * Glue catalog tables (cdk_constructs/glue_catalog_construct.py) — no
 * schema inference anywhere (SURVEY.md §1.3).
 *
 * Storage-boundary types mirror the reference (strings for timestamps,
 * JSON strings for maps: glue_catalog_construct.py:69-108); engine-side
 * we work with typed columns and only project to this shape on write.
 */
object Schemas {

  /** metrics_minute / metrics_hour / metrics_day data columns
    * (glue_catalog_construct.py:69-108). */
  val metrics: StructType = StructType(Seq(
    StructField("collectiontime", StringType),
    StructField("namespace", StringType),
    StructField("name", StringType),
    StructField("period", IntegerType),
    StructField("frequency", StringType),
    StructField("statistic", StringType),
    StructField("metadata", StringType),       // JSON object string
    StructField("dimensions", StringType),     // JSON object string
    StructField("accountid", StringType),
    StructField("metrictimestamp", StringType),
    StructField("metricvalue", FloatType),
    StructField("id", StringType),
    StructField("label", StringType)))

  /** Hive partition keys shared by metrics_* and slas
    * (glue_catalog_construct.py:52-67). */
  val partitionKeys: StructType = StructType(Seq(
    StructField("region", StringType),
    StructField("year", ShortType),
    StructField("month", ShortType),
    StructField("day", ShortType),
    StructField("hour", ShortType)))

  val partitionColumnNames: Seq[String] = partitionKeys.fieldNames.toSeq

  /** slas table (glue_catalog_construct.py:151-197). */
  val slas: StructType = StructType(Seq(
    StructField("collectiontime", StringType),
    StructField("alarmarn", StringType),
    StructField("alarmname", StringType),
    StructField("metricnamespace", StringType),
    StructField("metricname", StringType),
    StructField("metricperiod", IntegerType),
    StructField("metricfrequency", StringType),
    StructField("metricstatistic", StringType),
    StructField("threshold", FloatType),
    StructField("comparisonoperator", StringType),
    StructField("treatmissingdata", StringType),
    StructField("statevalue", StringType),
    StructField("statereason", StringType),
    StructField("accountid", StringType),
    StructField("metadata", StringType)))

  /** metric_defs JSON table (glue_catalog_construct.py:225-280). */
  val metricDefs: StructType = StructType(Seq(
    StructField("namespace", StringType),
    StructField("name", StringType),
    StructField("frequency", StringType),
    StructField("period", IntegerType),
    StructField("statistic", StringType),
    StructField("metadata", StringType),
    StructField("dimensions", StringType),
    StructField("metric_set", StringType),
    StructField("sla_set", StringType),
    StructField("dashboard", StringType),
    StructField("account", StringType),
    StructField("dataset", StringType),
    StructField("reference_datasets", StringType),
    StructField("query", StringType)))

  /** sla_defs JSON table (glue_catalog_construct.py:308-367). */
  val slaDefs: StructType = StructType(Seq(
    StructField("ticket", StringType),
    StructField("threshold", IntegerType),
    StructField("comparison_operator", StringType),
    StructField("datapoints_to_alarm", IntegerType),
    StructField("evaluation_periods", IntegerType),
    StructField("treat_missing_data", StringType),
    StructField("severity", StringType),
    StructField("short_description", StringType),
    StructField("details", StringType),
    StructField("metric_namespace", StringType),
    StructField("metric_name", StringType),
    StructField("metric_set", StringType),
    StructField("metric_metadata", StringType),
    StructField("metric_dimensions", StringType),
    StructField("account", StringType)))

  /** Raw datapoint stream record (the engine-side stand-in for the
    * CloudWatch GetMetricData source, O-2): one row per (series, ts). */
  val datapoints: StructType = StructType(Seq(
    StructField("series_id", StringType),
    StructField("ts", TimestampType),
    StructField("value", DoubleType)))
}
