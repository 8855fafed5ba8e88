package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TimeFns

/**
 * SLA snapshot + incident routing (O-24/O-25; reference:
 * lambda/sla_stream_producer.py:23-48, lambda/sla_parse.py:22-95).
 */
object Incidents {

  /**
   * O-24: project enriched alarm states into the `slas` lake record
   * shape (glue_catalog_construct.py:151-197; record fields from
   * sla_stream_producer.py:66-82). Input must carry alarm columns
   * (alarmarn, alarmname, statevalue, statereason, threshold,
   * comparisonoperator, treatmissingdata) plus the O-21 enrichment
   * (metricnamespace, metricname, metricperiod, metricfrequency,
   * metricstatistic, metadata).
   */
  def toSlaRecords(enrichedAlarms: DataFrame, accountId: String,
      collectionEpoch: Long): DataFrame =
    enrichedAlarms.select(
      TimeFns.isoUtc(lit(collectionEpoch)).as("collectiontime"),
      col("alarmarn"), col("alarmname"),
      col("metricnamespace"), col("metricname"),
      col("metricperiod").cast("int").as("metricperiod"),
      col("metricfrequency"), col("metricstatistic"),
      col("threshold").cast("float").as("threshold"),
      col("comparisonoperator"), col("treatmissingdata"),
      col("statevalue"), col("statereason"),
      lit(accountId).as("accountid"), col("metadata"))

  /**
   * O-25: incident payload construction (sla_parse.py:60-78). Input is
   * the O-22 resolution result: alarm rows joined to their SLA def
   * (details, short_description, severity, sns_enabled,
   * dimension_value, metric_name, frequency, reference_id).
   * `invoked_state` is the alarm state parsed from the notification
   * subject's "<STATE>: ..." prefix (sla_parse.py:23).
   *
   * The sns_enabled gate (sla_parse.py:75-85) filters the rows that
   * actually publish; disabled SLAs are log-only, so they simply drop
   * out of the incidents table.
   */
  def toIncidents(resolved: DataFrame): DataFrame =
    resolved
      .withColumn("invoked_state", substring_index(col("subject"), ":", 1))
      .filter(col("sns_enabled"))
      .select(
        col("details"),
        concat(col("short_description"),
          lit(" caused by CloudWatch Alarm in "), col("invoked_state"),
          lit(" state")).as("short_description"),
        col("severity").as("impact"),
        concat_ws("-", col("dimension_value"), col("metric_name"),
          col("frequency")).as("unique_id"),
        lit("Data Governance").as("alarm_origin"),
        col("reference_id"))

  /** reference_id resolution (sla_parse.py:60-63): the value of the
    * last metadata entry named function/dataset, else "Unknown".
    * Input: array<struct<name,value>> metadata column. */
  def referenceId(metadataEntries: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val hits = filter(metadataEntries,
      e => lower(e.getField("name")).isin("function", "dataset"))
    // try_element_at: under Spark 4's default ANSI mode a bare
    // element_at on the empty array THROWS — exactly the no-hit case
    // the "Unknown" fallback exists for
    coalesce(try_element_at(hits, lit(-1)).getField("value"), lit("Unknown"))
  }
}
