package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.entries._
import graft.metrics.MetricsJob

/**
 * Driver contract: one `queries` entry (+ DuckDB `oracleSql`) per
 * implemented operator from SURVEY.md §2 plus the training-data
 * pipeline operators. Column names are aligned between the Spark
 * result and the oracle SQL; every query orders deterministically and
 * keeps float results either exact-decimal-derived or integer so the
 * hash compare is stable across engines.
 *
 * The query/oracle definitions live in per-domain objects under
 * [[graft.entries]] — [[MetricsEntries]] (metrics/alarms/defs/
 * dashboards), [[LakeEntries]] (partition ops / layout),
 * [[DedupEntries]], [[VectorEntries]] (ANN / multimodal),
 * [[CorpusEntries]] (text analysis / corpus prep), and
 * [[SqlSeriesEntries]] (delegated SQL breadth + series math); shared
 * fixture builders are in [[graft.entries.Fixtures]]. This object is
 * only the aggregation point the driver invokes.
 */
object SparkEntry {

  /** Flagship: the business-metric hot path end-to-end on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    MetricsJob.run(spark, "/root/testdata/sf0.001").orderBy("name")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    MetricsEntries.queries ++ LakeEntries.queries ++ DedupEntries.queries ++
      VectorEntries.queries ++ CorpusEntries.queries ++
      SqlSeriesEntries.queries ++ StreamParityEntries.queries

  def oracleSql: Map[String, String] =
    MetricsEntries.oracles ++ LakeEntries.oracles ++ DedupEntries.oracles ++
      VectorEntries.oracles ++ CorpusEntries.oracles ++
      SqlSeriesEntries.oracles ++ StreamParityEntries.oracles
}
