package graft.registry

import graft.model._

/**
 * Compiled definition registry — replaces the reference's dynamic
 * Python module discovery (definitions/definition.py:19-71) with a
 * typed in-code registry (SURVEY.md §7 "What's hard" #3). The JSON
 * definition tables (metric_defs / sla_defs) remain the dynamic
 * interchange format and are produced by [[DefinitionExport]].
 *
 * The built-in account mirrors the shape of the reference's sample
 * definitions (definitions/account_123412341234/set1.py:1-43) but
 * targets the local test lake tables.
 */
object DefinitionRegistry {

  val DefaultAccount = "000000000001"
  val DefaultRegion = "local-1"

  private val lake = "lake"
  private def t(name: String): TableRef = TableRef(lake, name)

  private val tpchDashboard = Widget("tpch_health", Some("lake_quality"))
  private val eventsDashboard = Widget("events_health", Some("ingest_quality"))

  /** Business metrics: arbitrary SQL over lake tables, each yielding a
    * scalar published as a metric value (metric.py:169-182,
    * glue/business_metrics.py:37-57). Queries are ANSI SQL runnable by
    * both Spark and DuckDB; monetary aggregates go through DECIMAL so
    * results are order-independent (a 100 TB shuffle must not change
    * the answer). */
  val businessMetricSet: MetricSet = MetricSet(
    name = "tpch_business",
    schedule = Some("cron(0 * * * ? *)"),
    metrics = Seq(
      BusinessMetric(
        query = "SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) FROM lineitem",
        dataset = t("lineitem"), referenceDatasets = Nil,
        namespace = "Lake/Business", name = "TotalRevenue",
        frequency = Frequency.Day, statistic = "Sum", dashboard = tpchDashboard,
        metadata = Seq(Metadata("dataset", "lineitem")),
        dimensions = Seq(Dimension("Table", "lineitem"))),
      BusinessMetric(
        query = "SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F'",
        dataset = t("orders"), referenceDatasets = Nil,
        namespace = "Lake/Business", name = "FinishedOrders",
        frequency = Frequency.Day, statistic = "Sum", dashboard = tpchDashboard,
        metadata = Seq(Metadata("dataset", "orders")),
        dimensions = Seq(Dimension("Table", "orders"))),
      BusinessMetric(
        query = "SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(c_acctbal) FROM customer",
        dataset = t("customer"), referenceDatasets = Nil,
        namespace = "Lake/Business", name = "AvgAccountBalance",
        frequency = Frequency.Day, statistic = "Average", dashboard = tpchDashboard,
        metadata = Seq(Metadata("dataset", "customer")),
        dimensions = Seq(Dimension("Table", "customer"))),
      BusinessMetric(
        query = "SELECT COUNT(DISTINCT l_partkey) FROM lineitem",
        dataset = t("lineitem"), referenceDatasets = Seq(t("part")),
        namespace = "Lake/Business", name = "DistinctPartsSold",
        frequency = Frequency.Day, statistic = "Sum", dashboard = tpchDashboard,
        metadata = Seq(Metadata("dataset", "lineitem")),
        dimensions = Seq(Dimension("Table", "lineitem"))),
      // Multi-table metric: the reference_datasets are registered as
      // views before execution (O-16; glue/business_metrics.py:29-39).
      BusinessMetric(
        query = "SELECT COUNT(*) FROM lineitem JOIN part ON l_partkey = p_partkey WHERE p_size > 25",
        dataset = t("lineitem"), referenceDatasets = Seq(t("part")),
        namespace = "Lake/Business", name = "LargePartLines",
        frequency = Frequency.Day, statistic = "Sum", dashboard = tpchDashboard,
        metadata = Seq(Metadata("dataset", "lineitem")),
        dimensions = Seq(Dimension("Table", "lineitem"))),
      // Null-result metric: publish must be suppressed (O-19 null guard,
      // glue/business_metrics.py:46).
      BusinessMetric(
        query = "SELECT MAX(o_totalprice) FROM orders WHERE o_totalprice < 0",
        dataset = t("orders"), referenceDatasets = Nil,
        namespace = "Lake/Business", name = "NeverPublished",
        frequency = Frequency.Day, statistic = "Maximum", dashboard = tpchDashboard,
        metadata = Seq(Metadata("dataset", "orders")),
        dimensions = Seq(Dimension("Table", "orders")))
    ))

  /** Operational metric series scraped from the datapoints stream
    * (the `events` table plays the raw-datapoints source; each
    * event_type is one series). */
  val opsMetricSet: MetricSet = MetricSet(
    name = "events_ops",
    metrics = Seq(
      Metric("Lake/Ingest", "Click", Frequency.Hour, "Sum", eventsDashboard,
        metadata = Seq(Metadata("function", "ingest_click")),
        dimensions = Seq(Dimension("EventType", "click"), Dimension("StageBucket", "raw"))),
      Metric("Lake/Ingest", "View", Frequency.Hour, "Average", eventsDashboard,
        metadata = Seq(Metadata("function", "ingest_view")),
        dimensions = Seq(Dimension("EventType", "view"))),
      Metric("Lake/Ingest", "Purchase", Frequency.Hour, "Maximum", eventsDashboard,
        metadata = Seq(Metadata("function", "ingest_purchase")),
        dimensions = Seq(Dimension("EventType", "purchase"))),
      Metric("Lake/Ingest", "Purchase", Frequency.Minute, "SampleCount", eventsDashboard,
        dimensions = Seq(Dimension("EventType", "purchase")))
    ))

  val slaSet: SLASet = {
    val byKey = opsMetricSet.metrics.map(m => (m.name, m.frequency) -> m).toMap
    SLASet("events_slas", Seq(
      SLA(byKey(("Click", Frequency.Hour)),
        shortDescription = "click volume low", details = "hourly click sum under floor",
        threshold = 5.0, comparisonOperator = ComparisonOperator.LessThanOrEqualToThreshold,
        datapointsToAlarm = 2, evaluationPeriods = 3, snsEnabled = true),
      SLA(byKey(("View", Frequency.Hour)),
        shortDescription = "view value high", details = "hourly view average over cap",
        threshold = 50.0, comparisonOperator = ComparisonOperator.GreaterThanThreshold,
        treatMissingData = TreatMissingData.Breaching,
        datapointsToAlarm = 1, evaluationPeriods = 1),
      SLA(byKey(("Purchase", Frequency.Hour)),
        shortDescription = "purchase spike", details = "hourly purchase max over cap",
        threshold = 90.0, comparisonOperator = ComparisonOperator.GreaterThanOrEqualToThreshold,
        datapointsToAlarm = 2, evaluationPeriods = 2, snsEnabled = true)
    ))
  }

  val defaultDefinition: AccountDefinition =
    AccountDefinition(DefaultAccount, Seq(businessMetricSet, opsMetricSet), Seq(slaSet))

  /** Second account: exercises the per-account aggregation the
    * reference drives from accounts/config.json (accounts.py:14-33)
    * and multi-account definition export (definition.py:89-95). */
  val SecondAccount = "000000000002"
  val secondDefinition: AccountDefinition = AccountDefinition(
    SecondAccount,
    Seq(MetricSet("supplier_quality", Seq(
      BusinessMetric(
        query = "SELECT COUNT(*) FROM supplier WHERE s_acctbal < 0",
        dataset = t("supplier"), referenceDatasets = Nil,
        namespace = "Lake/Quality", name = "NegativeBalanceSuppliers",
        frequency = Frequency.Day, statistic = "Sum",
        dashboard = Widget("supplier_health", Some("lake_quality")),
        metadata = Seq(Metadata("dataset", "supplier")),
        dimensions = Seq(Dimension("Table", "supplier")))))),
    Seq.empty)

  private val accounts: Map[String, AccountDefinition] =
    Map(DefaultAccount -> defaultDefinition, SecondAccount -> secondDefinition)

  /** Per-account lookup (definitions/definition.py:10-18 semantics). */
  def forAccount(account: String): AccountDefinition =
    accounts.getOrElse(account,
      throw new NoSuchElementException(s"no definitions for account $account"))

  def allAccounts: Seq[AccountDefinition] = accounts.values.toSeq
}
