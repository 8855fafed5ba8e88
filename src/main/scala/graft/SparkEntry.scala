package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables
import graft.functions.{KeyFns, TextFns, TimeFns, VectorFns}
import graft.metrics.MetricsJob
import graft.model._
import graft.operators._
import graft.pipeline.{Dedup, Multimodal, Similarity}
import graft.registry.{DefinitionExport, DefinitionRegistry}

/**
 * Driver contract: one `queries` entry (+ DuckDB `oracleSql`) per
 * implemented operator from SURVEY.md §2 plus the training-data
 * pipeline operators. Column names are aligned between the Spark
 * result and the oracle SQL; every query orders deterministically and
 * keeps float results either exact-decimal-derived or integer so the
 * hash compare is stable across engines.
 */
object SparkEntry {

  // ---------------------------------------------------------------- helpers

  private val reg = DefinitionRegistry
  private def ev(s: SparkSession, dir: String) = Tables.read(s, dir, "events")
  private def docs(s: SparkSession, dir: String) = Tables.read(s, dir, "documents")

  /** Ops series: (event_type dimension value → metric) fan-out table.
    * One event can feed several series (e.g. purchase hour + minute). */
  private val opsSeries: Seq[(String, MetricLike)] =
    reg.opsMetricSet.metrics.map { m =>
      val et = m.dimensions.find(_.name == "EventType").get.value
      et -> m
    }

  /** Broadcastable (event_type, series_id) mapping df. */
  private def seriesMap(s: SparkSession): DataFrame = {
    import s.implicits._
    opsSeries.map { case (et, m) => (et, m.uniqueId) }
      .toDF("event_type", "series_id")
  }

  /** events → raw datapoints stream (O-2 stand-in): join to the tiny
    * series map (broadcast) fans each event into its series. */
  private def datapoints(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).join(broadcast(seriesMap(s)), Seq("event_type"))
      .select(col("series_id"), col("ts"), col("value"))

  /** SQL VALUES clause for the series map, shared by oracles. */
  private def seriesMapValues: String =
    opsSeries.map { case (et, m) =>
      s"('$et', '${m.uniqueId}', '${m.statistic}', ${m.period}, '${m.frequency.name}')"
    }.mkString(", ")

  private def seriesKeysDf(s: SparkSession): DataFrame =
    DefinitionExport.seriesKeys(s, reg.allAccounts)

  // --------------------------------------------------------------- entries

  /** Flagship: the business-metric hot path end-to-end on sf0.001. */
  def entry(spark: SparkSession): DataFrame =
    MetricsJob.run(spark, "/root/testdata/sf0.001").orderBy("name")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Map[String, (SparkSession, String) => DataFrame](
    // O-1/7/15/16/19: business metrics — SQL → scalar → publish rows.
    "bm_published" -> ((s, dir) => MetricsJob.run(s, dir).orderBy("name")),

    // Delegated-SQL aggregation (TPC-H Q1 shape) through the DataFrame
    // API with order-independent decimal sums.
    "q_pricing_summary" -> { (s, dir) =>
      val li = Tables.read(s, dir, "lineitem")
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("decimal(18,4)")).cast("double").as("sum_disc_price"),
          (sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
            count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // Broadcast-dim star join: revenue by region (dims broadcast, fact
    // never shuffled for the dim joins).
    "q_region_revenue" -> { (s, dir) =>
      val li = Tables.read(s, dir, "lineitem")
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      val n = Tables.read(s, dir, "nation")
      val r = Tables.read(s, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("r_name")
    },

    // Top-k join+agg with deterministic tie-break.
    "q_top_customers" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double").as("total_spend"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("total_spend").desc, col("c_custkey"))
        .limit(10)
    },

    // O-12/14/17: statistic window aggregation at hour frequency.
    "q_stat_windows" -> { (s, dir) =>
      StatWindowAgg.aggregate(datapoints(s, dir), seriesKeysDf(s), "hour")
        .orderBy("series_id", "window_start")
    },

    // O-13: 10-minute end-time alignment.
    "q_align10" -> { (s, dir) =>
      ev(s, dir).select(TimeFns.alignEnd10MinEpoch(col("ts")).as("aligned"))
        .distinct().orderBy("aligned")
    },

    // O-30/31: key derivations as columns, cross-validated against the
    // model-side Scala derivations embedded in the oracle.
    "q_unique_ids" -> { (s, dir) =>
      import s.implicits._
      val defs = reg.allAccounts.flatMap(_.metricSets).flatMap(_.metrics)
        .map(m => (m.namespace, m.name, m.frequency.name,
          m.dimensions.map(d => (d.name, d.value))))
        .toDF("namespace", "name", "frequency", "dims")
      val activeDims = filter(col("dims"), d => !d.getField("_1").endsWith("Bucket"))
      val dimConcat = aggregate(activeDims, lit(""),
        (acc, d) => concat(acc, d.getField("_1"), d.getField("_2")))
      val alarmConcat = aggregate(activeDims, lit(""),
        (acc, d) => concat(acc, d.getField("_1"), lit("-"), d.getField("_2"), lit("-")))
      val dimValues = aggregate(activeDims, lit(""),
        (acc, d) => concat(acc, d.getField("_2")))
      defs.select(col("namespace"), col("name"), col("frequency"),
          KeyFns.uniqueId(col("namespace"), col("name"), col("frequency"), dimConcat)
            .as("unique_id"),
          lower(regexp_replace(concat(concat_ws("-", col("namespace"), col("name"),
            col("frequency")), lit("-"), alarmConcat), "/", "")).as("alarm_uid"),
          KeyFns.widgetTitle(col("name"), col("frequency"), dimValues).as("widget_title"))
        .orderBy("unique_id")
    },

    // Text analysis: token counting.
    "q_token_stats" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFns.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFns.bpeTokenCount(col("text")).cast("long").as("n_bpe"))
        .orderBy("doc_id")
    },

    // Text analysis: language-ID heuristic.
    "q_lang_id" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"), TextFns.langId(col("text")).as("lang_pred"))
        .orderBy("doc_id")
    },

    // Text analysis: quality score.
    "q_quality" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFns.qualityScore(col("text")).as("quality")).orderBy("doc_id")
    },

    // Text analysis: document fingerprints (md5 + min-shingle).
    "q_fingerprints" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"),
        TextFns.fingerprint(col("text")).as("fp"),
        TextFns.shingleFingerprint(col("text"), 3).as("shingle_fp"))
        .orderBy("doc_id")
    },

    // Dedup: exact duplicate groups (hash-groupBy) over a corpus with
    // injected duplicates.
    "q_dedup_exact" -> { (s, dir) =>
      val base = docs(s, dir)
      val dups = base.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 10000)
      Dedup.exactGroups(base.unionByName(dups)).orderBy("content_hash")
    },

    // Dedup: exact dedup keep-list (lowest id per distinct content).
    "q_dedup_keep" -> { (s, dir) =>
      val base = docs(s, dir)
      val dups = base.filter(col("doc_id") % 7 === 0)
        .withColumn("doc_id", col("doc_id") + 10000)
      Dedup.exactDedup(base.unionByName(dups)).select("doc_id").orderBy("doc_id")
    }
  ) ++ queries2

  /** The local test parquet files are single-row-group (unsplittable),
    * so a scan is one task no matter how hot the downstream compute
    * is. Hash/signature-heavy corpora are repartitioned across the
    * session's cores right after the scan — on a real cluster the
    * multi-row-group scan parallelizes by itself and this spread is a
    * cheap narrow-input shuffle relative to the signature work. */
  private def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  /** Corpus with injected near-duplicates (append a short tail to
    * every 11th doc) — used by the near-dup operators. */
  private def nearDupCorpus(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select("doc_id", "text")
    spread(base.unionByName(base.filter(col("doc_id") % 11 === 0)
      .select((col("doc_id") + 20000).as("doc_id"),
        concat(col("text"), lit(" extra near dup tail")).as("text"))))
  }
  private val nearDupCorpusSql =
    """all_docs AS (SELECT doc_id, text FROM documents UNION ALL
      |SELECT doc_id + 20000, text || ' extra near dup tail' FROM documents
      |WHERE doc_id % 11 = 0)""".stripMargin

  /** SLA config rows for the alarm state machine. */
  private def slasDf(s: SparkSession): DataFrame = {
    import s.implicits._
    reg.defaultDefinition.allSlas.map { sla =>
      (sla.metric.uniqueId, sla.metric.period, sla.threshold,
        sla.comparisonOperator.name, sla.datapointsToAlarm,
        sla.evaluationPeriods, sla.treatMissingData.name)
    }.toDF("series_id", "period", "threshold", "comparison_operator",
      "datapoints_to_alarm", "evaluation_periods", "treat_missing_data")
  }

  private def lastDimValue(m: MetricLike): String =
    m.dimensions.filterNot(_.name.endsWith("Bucket")).lastOption
      .map(_.value).getOrElse("")

  private def queries2: Map[String, (SparkSession, String) => DataFrame] = Map(
    // O-23: alarm state machine, batch variant over hourly windows.
    "q_alarm_batch" -> { (s, dir) =>
      val series = StatWindowAgg.aggregate(datapoints(s, dir), seriesKeysDf(s), "hour")
        .select("series_id", "window_start", "metricvalue")
      AlarmStateMachine.evaluate(series, slasDf(s))
        .select("series_id", "window_start", "metricvalue", "breaching",
          "statevalue", "prev_state", "transitioned")
        .orderBy("series_id", "window_start")
    },

    // O-23 streaming parity: the SAME raw datapoints replayed through
    // StreamingAlarmPipeline via MemoryStream (one deterministic batch
    // + a watermark sentinel, StreamParity scaladoc) must emit the
    // batch machine's exact transition stream. The oracle recomputes
    // the batch transitions in SQL and pins in_stream / prev_match /
    // state_match TRUE — any divergence (missing, extra, or
    // state-mismatched streaming transition) flips a pinned column or
    // the row count. One evaluateStream run per SLA because each SLA
    // carries its own CW statistic (Sum / Average / Maximum).
    "q_alarm_stream_parity" -> { (s, dir) =>
      import s.implicits._
      val raw = datapoints(s, dir)
      val slas = slasDf(s)
      val streamed = reg.defaultDefinition.allSlas.flatMap { sla =>
        val sid = sla.metric.uniqueId
        val pts = raw.filter(col("series_id") === sid)
          .select(col("series_id"), col("ts"),
            col("value").cast("double"))
          .as[(String, java.sql.Timestamp, Double)]
          .collect().toSeq // verification fixture, bounded per series
        graft.streaming.StreamParity.replayTransitions(
          s, pts, slas.filter(col("series_id") === sid),
          sla.metric.statistic, sla.metric.period)
      }
      val streamDf = streamed
        .map(t => (t.seriesId, t.windowStart, t.prevState, t.newState))
        .toDF("series_id", "window_start", "s_prev", "s_new")
      val series = StatWindowAgg.aggregate(datapoints(s, dir), seriesKeysDf(s), "hour")
        .select("series_id", "window_start", "metricvalue")
      val batchT = AlarmStateMachine.evaluate(series, slasDf(s))
        .filter(col("transitioned"))
        .select("series_id", "window_start", "metricvalue", "prev_state",
          "statevalue")
      batchT.join(streamDf, Seq("series_id", "window_start"), "full_outer")
        .select(col("series_id"), col("window_start"), col("metricvalue"),
          col("prev_state"), col("statevalue"),
          col("s_prev").isNotNull.as("in_stream"),
          (col("s_prev") <=> col("prev_state")).as("prev_match"),
          (col("s_new") <=> col("statevalue")).as("state_match"))
        .orderBy("series_id", "window_start")
    },

    // O-21 + O-24: alarm snapshot enrichment via the derived-key
    // broadcast join, projected to the slas record shape.
    "q_sla_snapshot" -> { (s, dir) =>
      import s.implicits._
      val alarms = reg.defaultDefinition.allSlas.map { sla =>
        val m = sla.metric
        (s"arn:local:alarm/${m.alarmUniqueId}", m.alarmName(reg.DefaultRegion),
          sla.threshold, sla.comparisonOperator.name, sla.treatMissingData.name,
          "OK", "Threshold not crossed")
      }.toDF("alarmarn", "alarmname", "threshold", "comparisonoperator",
        "treatmissingdata", "statevalue", "statereason")
      val enriched = EnrichmentJoins.enrichAlarms(alarms, seriesKeysDf(s))
      Incidents.toSlaRecords(enriched, reg.DefaultAccount, 0L).orderBy("alarmname")
    },

    // O-22 + O-25: alarm → SLA membership resolution → incident rows.
    "q_incidents" -> { (s, dir) =>
      import s.implicits._
      val alarms = reg.defaultDefinition.allSlas.map { sla =>
        (sla.metric.alarmName(reg.DefaultRegion), "ALARM: breach detected")
      }.toDF("alarmname", "subject")
      val slaDefs = reg.defaultDefinition.allSlas.map { sla =>
        val m = sla.metric
        (m.name, m.frequency.name, lastDimValue(m), sla.details,
          sla.shortDescription, sla.severity, sla.snsEnabled, m.metadata)
      }.toDF("metric_name", "frequency", "dimension_value", "details",
        "short_description", "severity", "sns_enabled", "metadata_entries")
      val resolved = EnrichmentJoins.resolveSlas(alarms, slaDefs)
        .withColumn("reference_id", Incidents.referenceId(col("metadata_entries")))
      Incidents.toIncidents(resolved).orderBy("unique_id")
    },

    // O-12/20/33/34/35 + O-9 shape: full enriched metrics_* records.
    "q_metrics_records" -> { (s, dir) =>
      val agg = StatWindowAgg.aggregate(datapoints(s, dir), seriesKeysDf(s))
        .drop("statistic", "period")
      val results = agg.withColumnRenamed("series_id", "id")
      val enriched = EnrichmentJoins.enrichResults(results, seriesKeysDf(s))
        .withColumnRenamed("id", "series_id")
      RecordShape.toMetricsRecords(enriched, reg.DefaultAccount,
        reg.DefaultRegion, 0L).orderBy("id", "window_start")
    },

    // O-26: object-key → partition values parser.
    "q_partition_parse" -> { (s, dir) =>
      val key = concat_ws("/", lit("metrics"), col("event_type"),
        concat(lit("r"), pmod(col("user_id"), lit(3))),
        date_format(col("ts"), "yyyy"), date_format(col("ts"), "MM"),
        date_format(col("ts"), "dd"), date_format(col("ts"), "HH"),
        lit("part-000.parquet"))
      ev(s, dir).select(PartitionOps.parseKey(key).as("p"))
        .select(col("p.table").as("table_name"), col("p.region"),
          col("p.year"), col("p.month"), col("p.day"), col("p.hour"))
        .distinct()
        .orderBy("table_name", "region", "year", "month", "day", "hour")
    },

    // O-28: partition-age retention relative to the newest data.
    "q_retention" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders")
      val asOf = o.agg(max(unix_timestamp(col("o_orderdate")))).first().getLong(0)
      val parts = o.select(lit("r0").as("region"),
        year(col("o_orderdate")).as("year"), month(col("o_orderdate")).as("month"),
        dayofmonth(col("o_orderdate")).as("day"), lit(0).as("hour"))
      PartitionOps.retain(parts, 90, asOf)
        .groupBy("year", "month", "day").agg(count(lit(1)).as("n_rows"))
        .orderBy("year", "month", "day")
    },

    // O-36: dashboard dedup + grouping over derived widget titles.
    "q_dashboard" -> { (s, dir) =>
      import s.implicits._
      val rows = reg.allAccounts.flatMap(_.metricSets).flatMap(_.metrics)
        .map(m => (m.dashboard.dashboardName, m.name, m.frequency.name,
          m.dimensions.filterNot(_.name.endsWith("Bucket")).map(_.value).mkString))
        .toDF("dashboard", "name", "frequency", "dimvalues")
      val titled = rows.select(col("dashboard"),
        KeyFns.widgetTitle(col("name"), col("frequency"), col("dimvalues"))
          .as("widget_title"))
      Dashboards.group(titled)
        .select(col("dashboard"), array_join(col("widgets"), "|").as("widgets_str"),
          col("n_widgets"))
        .orderBy("dashboard")
    },

    // O-36 completion: the rendered-widget layer — per-metric graph
    // widgets plus category dashboards' markdown link widgets
    // (metrics_streamer.py:345-415), as one dashboards table.
    "q_dashboard_widgets" -> { (s, dir) =>
      import s.implicits._
      val rows = reg.allAccounts.flatMap(_.metricSets).flatMap(_.metrics)
        .map(m => (m.dashboard.dashboardName, m.dashboard.dashboardCategory,
          m.name, m.frequency.name,
          m.dimensions.filterNot(_.name.endsWith("Bucket")).map(_.value).mkString))
        .toDF("dashboard", "category", "name", "frequency", "dimvalues")
      val titled = rows.withColumn("widget_title",
        KeyFns.widgetTitle(col("name"), col("frequency"), col("dimvalues")))
      Dashboards.graphWidgets(titled, reg.DefaultRegion)
        .unionByName(Dashboards.categoryTextWidgets(rows, reg.DefaultRegion,
          reg.DefaultAccount))
        .orderBy("dashboard_name", "widget_type", "content")
    },

    // O-11 / O-5: definition metadata tables.
    "q_defs_metrics" -> { (s, dir) =>
      DefinitionExport.metricDefs(s, reg.allAccounts)
        .orderBy("namespace", "name", "frequency")
    },
    "q_defs_slas" -> { (s, dir) =>
      DefinitionExport.slaDefs(s, reg.allAccounts)
        .orderBy("metric_namespace", "metric_name")
    },

    // Exact percentile statistic variant of O-12 (p50 over hourly
    // windows per event type).
    "q_stat_p50" -> { (s, dir) =>
      val dp = ev(s, dir).select(col("event_type").as("series_id"), col("ts"),
        col("value"))
      dp.groupBy(col("series_id"),
          (floor(unix_timestamp(col("ts")) / 3600) * 3600).cast("long")
            .as("window_start"))
        .agg(expr("percentile(value, 0.5)").as("p50"))
        .orderBy("series_id", "window_start")
    },

    // MinHash + LSH near-dup (fully oracle-replicable via md5 minhash).
    "q_dedup_minhash" -> { (s, dir) =>
      Dedup.minhashNearDupPairs(nearDupCorpus(s, dir), shingleN = 3, k = 12,
        bands = 4, threshold = 0.5).orderBy("id_a", "id_b")
    },

    // N-gram Jaccard with rare-shingle blocking.
    "q_ngram_jaccard" -> { (s, dir) =>
      Dedup.ngramJaccardPairs(nearDupCorpus(s, dir), shingleN = 4,
        threshold = 0.4, maxDf = 50).orderBy("id_a", "id_b")
    },

    // SimHash near-dup. The xxhash64 fingerprint family has no external
    // oracle, so the hash-checked contract is: (a) every injected
    // ground-truth EXACT duplicate (externally enumerable from the
    // corpus construction; identical text → hamming 0 → recovery is
    // guaranteed by the banding pigeonhole, not empirical) is recovered
    // by the simhash path run over a corpus that also carries the
    // tail-perturbed near-dups as realistic noise, and (b) the native
    // SimHash64 expression stays bit-identical to the composed
    // xxhash64 + majority-packing form over the whole corpus. Either
    // property breaking flips a pinned-true column → hash red.
    "q_dedup_simhash" -> { (s, dir) =>
      val base = docs(s, dir).select("doc_id", "text")
      val corpus = nearDupCorpus(s, dir).unionByName(
        base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 40000).as("doc_id"), col("text")))
      val pairs = Dedup.simhashNearDupPairs(corpus, maxHamming = 6)
      val truth = base
        .filter(col("doc_id") % 7 === 0 &&
          size(graft.plans.WordShingles.shingles(col("text"), 1)) > 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 40000).as("id_b"))
      val found = truth.join(
        pairs.select(col("id_a"), col("id_b"), lit(true).as("__f")),
        Seq("id_a", "id_b"), "left")
      val toks = graft.functions.TextFns.tokens(col("text"))
      val ident = corpus.select(
          Dedup.simhashFromHashes(transform(toks, t => xxhash64(t))).as("a"),
          graft.plans.SimHash64.simhash(toks).as("b"))
        .agg(bool_and(col("a") <=> col("b")).as("__ok"))
      found.crossJoin(ident)
        .select(col("id_a"), col("id_b"),
          coalesce(col("__f"), lit(false)).as("found_by_simhash"),
          col("__ok").as("native_matches_composed"))
        .orderBy("id_a", "id_b")
    },

    // Embedding cosine near-dup, SRP-bucketed, over a corpus with
    // injected duplicate vectors (rows-only).
    "q_embed_neardup" -> { (s, dir) =>
      val e = Tables.read(s, dir, "embeddings")
      val withDups = spread(e.unionByName(e.filter(col("vec_id") % 20 === 0)
        .withColumn("vec_id", col("vec_id") + 10000)))
      Dedup.embeddingNearDupPairs(withDups, threshold = 0.9, bits = 16, bands = 4)
        .select("id_a", "id_b").orderBy("id_a", "id_b")
    },

    // Brute-force cosine top-k (exact ANN baseline).
    "q_ann_topk" -> { (s, dir) =>
      val e = spread(Tables.read(s, dir, "embeddings"))
      Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")
    },

    // LSH-bucketed approximate top-k.
    "q_ann_lsh" -> { (s, dir) =>
      val e = spread(Tables.read(s, dir, "embeddings"))
      Similarity.lshTopK(e, e.filter(col("vec_id") < 10), k = 5)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")
    },

    // IVF cell-routed approximate top-k over label-derived centroids
    // (rows-only: centroid averages are merge-order-dependent floats no
    // external engine replicates bit-for-bit; recall vs exact is
    // asserted in tests).
    "q_ann_ivf" -> { (s, dir) =>
      val e = spread(Tables.read(s, dir, "embeddings"))
      Similarity.ivfTopK(e, e.filter(col("vec_id") < 10),
          Similarity.centroids(e), k = 5, nprobe = 3)
        .select("query_id", "neighbor_id", "rank").orderBy("query_id", "rank")
    },

    // Near-dup clusters: connected components over the MinHash pairs
    // via distributed label propagation.
    "q_dedup_clusters" -> { (s, dir) =>
      val pairs = Dedup.minhashNearDupPairs(nearDupCorpus(s, dir), shingleN = 3,
        k = 12, bands = 4, threshold = 0.5)
      Dedup.nearDupClusters(pairs).orderBy("doc_id")
    },

    // MinHash via the native XxMinHash Catalyst expression (codegen'd
    // single-pass signatures). The seeded Kirsch–Mitzenmacher xxhash64
    // family has no external oracle (and band recall is
    // family-dependent, so pair-set equality with the md5 family is
    // NOT an invariant — they diverge on borderline near-dups at
    // sf0.1). The hash-checked contract: over a corpus carrying the
    // tail near-dups as noise plus injected EXACT duplicates, the fast
    // path recovers every exact duplicate — identical text → identical
    // signature → all bands shared → candidate, so recovery is
    // guaranteed by construction — and its exact-Jaccard verify
    // computes exactly 1.0 for them. Any signature, banding, or verify
    // drift flips a pinned column. (The md5-family pair rows are
    // already fully oracle-checked by q_dedup_minhash; re-deriving
    // them here would double the query's cost for zero extra
    // constraint.)
    "q_dedup_minhash_fast" -> { (s, dir) =>
      val base = docs(s, dir).select("doc_id", "text")
      val corpus = nearDupCorpus(s, dir).unionByName(
        base.filter(col("doc_id") % 7 === 0)
          .select((col("doc_id") + 40000).as("doc_id"), col("text")))
      val fast = Dedup.minhashNearDupPairsFast(corpus, shingleN = 3, k = 12,
        bands = 4, threshold = 0.5)
      val truth = base
        .filter(col("doc_id") % 7 === 0 &&
          size(graft.plans.WordShingles.shingles(col("text"), 3,
            distinct = true)) > 0)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 40000).as("id_b"))
      truth.join(fast.select(col("id_a"), col("id_b"), col("jaccard"),
          lit(true).as("__f")), Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"),
          coalesce(col("__f"), lit(false)).as("found_by_fast"),
          col("jaccard"))
        .orderBy("id_a", "id_b")
    },

    // Delegated-SQL breadth (available to BusinessMetric queries):
    // rollup aggregation with deterministic decimal sums.
    "q_rollup_revenue" -> { (s, dir) =>
      val li = Tables.read(s, dir, "lineitem")
      val o = Tables.read(s, dir, "orders")
      val c = Tables.read(s, dir, "customer")
      val n = Tables.read(s, dir, "nation")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .rollup(col("n_name"), col("o_orderpriority"))
        .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("n_name").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    },

    // Window analytics: per-customer order sequence + running spend.
    "q_running_spend" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val o = Tables.read(s, dir, "orders")
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      // filter BEFORE the window: it commutes with the per-customer
      // partition and pushes to the scan instead of sorting everyone
      o.filter(col("o_custkey") <= 20)
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("order_seq"),
          sum(col("o_totalprice").cast("decimal(18,4)"))
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("double").as("running_spend"))
        .orderBy("o_custkey", "order_seq")
    },

    // Set operations: customers with orders but no high-priority ones.
    "q_set_ops" -> { (s, dir) =>
      val o = Tables.read(s, dir, "orders")
      o.select(col("o_custkey")).distinct()
        .except(o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_custkey")).distinct())
        .orderBy("o_custkey")
    },

    // Correlated-subquery shape via anti-join: parts with no sales in
    // the final year (the shipdate filter pushes to the parquet scan).
    "q_unsold_parts" -> { (s, dir) =>
      val p = Tables.read(s, dir, "part")
      val li = Tables.read(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("2001-01-01").cast("timestamp"))
      p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
        .select("p_partkey", "p_name").orderBy("p_partkey")
    },

    // O-3: prefix-filtered alarm-state scan.
    "q_alarm_scan" -> { (s, dir) =>
      import s.implicits._
      val names = reg.defaultDefinition.allSlas
        .map(sla => sla.metric.alarmName(reg.DefaultRegion)) ++
        Seq("unrelated-alarm-1", "third-party-xyz")
      names.toDF("alarmname")
        .filter(col("alarmname").startsWith("data-gov"))
        .orderBy("alarmname")
    },

    // JSON property extraction from the events props column.
    "q_props_parse" -> { (s, dir) =>
      ev(s, dir)
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k").as("k"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n"))
        .orderBy("event_type")
    },

    // O-8: JSON-serialized record stream shape (Kinesis put_records
    // payload stand-in).
    "q_record_json" -> { (s, dir) =>
      ev(s, dir).filter(col("event_id") < 100)
        .select(to_json(struct(col("event_id"), col("event_type"))).as("payload"))
        .orderBy("payload")
    },

    // Text quality signals (Gopher-style repetition/shape stats).
    "q_doc_signals" -> { (s, dir) =>
      docs(s, dir).select(col("doc_id"), TextFns.docSignals(col("text")).as("sig"))
        .select(col("doc_id"), col("sig.rep_ratio"), col("sig.mean_word_len"),
          col("sig.symbol_ratio"))
        .orderBy("doc_id")
    },

    // PII-style redaction over a corpus with injected contact strings.
    "q_redact" -> { (s, dir) =>
      val withPii = docs(s, dir).select(col("doc_id"),
        when(col("doc_id") % 13 === 0,
          concat(col("text"), lit(" contact me at user@example.com or 12345678901")))
          .otherwise(col("text")).as("text"))
      withPii.select(col("doc_id"), TextFns.redact(col("text")).as("clean"))
        .filter(col("clean").contains("<EMAIL>") || col("clean").contains("<NUM>"))
        .orderBy("doc_id")
    },

    // Corpus prep: token-window chunking with overlap.
    "q_chunks" -> { (s, dir) =>
      graft.pipeline.Corpus.chunk(docs(s, dir), chunkTokens = 20, overlapTokens = 5)
        .orderBy("doc_id", "chunk_index")
    },

    // Corpus prep: deterministic stratified sampling for data mixing.
    "q_sample" -> { (s, dir) =>
      graft.pipeline.Corpus.stratifiedSample(docs(s, dir), "lang",
        Map("en" -> 50, "fr" -> 30, "de" -> 20))
        .select("doc_id", "lang").orderBy("doc_id")
    },

    // Mixture-targeted resampling: per-source keep rates derived from
    // target weights and actual counts, integer-exact permyriad.
    "q_mixture" -> { (s, dir) =>
      graft.pipeline.Corpus.mixToTarget(docs(s, dir), "source",
        Map("src1" -> 5L, "src3" -> 3L, "src7" -> 2L), totalTarget = 200L)
        .select("doc_id", "source").orderBy("doc_id")
    },

    // Boilerplate coverage: per-doc share of n-gram occurrences whose
    // gram appears in ≥ minDf distinct documents.
    "q_boilerplate" -> { (s, dir) =>
      graft.pipeline.Corpus.boilerplateCoverage(docs(s, dir), n = 3, minDf = 2L)
        .select("doc_id", "total_grams", "boiler_grams", "boiler_permille")
        .orderBy("doc_id")
    },

    // Corpus prep: int8 embedding quantization (summarized per vector).
    "q_quantize" -> { (s, dir) =>
      val e = Tables.read(s, dir, "embeddings")
      val q = graft.pipeline.Corpus.quantize(col("embedding"))
      e.select(col("vec_id"), q.as("q"))
        .select(col("vec_id"),
          aggregate(col("q.codes"), lit(0L), (acc, c) => acc + c).as("code_sum"),
          round(col("q.vmin"), 6).as("vmin"), round(col("q.vmax"), 6).as("vmax"))
        .orderBy("vec_id")
    },

    // Corpus prep: benchmark decontamination (n-gram leakage guard).
    // The "benchmark" is docs 0-4 plus a near-copy corpus member, so
    // both exact and partial overlap are exercised.
    "q_decontaminate" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val bench = d.filter(col("doc_id") < 5)
      // corpus includes leaked benchmark copies (id+30000) that the
      // guard must remove; spread the 8-gram explode across cores
      val corpus = spread(d.filter(col("doc_id") >= 5)
        .unionByName(bench.withColumn("doc_id", col("doc_id") + 30000)))
      graft.pipeline.Corpus.decontaminate(corpus, bench, n = 8)
        .select("doc_id").orderBy("doc_id")
    },

    // Corpus prep: composed filter → dedup → per-language stats.
    "q_corpus_prep" -> { (s, dir) =>
      graft.pipeline.Corpus.prepare(spread(docs(s, dir)), Seq("en", "fr"), 0.5)
        .orderBy("lang")
    },

    // Multimodal plumbing: partition-batched (stub) decode features.
    // Real JDK codec round-trip: fixture PNG/WAV payloads are encoded
    // with ImageIO / javax.sound.sampled and decoded back by
    // extractFeatures; every output value is a codec-produced fact the
    // oracle predicts from the doc_id-derived encoding parameters.
    "q_media_features" -> { (s, dir) =>
      Multimodal.extractFeatures(Multimodal.syntheticMedia(spread(docs(s, dir))))
        .toDF().select("media_id", "kind", "width_px", "height_px",
          "dominant_bin", "dominant_frac", "sample_rate_hz", "n_samples",
          "peak", "frames_sampled")
        .orderBy("media_id")
    },

    // Point-in-time (as-of) join: for sampled probe events, the latest
    // per-type value at or before the probe time — union + one sorted
    // window pass per key, no range join, no per-probe subquery.
    "q_asof" -> { (s, dir) =>
      val e = ev(s, dir)
      val probes = e.filter(col("event_id") % 97 === 0)
        .select(col("event_id"), col("event_type"), col("ts"))
      val quotes = AsOfJoin.latestQuotePerTs(e, "event_type", "ts", "value")
      AsOfJoin.asOf(probes, quotes, "event_type", "ts", "value")
        .select(col("event_id"), col("event_type"),
          unix_timestamp(col("ts")).as("ts_epoch"),
          col("asof_value"))
        .orderBy("event_id")
    },

    // Gap-based sessionization over the event stream (30-min gap).
    "q_sessions" -> { (s, dir) =>
      Sessionize.sessions(ev(s, dir), "user_id", "ts", "event_id", 1800L)
        .orderBy("user_id", "session_index")
    },

    // Binned interval join: events falling inside deterministic
    // maintenance windows spawned by every 53rd event — hash equi-join
    // on time bins instead of the quadratic theta join.
    "q_range_join" -> { (s, dir) =>
      val e = ev(s, dir)
      val points = e.select(col("event_id").as("point_id"),
        unix_timestamp(col("ts")).as("pts"))
      val iv = e.filter(col("event_id") % 53 === 0)
        .select(col("event_id").as("interval_id"),
          unix_timestamp(col("ts")).as("s"),
          (unix_timestamp(col("ts")) + (col("event_id") % 7 + 1) * 600).as("e"))
      RangeJoin.binned(points, iv, "pts", "s", "e", binWidth = 3600L)
        .groupBy(col("interval_id"))
        .agg(count(lit(1)).as("n_points"))
        .orderBy("interval_id")
    },

    // Integer-arithmetic TF-IDF: top-3 terms per sampled document.
    "q_tfidf" -> { (s, dir) =>
      graft.pipeline.TfIdf.topTerms(docs(s, dir).filter(col("doc_id") % 7 === 0), 3)
        .orderBy("doc_id", "rank")
    },

    // HLL sketch property check: the oracle pins the exact distinct
    // count AND asserts (as a hash-checked literal-true column) that
    // the HLL++ estimate lands within 5% — if the sketch drifts, the
    // hash compare goes red.
    "q_approx_distinct" -> { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("exact_users"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("__approx"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("__approx") - col("exact_users")) <=
            col("exact_users") * 0.05).as("hll_within_5pct"))
        .orderBy("event_type")
    },

    // Quantile sketch property check: exact interpolated percentiles
    // (bit-equal to DuckDB quantile_cont) plus hash-checked assertions
    // that approx_percentile stays inside the ±1-percentile band.
    "q_sketch_quantile" -> { (s, dir) =>
      ev(s, dir).groupBy("event_type")
        .agg(expr("percentile(value, array(0.49D, 0.50D, 0.51D, 0.94D, 0.95D, 0.96D))").as("q"),
          expr("approx_percentile(value, array(0.50D, 0.95D), 10000)").as("a"))
        .select(col("event_type"),
          col("q")(1).as("p50_exact"), col("q")(4).as("p95_exact"),
          col("a")(0).between(col("q")(0), col("q")(2)).as("p50_in_band"),
          col("a")(1).between(col("q")(3), col("q")(5)).as("p95_in_band"))
        .orderBy("event_type")
    },

    // Token-stream sequence packing (two-phase distributed prefix sum).
    "q_packs" -> { (s, dir) =>
      graft.pipeline.Packing.streamPacks(docs(s, dir), 2048L)
        .orderBy("doc_id")
    },

    // Incremental near-dup: a new batch (every 5th doc + injected
    // near-copies of existing docs) against the precomputed signature
    // index of the existing corpus — no existing×existing re-pairing.
    "q_dedup_incr" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val existing = spread(d.filter(col("doc_id") % 5 =!= 0))
      val newBatch = spread(d.filter(col("doc_id") % 5 === 0)
        .unionByName(d.filter(col("doc_id") % 5 === 1)
          .select((col("doc_id") + 20000).as("doc_id"),
            concat(col("text"), lit(" extra near dup tail")).as("text"))))
      val index = Dedup.minhashSignatures(existing, "text", "doc_id", 3, 12)
      Dedup.minhashIncrementalPairs(index, newBatch)
        .orderBy("id_a", "id_b")
    },

    // Trailing-window z-score anomalies per event series (integer
    // arithmetic, division-free — bit-identical across engines).
    "q_anomaly" -> { (s, dir) =>
      // events.value ≤ ~561 (cents ≤ 6e4) — far inside the Long-safe
      // envelope, so the cheap path is exact here
      Anomaly.zScoreFlags(ev(s, dir), "event_type", "ts", "event_id", "value",
          wide = false)
        .filter(col("is_anomaly"))
        .select(col("event_id"), col("event_type"), col("n_hist"))
        .orderBy("event_id")
    },

    // Backfill planner: hourly partition gaps per series (O-26/O-27
    // companion — what a missed landing looks like to the scheduler).
    "q_partition_gaps" -> { (s, dir) =>
      PartitionOps.hourlyGaps(ev(s, dir), "event_type", "ts")
        .orderBy("series", "missing_hour_epoch")
    },

    // Z-order (Morton) values over a (user, event) grid — the
    // data-skipping layout key, pure shift/mask/add arithmetic.
    "q_zorder" -> { (s, dir) =>
      val e = ev(s, dir).filter(col("event_id") % 101 === 0)
      e.select(col("event_id"),
          ZOrder.zValue2(pmod(col("user_id"), lit(1024L)),
            pmod(col("event_id"), lit(1024L)), bits = 10).as("z"))
        .orderBy("event_id")
    },

    // Incremental rollup: merge the partial day-state of two disjoint
    // halves of the stream — must equal a full re-aggregation (which
    // is what the oracle computes).
    "q_rollup_incr" -> { (s, dir) =>
      val e = ev(s, dir)
      val older = Rollups.dayState(e.filter(col("event_id") % 3 =!= 0),
        "event_type", "ts", "value")
      val delta = Rollups.dayState(e.filter(col("event_id") % 3 === 0),
        "event_type", "ts", "value")
      Rollups.finalize(Rollups.merge(older, delta))
        .orderBy("series", "day")
    },

    // Per-series first derivative (CloudWatch RATE(m1) analogue).
    "q_rate" -> { (s, dir) =>
      SeriesMath.rate(ev(s, dir).filter(col("event_id") % 11 === 0),
          "event_type", "ts", "event_id", "value")
        .select(col("event_id"), col("event_type"), col("rate_per_sec"))
        .orderBy("event_id")
    },

    // Time-weighted average per series-day (integer-exact).
    "q_twa" -> { (s, dir) =>
      SeriesMath.timeWeightedAvg(ev(s, dir), "event_type", "ts", "event_id",
          "value")
        .orderBy("series", "day")
    },

    // Pivot: per-user event counts, one column per event type.
    "q_pivot" -> { (s, dir) =>
      ev(s, dir).filter(col("user_id") % 17 === 0)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id")
    },

    // CDC latest-wins compaction: one surviving row per (user, type) —
    // max over the (epoch, event_id) struct, no window sort.
    "q_upsert" -> { (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(unix_timestamp(col("ts")).as("e"),
          col("event_id").as("i"), col("value").as("v"))).as("r"))
        .select(col("user_id"), col("event_type"), col("r.e").as("last_epoch"),
          col("r.i").as("last_event_id"), col("r.v").as("last_value"))
        .orderBy("user_id", "event_type")
    },

    // SCD2 validity intervals: each event's state holds until the
    // user's next event (open interval → null valid_to).
    "q_scd2" -> { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy(col("valid_from"), col("event_id"))
      ev(s, dir).filter(col("user_id") % 29 === 0)
        .select(col("user_id"), col("event_id"),
          unix_timestamp(col("ts")).as("valid_from"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
        .orderBy("user_id", "valid_from", "event_id")
    },

    // Dedup-key text normalization (accent fold + case + punctuation
    // collapse) and the exact-dup groups it exposes that raw md5 missed.
    "q_normalize" -> { (s, dir) =>
      val d = docs(s, dir).select("doc_id", "text")
      val extra = d.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 40000).as("doc_id"),
          concat(upper(col("text")), lit("  !!")).as("text"))
      d.unionByName(extra)
        .select(col("doc_id"),
          md5(TextFns.normalizeForDedup(col("text"))).as("norm_key"))
        .groupBy("norm_key").agg(count(lit(1)).as("n_docs"),
          min("doc_id").as("keep_id"))
        .filter(col("n_docs") > 1)
        .orderBy("keep_id")
    },

    // Custom bounded-heap Aggregator as a query surface: top-3 spenders
    // per event type (map-side combinable, no per-group sort).
    "q_topk_agg" -> { (s, dir) =>
      import s.implicits._
      val cents = ev(s, dir)
        .groupBy(col("event_type"), col("user_id"))
        .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
        .select(col("event_type"), col("user_id"), col("cents"))
        .as[(String, Long, Long)]
      val agg = new graft.plans.TopKAggregator(3).toColumn
      cents.groupByKey(_._1)
        .mapValues(r => graft.plans.ScoredId(r._2, r._3.toDouble))
        .agg(agg.name("top"))
        .flatMap { case (et, top) =>
          top.zipWithIndex.map { case (s2, i) =>
            (et, s2.id, s2.score.toLong, i + 1) }
        }
        .toDF("event_type", "user_id", "cents", "rank")
        .orderBy("event_type", "rank")
    }
  )

  // ---------------------------------------------------------------- oracles

  /** Oracle for bm_published, generated from the registry so the SQL
    * and the engine share one definition source. */
  private def bmPublishedOracle: String = {
    val rows = reg.businessMetricSet.metrics.collect {
      case bm: BusinessMetric if bm.name != "NeverPublished" =>
        val dims = DefinitionExport.jsonObject(bm.dimensions.map(d => d.name -> d.value))
          .replace("'", "''")
        s"SELECT '${bm.namespace}' AS namespace, '${bm.name}' AS name, " +
          s"'$dims' AS dimensions, '1970-01-01T00:00:00Z' AS publishtime, " +
          s"CAST((${bm.query}) AS DOUBLE) AS metricvalue"
    }
    rows.mkString("", " UNION ALL ", " ORDER BY name")
  }

  private def uniqueIdsOracle: String = {
    val rows = reg.allAccounts.flatMap(_.metricSets).flatMap(_.metrics)
      .sortBy(_.uniqueId)
      .map { m =>
        s"SELECT '${m.namespace}' AS namespace, '${m.name}' AS name, " +
          s"'${m.frequency.name}' AS frequency, '${m.uniqueId}' AS unique_id, " +
          s"'${m.alarmUniqueId}' AS alarm_uid, '${m.widgetTitle}' AS widget_title"
      }
    rows.mkString("", " UNION ALL ", "")
  }

  /** Exact ordered-fold dot product in DuckDB SQL — bit-identical to
    * [[graft.plans.VecDot]] (both accumulate double products left to
    * right, and decimal literals parse to the same doubles). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  private def cosineSql(a: String, b: String): String =
    s"(CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) > 0 THEN " +
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END)"

  /** DuckDB replication of [[VectorFns.srpSignature]]: the hyperplanes
    * are deterministic plan literals, so the oracle inlines the same
    * values and reproduces every sign bit-exactly (verified 500/500 at
    * sf0.01). */
  private def srpSigSql(vecExpr: String, bits: Int): String =
    VectorFns.srpPlanes(bits, 64, 42L).map { plane =>
      val lits = plane.mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(range(1,65), i -> " +
        s"coalesce(CAST($vecExpr[i] AS DOUBLE) * ($lits::DOUBLE[])[i], 0.0))) >= 0 " +
        "THEN '1' ELSE '0' END)"
    }.mkString("(", " || ", ")")

  def oracleSql: Map[String, String] = Map(
    "bm_published" -> bmPublishedOracle,

    "q_embed_neardup" ->
      s"""WITH wd AS (SELECT vec_id, embedding FROM embeddings
         |UNION ALL SELECT vec_id + 10000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0),
         |sig AS (SELECT vec_id, embedding, ${srpSigSql("embedding", 16)} AS sig FROM wd),
         |banded AS (SELECT vec_id, embedding, band, substr(sig, band*4 + 1, 4) AS band_key
         |FROM sig CROSS JOIN (SELECT unnest(range(0,4)) AS band) bs),
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         |a.embedding AS v_a, b.embedding AS v_b
         |FROM banded a JOIN banded b ON a.band = b.band AND a.band_key = b.band_key
         |WHERE a.vec_id < b.vec_id)
         |SELECT id_a, id_b FROM cand WHERE ${cosineSql("v_a", "v_b")} >= 0.9
         |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH sigc AS (SELECT vec_id, embedding, ${srpSigSql("embedding", 16)} AS sig FROM embeddings),
         |bc AS (SELECT vec_id, embedding, band, substr(sig, band*2 + 1, 2) AS band_key
         |FROM sigc CROSS JOIN (SELECT unnest(range(0,8)) AS band) bs),
         |cand AS (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |q.embedding AS v_q, c.embedding AS v_c
         |FROM bc c JOIN bc q ON c.band = q.band AND c.band_key = q.band_key
         |WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id,
         |row_number() OVER (PARTITION BY query_id ORDER BY ${cosineSql("v_q", "v_c")} DESC, neighbor_id) AS rank
         |FROM cand)
         |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin,

    "q_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_region_revenue" ->
      """SELECT r_name,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |COUNT(*) AS n_lines
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,

    "q_top_customers" ->
      """SELECT c_custkey, c_name,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend,
        |COUNT(*) AS n_orders
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY total_spend DESC, c_custkey LIMIT 10""".stripMargin,

    "q_stat_windows" ->
      s"""WITH sm(event_type, series_id, statistic, period, frequency) AS
         |(VALUES $seriesMapValues),
         |dp AS (SELECT sm.series_id, sm.statistic, sm.period, sm.frequency,
         |CAST(floor(epoch(e.ts)/sm.period)*sm.period AS BIGINT) AS window_start, e.value
         |FROM events e JOIN sm USING(event_type) WHERE sm.frequency = 'hour')
         |SELECT series_id, statistic, period, frequency, window_start,
         |CASE statistic
         |WHEN 'Sum' THEN CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)
         |WHEN 'Average' THEN CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)/COUNT(value)
         |WHEN 'Maximum' THEN MAX(value)
         |WHEN 'Minimum' THEN MIN(value)
         |WHEN 'SampleCount' THEN CAST(COUNT(value) AS DOUBLE) END AS metricvalue
         |FROM dp GROUP BY series_id, statistic, period, frequency, window_start
         |ORDER BY series_id, window_start""".stripMargin,

    "q_align10" ->
      """SELECT DISTINCT CAST(floor(epoch(ts)/600)*600 AS BIGINT) AS aligned
        |FROM events ORDER BY aligned""".stripMargin,

    "q_unique_ids" -> uniqueIdsOracle,

    "q_token_stats" ->
      """SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_bpe
        |FROM documents ORDER BY doc_id""".stripMargin,

    "q_lang_id" ->
      """WITH t AS (SELECT doc_id, text,
        |list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |c AS (SELECT doc_id, text,
        |len(list_filter(toks, x -> list_contains(['the','a','of','and','is'], x))) AS en,
        |len(list_filter(toks, x -> list_contains(['le','la','les','et','des'], x))) AS fr,
        |len(list_filter(toks, x -> list_contains(['der','die','und','das','ist'], x))) AS de,
        |len(list_filter(toks, x -> list_contains(['el','los','las','y','es'], x))) AS es
        |FROM t),
        |m AS (SELECT *, greatest(en, fr, de, es) AS mx FROM c)
        |SELECT doc_id, CASE
        |WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
        |WHEN mx = 0 THEN 'und'
        |WHEN en = mx THEN 'en' WHEN fr = mx THEN 'fr'
        |WHEN de = mx THEN 'de' ELSE 'es' END AS lang_pred
        |FROM m ORDER BY doc_id""".stripMargin,

    "q_quality" ->
      """WITH t AS (SELECT doc_id, text,
        |list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |c AS (SELECT doc_id,
        |CAST(length(text) AS DOUBLE) AS chars,
        |CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS alpha,
        |CAST(len(list_filter(toks, x -> list_contains(
        |['the','a','of','and','is','le','la','les','et','des','der','die','und','das','ist','el','los','las','y','es'], x))) AS DOUBLE) AS stop,
        |greatest(len(toks), 1) AS ntoks
        |FROM t)
        |SELECT doc_id, round((
        |least(chars/500.0, 1.0) +
        |(CASE WHEN chars > 0 THEN alpha/chars ELSE 0.0 END) +
        |least(stop*10.0/CAST(ntoks AS DOUBLE), 1.0)) / 3.0, 6) AS quality
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_fingerprints" ->
      """WITH t AS (SELECT doc_id, text,
        |list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM documents)
        |SELECT doc_id,
        |md5(lower(regexp_replace(text, '\W+', '', 'g'))) AS fp,
        |list_min(list_transform(range(1, greatest(len(w)-2, 0)+1),
        |i -> md5(array_to_string(w[i:i+2], ' ')))) AS shingle_fp
        |FROM t ORDER BY doc_id""".stripMargin,

    "q_dedup_exact" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0)
        |SELECT md5(text) AS content_hash, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        |FROM all_docs GROUP BY md5(text) HAVING COUNT(*) > 1
        |ORDER BY content_hash""".stripMargin,

    "q_dedup_keep" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents
        |UNION ALL SELECT doc_id + 10000, text FROM documents WHERE doc_id % 7 = 0),
        |keep AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM all_docs GROUP BY md5(text))
        |SELECT doc_id FROM keep ORDER BY doc_id""".stripMargin
  ) ++ oracles2

  private def sq(s: String): String = s.replace("'", "''")

  private def statAggSql(statistic: String): String = statistic match {
    case "Sum" => "CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)"
    case "Average" => "CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)/COUNT(value)"
    case "Maximum" => "MAX(value)"
    case "Minimum" => "MIN(value)"
    case "SampleCount" => "CAST(COUNT(value) AS DOUBLE)"
  }

  /** Alarm-machine oracle: one CTE chain per SLA replicating densify →
    * vote → M-of-N window → state/lag, generated from the registry. */
  /** Shared CTE board for the alarm oracles: (ctes, per-SLA union of
    * dense evaluated slots with lag'd prev_state + transitioned). */
  private def alarmOracleBoard: (String, String) = {
    val slas = reg.defaultDefinition.allSlas.zipWithIndex
    val ctes = slas.flatMap { case (sla, i) =>
      val m = sla.metric
      val et = m.dimensions.find(_.name == "EventType").get.value
      val p = m.period
      val op = sla.comparisonOperator match {
        case ComparisonOperator.GreaterThanThreshold => ">"
        case ComparisonOperator.GreaterThanOrEqualToThreshold => ">="
        case ComparisonOperator.LessThanThreshold => "<"
        case ComparisonOperator.LessThanOrEqualToThreshold => "<="
      }
      val missingVote = sla.treatMissingData match {
        case TreatMissingData.NotBreaching => "FALSE"
        case TreatMissingData.Breaching => "TRUE"
        case _ => "CAST(NULL AS BOOLEAN)"
      }
      val n = sla.evaluationPeriods
      val mm = sla.datapointsToAlarm
      Seq(
        s"dp_$i AS (SELECT CAST(floor(epoch(ts)/$p)*$p AS BIGINT) AS ws, ${statAggSql(m.statistic)} AS v FROM events WHERE event_type = '$et' GROUP BY 1)",
        s"b_$i AS (SELECT min(ws) AS lo, max(ws) AS hi FROM dp_$i)",
        s"slots_$i AS (SELECT unnest(generate_series(lo, hi, $p)) AS ws FROM b_$i)",
        s"dense_$i AS (SELECT s.ws, d.v FROM slots_$i s LEFT JOIN dp_$i d USING (ws))",
        s"eval_$i AS (SELECT ws, v, CASE WHEN v IS NOT NULL THEN v $op ${sla.threshold} ELSE $missingVote END AS vote FROM dense_$i)",
        s"win_$i AS (SELECT ws, v, vote, SUM(CASE WHEN vote THEN 1 ELSE 0 END) OVER (ORDER BY ws ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW) AS bc FROM eval_$i)",
        s"st_$i AS (SELECT ws, v, vote, CASE WHEN bc >= $mm THEN 'ALARM' ELSE 'OK' END AS state FROM win_$i)",
        s"fin_$i AS (SELECT '${m.uniqueId}' AS series_id, ws AS window_start, v AS metricvalue, coalesce(vote, FALSE) AS breaching, state AS statevalue, lag(state) OVER (ORDER BY ws) AS prev_state FROM st_$i)")
    }
    val union = slas.map { case (_, i) =>
      s"SELECT series_id, window_start, metricvalue, breaching, statevalue, prev_state, (prev_state IS NOT NULL AND prev_state <> statevalue) AS transitioned FROM fin_$i"
    }.mkString(" UNION ALL ")
    (ctes.mkString(", "), union)
  }

  private def alarmBatchOracle: String = {
    val (ctes, union) = alarmOracleBoard
    s"WITH $ctes $union ORDER BY series_id, window_start"
  }

  /** Every batch transition must have been emitted by the streaming
    * replay with the same prev/new state — the pinned columns. */
  private def alarmStreamParityOracle: String = {
    val (ctes, union) = alarmOracleBoard
    s"WITH $ctes, all_t AS ($union) " +
      "SELECT series_id, window_start, metricvalue, prev_state, statevalue, " +
      "TRUE AS in_stream, TRUE AS prev_match, TRUE AS state_match " +
      "FROM all_t WHERE transitioned ORDER BY series_id, window_start"
  }

  private def metadataJsonLit(m: MetricLike): String = {
    if (m.metadata.isEmpty) "CAST(NULL AS VARCHAR)"
    else s"'${sq(DefinitionExport.jsonObject(m.metadata.map(x => x.name -> x.value)))}'"
  }
  private def dimensionsJsonLit(m: MetricLike): String = {
    if (m.dimensions.isEmpty) "CAST(NULL AS VARCHAR)"
    else s"'${sq(DefinitionExport.jsonObject(m.dimensions.map(x => x.name -> x.value)))}'"
  }

  private def slaSnapshotOracle: String = {
    val rows = reg.defaultDefinition.allSlas.sortBy(_.metric.alarmName(reg.DefaultRegion))
      .map { sla =>
        val m = sla.metric
        s"SELECT '1970-01-01T00:00:00' AS collectiontime, " +
          s"'arn:local:alarm/${m.alarmUniqueId}' AS alarmarn, " +
          s"'${m.alarmName(reg.DefaultRegion)}' AS alarmname, " +
          s"'${m.namespace}' AS metricnamespace, '${m.name}' AS metricname, " +
          s"CAST(${m.period} AS INTEGER) AS metricperiod, " +
          s"'${m.frequency.name}' AS metricfrequency, '${m.statistic}' AS metricstatistic, " +
          s"CAST(${sla.threshold} AS REAL) AS threshold, " +
          s"'${sla.comparisonOperator.name}' AS comparisonoperator, " +
          s"'${sla.treatMissingData.name}' AS treatmissingdata, " +
          s"'OK' AS statevalue, 'Threshold not crossed' AS statereason, " +
          s"'${reg.DefaultAccount}' AS accountid, ${metadataJsonLit(m)} AS metadata"
      }
    rows.mkString("", " UNION ALL ", " ORDER BY alarmname")
  }

  /** Incidents oracle: model-side replication of sla_parse.py:26-78. */
  private def incidentsOracle: String = {
    val rows = reg.defaultDefinition.allSlas.flatMap { sla =>
      val m = sla.metric
      val alarmName = m.alarmName(reg.DefaultRegion)
      val prefix = alarmName.substring(0, alarmName.indexOf("-SLA"))
      val toks = prefix.split("-")
      val derived = Seq(toks(3), toks(4), toks.drop(6).mkString("-"))
      val dimValue = lastDimValue(m)
      val matches = Seq(m.name.toLowerCase, m.frequency.name, dimValue.toLowerCase)
        .forall(derived.contains)
      if (!matches || !sla.snsEnabled) None
      else {
        val refId = m.metadata
          .filter(md => Set("function", "dataset")(md.name.toLowerCase))
          .lastOption.map(_.value).getOrElse("Unknown")
        Some(s"SELECT '${sq(sla.details)}' AS details, " +
          s"'${sq(sla.shortDescription)} caused by CloudWatch Alarm in ALARM state' AS short_description, " +
          s"'${sla.severity}' AS impact, " +
          s"'$dimValue-${m.name}-${m.frequency.name}' AS unique_id, " +
          s"'Data Governance' AS alarm_origin, '$refId' AS reference_id")
      }
    }
    rows.mkString("", " UNION ALL ", " ORDER BY unique_id")
  }

  /** Extended series-map VALUES incl. namespace/name/metadata/dims. */
  private def seriesMapValuesFull: String =
    opsSeries.map { case (et, m) =>
      s"('$et', '${m.uniqueId}', '${m.statistic}', ${m.period}, " +
        s"'${m.frequency.name}', '${m.namespace}', '${m.name}', " +
        s"${metadataJsonLit(m)}, ${dimensionsJsonLit(m)})"
    }.mkString(", ")

  private def dashboardOracle: String = {
    val grouped = reg.allAccounts.flatMap(_.metricSets).flatMap(_.metrics)
      .groupBy(_.dashboard.dashboardName).toSeq.sortBy(_._1)
    grouped.map { case (dash, ms) =>
      val titles = ms.map(_.widgetTitle).distinct.sorted
      s"SELECT '$dash' AS dashboard, '${sq(titles.mkString("|"))}' AS widgets_str, " +
        s"CAST(${titles.size} AS BIGINT) AS n_widgets"
    }.mkString("", " UNION ALL ", " ORDER BY dashboard")
  }

  /** Model-side replication of the rendered widget table
    * (metrics_streamer.py:345-415). */
  private def dashboardWidgetsOracle: String = {
    val region = reg.DefaultRegion
    val account = reg.DefaultAccount
    val metrics = reg.allAccounts.flatMap(_.metricSets).flatMap(_.metrics)
    val graph = metrics
      .map(m => (s"${m.dashboard.dashboardName}-$region", "graph",
        m.widgetTitle, 10, 6)).distinct
    def md(dash: String): String = {
      val db = s"$dash-$region"
      s"## Navigate to **$db** dashboard:\n\n*Click here for " +
        s"[button:primary:$db](https://$region.console.aws.amazon.com/" +
        s"cloudwatch/home?region=$region#dashboards:name=$db;" +
        s"accountId=$account) dashboard*"
    }
    val text = metrics
      .flatMap(m => m.dashboard.dashboardCategory.map(cat =>
        (s"$cat-$region", "text", md(m.dashboard.dashboardName), 12, 3)))
      .distinct
    (graph ++ text).sorted.map { case (db, tpe, content, w, h) =>
      s"SELECT '${sq(db)}' AS dashboard_name, '$tpe' AS widget_type, " +
        s"'${sq(content)}' AS content, CAST($w AS INTEGER) AS width, " +
        s"CAST($h AS INTEGER) AS height"
    }.mkString("", " UNION ALL ",
      " ORDER BY dashboard_name, widget_type, content")
  }

  private def defsMetricsOracle: String = {
    val rows = for {
      d <- reg.allAccounts
      set <- d.metricSets
      m <- set.metrics
    } yield {
      val (dataset, refs, query) = m match {
        case bm: BusinessMetric =>
          (s"'${sq(DefinitionExport.jsonObject(Seq("database" -> bm.dataset.database,
            "table" -> bm.dataset.table, "catalog" -> bm.dataset.catalog,
            "alias" -> bm.dataset.alias)))}'",
            s"'${sq("[" + bm.referenceDatasets.map(t => DefinitionExport.jsonObject(
              Seq("database" -> t.database, "table" -> t.table,
                "catalog" -> t.catalog, "alias" -> t.alias))).mkString(", ") + "]")}'",
            s"'${sq(bm.query)}'")
        case dm: DataSetMetric =>
          (s"'${sq(DefinitionExport.jsonObject(Seq("database" -> dm.dataset.database,
            "table" -> dm.dataset.table, "catalog" -> dm.dataset.catalog,
            "alias" -> dm.dataset.alias)))}'",
            "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        case _ => ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
      }
      s"SELECT '${m.namespace}' AS namespace, '${m.name}' AS name, " +
        s"'${m.frequency.name}' AS frequency, CAST(${m.period} AS INTEGER) AS period, " +
        s"'${m.statistic}' AS statistic, ${metadataJsonLit(m)} AS metadata, " +
        s"${dimensionsJsonLit(m)} AS dimensions, '${set.name}' AS metric_set, " +
        s"CAST(NULL AS VARCHAR) AS sla_set, '${m.dashboard.dashboardName}' AS dashboard, " +
        s"'${d.account}' AS account, $dataset AS dataset, " +
        s"$refs AS reference_datasets, $query AS query"
    }
    rows.mkString("", " UNION ALL ", " ORDER BY namespace, name, frequency")
  }

  private def defsSlasOracle: String = {
    val rows = for {
      d <- reg.allAccounts
      set <- d.slaSets
      sla <- set.slas
    } yield {
      val m = sla.metric
      s"SELECT CAST(NULL AS VARCHAR) AS ticket, " +
        s"CAST(${sla.threshold.toInt} AS INTEGER) AS threshold, " +
        s"'${sla.comparisonOperator.name}' AS comparison_operator, " +
        s"CAST(${sla.datapointsToAlarm} AS INTEGER) AS datapoints_to_alarm, " +
        s"CAST(${sla.evaluationPeriods} AS INTEGER) AS evaluation_periods, " +
        s"'${sla.treatMissingData.name}' AS treat_missing_data, " +
        s"'${sla.severity}' AS severity, '${sq(sla.shortDescription)}' AS short_description, " +
        s"'${sq(sla.details)}' AS details, '${m.namespace}' AS metric_namespace, " +
        s"'${m.name}' AS metric_name, '${set.name}' AS metric_set, " +
        s"${metadataJsonLit(m)} AS metric_metadata, " +
        s"${dimensionsJsonLit(m)} AS metric_dimensions, '${d.account}' AS account"
    }
    rows.mkString("", " UNION ALL ", " ORDER BY metric_namespace, metric_name")
  }

  private def alarmScanOracle: String = {
    val rows = reg.defaultDefinition.allSlas
      .map(sla => sla.metric.alarmName(reg.DefaultRegion)).sorted
      .map(n => s"SELECT '$n' AS alarmname")
    rows.mkString("", " UNION ALL ", " ORDER BY alarmname")
  }

  private def oracles2: Map[String, String] = Map(
    "q_alarm_scan" -> alarmScanOracle,

    "q_rollup_revenue" ->
      """SELECT n_name, o_orderpriority,
        |CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY ROLLUP (n_name, o_orderpriority)
        |ORDER BY n_name ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |CAST(row_number() OVER w AS INTEGER) AS order_seq,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders WHERE o_custkey <= 20
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, order_seq""".stripMargin,

    "q_set_ops" ->
      """SELECT DISTINCT o_custkey FROM orders
        |EXCEPT
        |SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_custkey""".stripMargin,

    "q_unsold_parts" ->
      """SELECT p_partkey, p_name FROM part
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey
        |AND l_shipdate >= TIMESTAMP '2001-01-01')
        |ORDER BY p_partkey""".stripMargin,

    "q_props_parse" ->
      """SELECT event_type,
        |CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |COUNT(json_extract_string(props, '$.k')) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_record_json" ->
      """SELECT to_json(struct_pack(event_id := event_id, event_type := event_type)) AS payload
        |FROM events WHERE event_id < 100 ORDER BY payload""".stripMargin,

    "q_doc_signals" ->
      """WITH t AS (SELECT doc_id, text,
        |list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks FROM documents),
        |g AS (SELECT doc_id, text, toks,
        |CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
        |i -> array_to_string(toks[i:i+1], ' ')) ELSE [] END AS grams FROM t)
        |SELECT doc_id,
        |round(CASE WHEN len(grams) > 0
        |THEN 1.0 - CAST(len(list_distinct(grams)) AS DOUBLE)/len(grams) ELSE 0.0 END, 6) AS rep_ratio,
        |round(CASE WHEN len(toks) > 0
        |THEN CAST(list_sum(list_transform(toks, x -> CAST(length(x) AS BIGINT))) AS DOUBLE)/len(toks)
        |ELSE 0.0 END, 6) AS mean_word_len,
        |round(CAST(len(regexp_extract_all(text, '[#@/\\{}\[\]<>|~^]')) AS DOUBLE) /
        |CAST(greatest(len(toks), 1) AS DOUBLE), 6) AS symbol_ratio
        |FROM g ORDER BY doc_id""".stripMargin,

    "q_redact" ->
      """WITH p AS (SELECT doc_id, CASE WHEN doc_id % 13 = 0
        |THEN text || ' contact me at user@example.com or 12345678901'
        |ELSE text END AS text FROM documents),
        |r AS (SELECT doc_id, regexp_replace(
        |regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |'\d{7,}', '<NUM>', 'g') AS clean FROM p)
        |SELECT doc_id, clean FROM r
        |WHERE clean LIKE '%<EMAIL>%' OR clean LIKE '%<NUM>%'
        |ORDER BY doc_id""".stripMargin,

    "q_chunks" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS toks FROM documents),
        |tf AS (SELECT * FROM t WHERE len(toks) > 0),
        |n AS (SELECT doc_id, toks,
        |greatest(CAST(ceil(CAST(len(toks) - 5 AS DOUBLE) / 15) AS INTEGER), 1) AS nc FROM tf),
        |idx AS (SELECT doc_id, toks, unnest(generate_series(0, nc - 1)) AS i FROM n)
        |SELECT doc_id, CAST(i AS INTEGER) AS chunk_index,
        |array_to_string(list_slice(toks, i*15 + 1, i*15 + 20), ' ') AS chunk_text,
        |CAST(len(list_slice(toks, i*15 + 1, i*15 + 20)) AS BIGINT) AS n_chunk_tokens
        |FROM idx ORDER BY doc_id, chunk_index""".stripMargin,

    "q_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (ascii(substr(md5(text), 1, 1)) * 29791 +
        |ascii(substr(md5(text), 2, 1)) * 961 +
        |ascii(substr(md5(text), 3, 1)) * 31 +
        |ascii(substr(md5(text), 4, 1))) % 100 <
        |CASE lang WHEN 'en' THEN 50 WHEN 'fr' THEN 30 WHEN 'de' THEN 20 ELSE 0 END
        |ORDER BY doc_id""".stripMargin,

    "q_mixture" ->
      """WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source)
        |SELECT d.doc_id, d.source FROM documents d JOIN c USING (source)
        |WHERE (CASE d.source WHEN 'src1' THEN 5 WHEN 'src3' THEN 3 WHEN 'src7' THEN 2 ELSE 0 END) > 0
        |AND (ascii(substr(md5(text), 1, 1)) * 29791 +
        |ascii(substr(md5(text), 2, 1)) * 961 +
        |ascii(substr(md5(text), 3, 1)) * 31 +
        |ascii(substr(md5(text), 4, 1))) % 10000 <
        |LEAST(10000, (10000 * 200 *
        |CASE d.source WHEN 'src1' THEN 5 WHEN 'src3' THEN 3 WHEN 'src7' THEN 2 ELSE 0 END)
        |// (10 * c.n))
        |ORDER BY d.doc_id""".stripMargin,

    "q_boilerplate" ->
      """WITH w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
        |THEN list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
        |ELSE [] END) AS gram FROM w),
        |df AS (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM g GROUP BY gram),
        |b AS (SELECT gram FROM df WHERE df >= 2)
        |SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS total_grams,
        |CAST(COUNT(b.gram) AS BIGINT) AS boiler_grams,
        |CAST((1000 * COUNT(b.gram)) // COUNT(*) AS BIGINT) AS boiler_permille
        |FROM g LEFT JOIN b USING (gram)
        |GROUP BY g.doc_id ORDER BY g.doc_id""".stripMargin,

    "q_quantize" ->
      """WITH v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |b AS (SELECT vec_id, v, list_min(v) AS lo, list_max(v) AS hi FROM v),
        |s AS (SELECT vec_id, v, lo, hi,
        |CASE WHEN hi > lo THEN (hi - lo) / 255.0 ELSE 1.0 END AS scale FROM b)
        |SELECT vec_id,
        |CAST(list_sum(list_transform(v, x -> CAST(round((x - lo) / scale) AS BIGINT))) AS BIGINT) AS code_sum,
        |round(lo, 6) AS vmin, round(hi, 6) AS vmax
        |FROM s ORDER BY vec_id""".stripMargin,

    "q_decontaminate" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM documents),
        |g AS (SELECT doc_id, CASE WHEN len(w) >= 8
        |THEN list_transform(range(1, len(w)-6), i -> array_to_string(w[i:i+7], ' '))
        |ELSE [] END AS grams FROM t),
        |gc AS (SELECT doc_id, grams FROM g WHERE doc_id >= 5
        |UNION ALL SELECT doc_id + 30000, grams FROM g WHERE doc_id < 5),
        |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id < 5),
        |corp AS (SELECT doc_id, unnest(grams) AS gram FROM gc),
        |bad AS (SELECT DISTINCT c.doc_id FROM corp c JOIN bench b ON c.gram = b.gram)
        |SELECT doc_id FROM gc WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |ORDER BY doc_id""".stripMargin,

    "q_corpus_prep" ->
      """WITH t AS (SELECT doc_id, text, lang,
        |list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |q AS (SELECT doc_id, text, lang,
        |(least(CAST(length(text) AS DOUBLE)/500.0, 1.0) +
        |(CASE WHEN length(text) > 0 THEN CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)/length(text) ELSE 0.0 END) +
        |least(CAST(len(list_filter(toks, x -> list_contains(
        |['the','a','of','and','is','le','la','les','et','des','der','die','und','das','ist','el','los','las','y','es'], x))) AS DOUBLE)
        |*10.0/CAST(greatest(len(toks),1) AS DOUBLE), 1.0)) / 3.0 AS quality,
        |len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS ntok
        |FROM t),
        |f AS (SELECT * FROM q WHERE lang IN ('en','fr') AND round(quality, 6) >= 0.5),
        |keep AS (SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM f GROUP BY md5(text)),
        |d AS (SELECT f.* FROM f JOIN keep ON f.doc_id = keep.doc_id)
        |SELECT lang, COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |CAST(floor(avg(length(text))) AS BIGINT) AS avg_chars
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    "q_alarm_batch" -> alarmBatchOracle,
    "q_alarm_stream_parity" -> alarmStreamParityOracle,
    "q_sla_snapshot" -> slaSnapshotOracle,
    "q_incidents" -> incidentsOracle,
    "q_dashboard" -> dashboardOracle,
    "q_dashboard_widgets" -> dashboardWidgetsOracle,
    "q_defs_metrics" -> defsMetricsOracle,
    "q_defs_slas" -> defsSlasOracle,

    "q_metrics_records" ->
      s"""WITH sm(event_type, series_id, statistic, period, frequency, namespace, name, metadata, dimensions) AS
         |(VALUES $seriesMapValuesFull),
         |dp AS (SELECT sm.*, CAST(floor(epoch(e.ts)/sm.period)*sm.period AS BIGINT) AS window_start, e.value
         |FROM events e JOIN sm USING(event_type)),
         |agg AS (SELECT series_id, statistic, period, frequency, namespace, name, metadata, dimensions, window_start,
         |CASE statistic
         |WHEN 'Sum' THEN CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)
         |WHEN 'Average' THEN CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)/COUNT(value)
         |WHEN 'Maximum' THEN MAX(value)
         |WHEN 'Minimum' THEN MIN(value)
         |WHEN 'SampleCount' THEN CAST(COUNT(value) AS DOUBLE) END AS metricvalue
         |FROM dp GROUP BY series_id, statistic, period, frequency, namespace, name, metadata, dimensions, window_start)
         |SELECT '1970-01-01T00:00:00' AS collectiontime, namespace, name,
         |CAST(period AS INTEGER) AS period, frequency, statistic, metadata, dimensions,
         |'${reg.DefaultAccount}' AS accountid,
         |strftime(make_timestamp(window_start*1000000), '%Y-%m-%dT%H:%M:%S') AS metrictimestamp,
         |CAST(metricvalue AS REAL) AS metricvalue, series_id AS id, name AS label,
         |'${reg.DefaultRegion}' AS region,
         |CAST(year(make_timestamp(window_start*1000000)) AS SMALLINT) AS year,
         |CAST(month(make_timestamp(window_start*1000000)) AS SMALLINT) AS month,
         |CAST(day(make_timestamp(window_start*1000000)) AS SMALLINT) AS day,
         |CAST(hour(make_timestamp(window_start*1000000)) AS SMALLINT) AS hour
         |FROM agg ORDER BY id, window_start""".stripMargin,

    "q_partition_parse" ->
      """WITH k AS (SELECT 'metrics/' || event_type || '/r' || CAST(user_id % 3 AS VARCHAR)
        || '/' || strftime(ts, '%Y/%m/%d/%H') || '/part-000.parquet' AS key FROM events),
        p AS (SELECT string_split(key, '/') AS t FROM k)
        SELECT DISTINCT t[1] || '_' || t[2] AS table_name, t[3] AS region,
        CAST(t[4] AS SMALLINT) AS year, CAST(t[5] AS SMALLINT) AS month,
        CAST(t[6] AS SMALLINT) AS day, CAST(t[7] AS SMALLINT) AS hour
        FROM p ORDER BY table_name, region, year, month, day, hour""",

    "q_retention" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS year,
        CAST(month(o_orderdate) AS INTEGER) AS month,
        CAST(day(o_orderdate) AS INTEGER) AS day, COUNT(*) AS n_rows
        FROM orders
        WHERE CAST(o_orderdate AS DATE) >=
          (SELECT CAST(max(o_orderdate) AS DATE) FROM orders) - INTERVAL 90 DAY
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "q_stat_p50" ->
      """SELECT event_type AS series_id,
        CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS window_start,
        quantile_cont(value, 0.5) AS p50
        FROM events GROUP BY 1, 2 ORDER BY series_id, window_start""",

    "q_dedup_clusters" ->
      s"""WITH RECURSIVE $nearDupCorpusSql,
         |w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w FROM all_docs),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
         |THEN list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
         |ELSE [] END) AS shingles FROM w),
         |shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
         |sig AS (SELECT doc_id, shingles, list_transform(range(0, 12),
         |i -> list_min(list_transform(shingles, s -> md5(CAST(i AS VARCHAR) || ':' || s)))) AS sig FROM shf),
         |band AS (SELECT doc_id, t.b AS band, md5(array_to_string(sig[t.b*3+1:t.b*3+3], '|')) AS band_key
         |FROM sig, range(0, 4) t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM band a
         |JOIN band b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |j AS (SELECT id_a, id_b,
         |CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
         |len(list_distinct(list_concat(x.shingles, y.shingles))) AS jaccard
         |FROM cand JOIN shf x ON x.doc_id = id_a JOIN shf y ON y.doc_id = id_b),
         |pairs AS (SELECT id_a, id_b FROM j WHERE jaccard >= 0.5),
         |edges AS (SELECT id_a, id_b FROM pairs UNION SELECT id_b, id_a FROM pairs),
         |reach(src, dst) AS (SELECT id_a, id_b FROM edges
         |UNION SELECT r.src, e.id_b FROM reach r JOIN edges e ON r.dst = e.id_a)
         |SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin,

    "q_dedup_minhash" ->
      s"""WITH $nearDupCorpusSql,
         |w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w FROM all_docs),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
         |THEN list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
         |ELSE [] END) AS shingles FROM w),
         |shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
         |sig AS (SELECT doc_id, shingles, list_transform(range(0, 12),
         |i -> list_min(list_transform(shingles, s -> md5(CAST(i AS VARCHAR) || ':' || s)))) AS sig FROM shf),
         |band AS (SELECT doc_id, t.b AS band, md5(array_to_string(sig[t.b*3+1:t.b*3+3], '|')) AS band_key
         |FROM sig, range(0, 4) t(b)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM band a
         |JOIN band b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
         |j AS (SELECT id_a, id_b,
         |CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
         |len(list_distinct(list_concat(x.shingles, y.shingles))) AS jaccard
         |FROM cand JOIN shf x ON x.doc_id = id_a JOIN shf y ON y.doc_id = id_b)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
         |ORDER BY id_a, id_b""".stripMargin,

    // Ground-truth injected exact-duplicate pairs; the fast xxhash64
    // path's guaranteed recovery and its exact-Jaccard verify value
    // (identical shingle sets → exactly 1.0) are pinned.
    "q_dedup_minhash_fast" ->
      """SELECT doc_id AS id_a, doc_id + 40000 AS id_b,
        |true AS found_by_fast, CAST(1.0 AS DOUBLE) AS jaccard
        |FROM documents
        |WHERE doc_id % 7 = 0
        |AND len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) >= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // Ground-truth injected exact-duplicate pairs; the simhash path's
    // guaranteed recovery of hamming-0 pairs and the native
    // expression's composed-form identity are pinned by the
    // literal-true columns.
    "q_dedup_simhash" ->
      """SELECT doc_id AS id_a, doc_id + 40000 AS id_b,
        |true AS found_by_simhash, true AS native_matches_composed
        |FROM documents
        |WHERE doc_id % 7 = 0
        |AND len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) > 0
        |ORDER BY id_a, id_b""".stripMargin,

    "q_ngram_jaccard" ->
      s"""WITH $nearDupCorpusSql,
         |w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w FROM all_docs),
         |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 4
         |THEN list_transform(range(1, len(w)-2), i -> array_to_string(w[i:i+3], ' '))
         |ELSE [] END) AS shingles FROM w),
         |shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
         |p AS (SELECT doc_id, unnest(shingles) AS shingle FROM shf),
         |rare AS (SELECT shingle FROM p GROUP BY shingle HAVING COUNT(*) BETWEEN 2 AND 50),
         |bl AS (SELECT p.doc_id, p.shingle FROM p JOIN rare USING (shingle)),
         |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b FROM bl a
         |JOIN bl b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 2),
         |j AS (SELECT id_a, id_b,
         |CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
         |len(list_distinct(list_concat(x.shingles, y.shingles))) AS jaccard
         |FROM cand JOIN shf x ON x.doc_id = id_a JOIN shf y ON y.doc_id = id_b)
         |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.4
         |ORDER BY id_a, id_b""".stripMargin,

    "q_ann_topk" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 10),
        s AS (SELECT qid, vec_id AS nid,
        list_cosine_similarity(qe, embedding) AS sim FROM q, embeddings WHERE vec_id <> qid),
        r AS (SELECT qid AS query_id, nid AS neighbor_id,
        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, nid) AS rank FROM s)
        SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank FROM r WHERE rank <= 5
        ORDER BY query_id, rank""",

    "q_media_features" ->
      """SELECT doc_id AS media_id,
        CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
        CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 64 + 1 AS INTEGER) END AS width_px,
        CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 48 + 1 AS INTEGER) END AS height_px,
        CASE WHEN doc_id % 3 = 0 THEN CAST((doc_id % 256) // 16 AS INTEGER) END AS dominant_bin,
        CASE WHEN doc_id % 3 = 0 THEN CAST(1.0 AS DOUBLE) END AS dominant_frac,
        CASE WHEN doc_id % 3 = 1 THEN CAST(16000 AS INTEGER) END AS sample_rate_hz,
        CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 100 + 10 AS BIGINT) END AS n_samples,
        CASE WHEN doc_id % 3 = 1 THEN CAST(doc_id % 1000 AS INTEGER) END AS peak,
        CASE WHEN doc_id % 3 = 2 THEN CAST((doc_id % 30 + 2) // 2 AS INTEGER) END AS frames_sampled
        FROM documents ORDER BY media_id""".stripMargin,

    "q_asof" ->
      """WITH q AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts,
        |max(value) AS v FROM events GROUP BY 1, 2),
        |p AS (SELECT event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts
        |FROM events WHERE event_id % 97 = 0)
        |SELECT p.event_id, p.event_type, p.ts AS ts_epoch,
        |(SELECT q.v FROM q WHERE q.event_type = p.event_type AND q.ts <= p.ts
        | ORDER BY q.ts DESC LIMIT 1) AS asof_value
        |FROM p ORDER BY event_id""".stripMargin,

    "q_sessions" ->
      """WITH e AS (SELECT user_id, event_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
        |l AS (SELECT user_id, event_id, ts,
        |lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM e),
        |f AS (SELECT user_id, event_id, ts,
        |CASE WHEN prev IS NULL OR ts - prev > 1800 THEN 1 ELSE 0 END AS is_new FROM l),
        |s AS (SELECT user_id, ts, CAST(SUM(is_new) OVER (PARTITION BY user_id
        |ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_index FROM f)
        |SELECT user_id, session_index, MIN(ts) AS start_epoch, MAX(ts) AS end_epoch,
        |COUNT(*) AS n_events, MAX(ts) - MIN(ts) AS duration_sec
        |FROM s GROUP BY 1, 2 ORDER BY user_id, session_index""".stripMargin,

    "q_range_join" ->
      """WITH p AS (SELECT event_id AS point_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS pts FROM events),
        |iv AS (SELECT event_id AS interval_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS s,
        |CAST(floor(epoch(ts)) AS BIGINT) + (event_id % 7 + 1) * 600 AS e
        |FROM events WHERE event_id % 53 = 0)
        |SELECT iv.interval_id, COUNT(*) AS n_points
        |FROM iv JOIN p ON p.pts BETWEEN iv.s AND iv.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tfidf" ->
      """WITH dd AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
        |t AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(text, '\s+'),
        |x -> x <> '')) AS term FROM dd),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT doc_id, term, tf, df, (tf * 1000000) // df AS score
        |FROM tf JOIN df USING (term)),
        |r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
        |ORDER BY score DESC, term) AS rank FROM sc)
        |SELECT doc_id, term, tf, df, score, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,

    "q_approx_distinct" ->
      """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
        |true AS hll_within_5pct
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_sketch_quantile" ->
      """SELECT event_type,
        |quantile_cont(value, 0.50) AS p50_exact,
        |quantile_cont(value, 0.95) AS p95_exact,
        |true AS p50_in_band, true AS p95_in_band
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "q_packs" ->
      """WITH t AS (SELECT doc_id,
        |CAST(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        |FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) - n_tokens AS before
        |FROM t)
        |SELECT doc_id, n_tokens, CAST(before // 2048 AS BIGINT) AS pack_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "q_dedup_incr" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents UNION ALL
        |SELECT doc_id + 20000, text || ' extra near dup tail' FROM documents WHERE doc_id % 5 = 1),
        |w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS w FROM all_docs),
        |sh AS (SELECT doc_id, list_distinct(CASE WHEN len(w) >= 3
        |THEN list_transform(range(1, len(w)-1), i -> array_to_string(w[i:i+2], ' '))
        |ELSE [] END) AS shingles FROM w),
        |shf AS (SELECT * FROM sh WHERE len(shingles) > 0),
        |sig AS (SELECT doc_id, shingles, list_transform(range(0, 12),
        |i -> list_min(list_transform(shingles, s -> md5(CAST(i AS VARCHAR) || ':' || s)))) AS sig FROM shf),
        |band AS (SELECT doc_id, t.b AS band, md5(array_to_string(sig[t.b*3+1:t.b*3+3], '|')) AS band_key
        |FROM sig, range(0, 4) t(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b FROM band a
        |JOIN band b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
        |WHERE NOT (a.doc_id < 20000 AND a.doc_id % 5 <> 0
        |       AND b.doc_id < 20000 AND b.doc_id % 5 <> 0)),
        |j AS (SELECT id_a, id_b,
        |CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
        |len(list_distinct(list_concat(x.shingles, y.shingles))) AS jaccard
        |FROM cand JOIN shf x ON x.doc_id = id_a JOIN shf y ON y.doc_id = id_b)
        |SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.5
        |ORDER BY id_a, id_b""".stripMargin,

    "q_anomaly" ->
      """WITH e AS (SELECT event_id, event_type,
        |CAST(floor(value * 100) AS BIGINT) AS x,
        |CAST(floor(epoch(ts)) AS BIGINT) AS ts FROM events),
        |w AS (SELECT event_id, event_type, x,
        |COUNT(*) OVER win AS n_hist,
        |SUM(x) OVER win AS s, SUM(x*x) OVER win AS sq
        |FROM e WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
        |ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING))
        |SELECT event_id, event_type, n_hist FROM w
        |WHERE n_hist >= 10
        |AND (n_hist*x - s)*(n_hist*x - s) > 9*(n_hist*sq - s*s)
        |ORDER BY event_id""".stripMargin,

    "q_partition_gaps" ->
      """WITH pres AS (SELECT DISTINCT event_type AS series,
        |CAST(floor(epoch(ts)/3600)*3600 AS BIGINT) AS h FROM events),
        |sp AS (SELECT series, MIN(h) AS h0, MAX(h) AS h1 FROM pres GROUP BY 1),
        |allh AS (SELECT series, unnest(generate_series(h0, h1, 3600)) AS h FROM sp)
        |SELECT series, h AS missing_hour_epoch FROM allh
        |WHERE NOT EXISTS (SELECT 1 FROM pres p
        |WHERE p.series = allh.series AND p.h = allh.h)
        |ORDER BY series, missing_hour_epoch""".stripMargin,

    "q_zorder" -> {
      val terms = (0 until 10).map { i =>
        s"(((user_id % 1024) >> $i) & 1) * ${1L << (2 * i)} + " +
          s"(((event_id % 1024) >> $i) & 1) * ${1L << (2 * i + 1)}"
      }.mkString(" + ")
      s"""SELECT event_id, $terms AS z
         |FROM events WHERE event_id % 101 = 0 ORDER BY event_id""".stripMargin
    },

    "q_rollup_incr" ->
      """SELECT event_type AS series,
        |CAST(floor(epoch(ts)/86400)*86400 AS BIGINT) AS day,
        |CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE)/COUNT(value) AS avg_value,
        |CAST(SUM(CAST(value AS DECIMAL(28,8))) AS DOUBLE) AS sum_value,
        |MIN(value) AS min_value, MAX(value) AS max_value,
        |COUNT(*) AS n_points
        |FROM events GROUP BY 1, 2 ORDER BY series, day""".stripMargin,

    "q_rate" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events WHERE event_id % 11 = 0),
        |l AS (SELECT event_id, event_type, value, t,
        |lag(value) OVER w AS pv, lag(t) OVER w AS pt FROM e
        |WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id))
        |SELECT event_id, event_type, (value - pv) / (t - pt) AS rate_per_sec
        |FROM l WHERE pt IS NOT NULL AND t - pt > 0
        |ORDER BY event_id""".stripMargin,

    "q_twa" ->
      """WITH e AS (SELECT event_type, event_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS t,
        |CAST(floor(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT event_type, event_id, t, cents,
        |CAST(floor(t/86400)*86400 AS BIGINT) AS day FROM e),
        |l AS (SELECT event_type, day, cents,
        |lead(t) OVER w AS nt, lead(day) OVER w AS nday, t FROM d
        |WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id)),
        |g AS (SELECT event_type AS series, day, cents,
        |CASE WHEN nday = day THEN nt - t ELSE 0 END AS wt FROM l)
        |SELECT series, day, CAST(SUM(cents * wt) AS BIGINT) AS twa_num,
        |CAST(SUM(wt) AS BIGINT) AS twa_den,
        |CAST(CAST(SUM(cents * wt) AS BIGINT) // CAST(SUM(wt) AS BIGINT) AS BIGINT) AS twa_cents
        |FROM g GROUP BY 1, 2 HAVING SUM(wt) > 0
        |ORDER BY series, day""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |COUNT(*) FILTER (event_type = 'click') AS click,
        |COUNT(*) FILTER (event_type = 'error') AS error,
        |COUNT(*) FILTER (event_type = 'purchase') AS purchase,
        |COUNT(*) FILTER (event_type = 'signup') AS signup,
        |COUNT(*) FILTER (event_type = 'view') AS view
        |FROM events WHERE user_id % 17 = 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_upsert" ->
      """WITH e AS (SELECT user_id, event_type, event_id, value,
        |CAST(floor(epoch(ts)) AS BIGINT) AS t FROM events),
        |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
        |ORDER BY t DESC, event_id DESC) AS rn FROM e)
        |SELECT user_id, event_type, t AS last_epoch,
        |event_id AS last_event_id, value AS last_value
        |FROM r WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin,

    "q_scd2" ->
      """WITH e AS (SELECT user_id, event_id,
        |CAST(floor(epoch(ts)) AS BIGINT) AS valid_from
        |FROM events WHERE user_id % 29 = 0)
        |SELECT user_id, event_id, valid_from,
        |lead(valid_from) OVER (PARTITION BY user_id
        |ORDER BY valid_from, event_id) AS valid_to
        |FROM e ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_ann_ivf" ->
      """WITH cent AS (SELECT label, pos,
        |CAST(SUM(CAST(v AS DECIMAL(28,8))) AS DOUBLE)/COUNT(*) AS c
        |FROM (SELECT label, unnest(embedding) AS v,
        |generate_subscripts(embedding, 1) AS pos FROM embeddings)
        |GROUP BY 1, 2),
        |cvec AS (SELECT label AS cell, array_agg(c ORDER BY pos) AS centroid
        |FROM cent GROUP BY 1),
        |cs AS (SELECT e.vec_id, e.embedding, cv.cell,
        |list_dot_product(e.embedding::DOUBLE[], cv.centroid) /
        |(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
        | sqrt(list_dot_product(cv.centroid, cv.centroid))) AS sim
        |FROM embeddings e, cvec cv),
        |corp AS (SELECT vec_id AS neighbor_id, embedding AS v_c, cell FROM
        |(SELECT *, row_number() OVER (PARTITION BY vec_id
        |ORDER BY sim DESC, cell) AS r FROM cs) WHERE r = 1),
        |qc AS (SELECT vec_id AS query_id, embedding AS v_q, cell FROM
        |(SELECT *, row_number() OVER (PARTITION BY vec_id
        |ORDER BY sim DESC, cell) AS r FROM cs WHERE vec_id < 10) WHERE r <= 3),
        |cand AS (SELECT query_id, neighbor_id,
        |list_dot_product(v_q::DOUBLE[], v_c::DOUBLE[]) /
        |(sqrt(list_dot_product(v_q::DOUBLE[], v_q::DOUBLE[])) *
        | sqrt(list_dot_product(v_c::DOUBLE[], v_c::DOUBLE[]))) AS cosine
        |FROM corp JOIN qc USING (cell) WHERE query_id <> neighbor_id),
        |r AS (SELECT query_id, neighbor_id, row_number() OVER
        |(PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank FROM cand)
        |SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "q_normalize" ->
      """WITH all_docs AS (SELECT doc_id, text FROM documents UNION ALL
        |SELECT doc_id + 40000, upper(text) || '  !!' FROM documents WHERE doc_id % 13 = 0),
        |k AS (SELECT doc_id, md5(trim(regexp_replace(
        |translate(lower(text), 'áàâäãåéèêëíìîïóòôöõúùûüçñý', 'aaaaaaeeeeiiiiooooouuuucny'),
        |'[^a-z0-9]+', ' ', 'g'))) AS norm_key FROM all_docs)
        |SELECT norm_key, COUNT(*) AS n_docs, MIN(doc_id) AS keep_id
        |FROM k GROUP BY 1 HAVING COUNT(*) > 1
        |ORDER BY keep_id""".stripMargin,

    "q_topk_agg" ->
      """WITH c AS (SELECT event_type, user_id,
        |CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events GROUP BY 1, 2),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |ORDER BY cents DESC, user_id) AS rank FROM c)
        |SELECT event_type, user_id, cents, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 3 ORDER BY event_type, rank""".stripMargin
  )
}
