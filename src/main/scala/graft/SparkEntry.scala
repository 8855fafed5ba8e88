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

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
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

  def oracleSql: Map[String, String] = Map(
    "bm_published" -> bmPublishedOracle,

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
  )
}
