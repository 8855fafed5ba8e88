package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.catalog.Tables
import graft.functions.VectorFns
import graft.model.MetricLike
import graft.registry.{DefinitionExport, DefinitionRegistry}

/** Shared fixture builders and oracle SQL fragments for the
  * per-domain query entry objects ([[MetricsEntries]],
  * [[DedupEntries]], …) aggregated by [[graft.SparkEntry]]. */
private[graft] object Fixtures {

  val reg = DefinitionRegistry
  def ev(s: SparkSession, dir: String): DataFrame = Tables.read(s, dir, "events")
  def docs(s: SparkSession, dir: String): DataFrame = Tables.read(s, dir, "documents")

  /** Ops series: (event_type dimension value → metric) fan-out table.
    * One event can feed several series (e.g. purchase hour + minute). */
  val opsSeries: Seq[(String, MetricLike)] =
    reg.opsMetricSet.metrics.map { m =>
      val et = m.dimensions.find(_.name == "EventType").get.value
      et -> m
    }

  /** Broadcastable (event_type, series_id) mapping df. */
  def seriesMap(s: SparkSession): DataFrame = {
    import s.implicits._
    opsSeries.map { case (et, m) => (et, m.uniqueId) }
      .toDF("event_type", "series_id")
  }

  /** events → raw datapoints stream (O-2 stand-in): join to the tiny
    * series map (broadcast) fans each event into its series. */
  def datapoints(s: SparkSession, dir: String): DataFrame =
    ev(s, dir).join(broadcast(seriesMap(s)), Seq("event_type"))
      .select(col("series_id"), col("ts"), col("value"))

  /** SQL VALUES clause for the series map, shared by oracles. */
  def seriesMapValues: String =
    opsSeries.map { case (et, m) =>
      s"('$et', '${m.uniqueId}', '${m.statistic}', ${m.period}, '${m.frequency.name}')"
    }.mkString(", ")

  def seriesKeysDf(s: SparkSession): DataFrame =
    DefinitionExport.seriesKeys(s, reg.allAccounts)

  /** The local test parquet files are single-row-group (unsplittable),
    * so a scan is one task no matter how hot the downstream compute
    * is. Hash/signature-heavy corpora are repartitioned across the
    * session's cores right after the scan — on a real cluster the
    * multi-row-group scan parallelizes by itself and this spread is a
    * cheap narrow-input shuffle relative to the signature work. */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.sparkContext.defaultParallelism)

  def sq(s: String): String = s.replace("'", "''")

  /** Exact ordered-fold dot product in DuckDB SQL — bit-identical to
    * [[graft.plans.VecDot]] (both accumulate double products left to
    * right, and decimal literals parse to the same doubles). */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1,65), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"

  def cosineSql(a: String, b: String): String =
    s"(CASE WHEN sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)}) > 0 THEN " +
      s"${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})) END)"

  /** DuckDB replication of [[VectorFns.srpSignature]]: the hyperplanes
    * are deterministic plan literals, so the oracle inlines the same
    * values and reproduces every sign bit-exactly (verified 500/500 at
    * sf0.01). */
  /** DuckDB replication of [[graft.plans.VecProject]]: per output
    * component, the ±1 sign row is inlined as a BIGINT[] literal from
    * the SAME generator the engine uses, and each input component is
    * floored to fixed-point BEFORE the sum — all-integer arithmetic,
    * so fold order can't drift the hash. */
  def projSql(vecExpr: String, k: Int, dim: Int, seed: Long,
      scale: Long): String = {
    val signs = graft.plans.VecProject.signs(k, dim, seed)
    (0 until k).map { j =>
      val lits = (0 until dim).map(i => signs(j * dim + i)).mkString("[", ",", "]")
      s"CAST(list_sum(list_transform(range(1,${dim + 1}), i -> " +
        s"CAST(floor(coalesce(CAST($vecExpr[i] AS DOUBLE), 0.0) * $scale.0) " +
        s"AS BIGINT) * ($lits::BIGINT[])[i])) AS BIGINT)"
    }.mkString("[", ", ", "]")
  }

  def srpSigSql(vecExpr: String, bits: Int): String =
    VectorFns.srpPlanes(bits, 64, 42L).map { plane =>
      val lits = plane.mkString("[", ",", "]")
      s"(CASE WHEN list_sum(list_transform(range(1,65), i -> " +
        s"coalesce(CAST($vecExpr[i] AS DOUBLE) * ($lits::DOUBLE[])[i], 0.0))) >= 0 " +
        "THEN '1' ELSE '0' END)"
    }.mkString("(", " || ", ")")

  /** DuckDB replication of [[graft.pipeline.Corpus.hashBucket]] /
    * hashBucket10k: the md5-hex ascii fold mod `mod`, over an already
    * SQL-quoted expression (callers pass the operator salt inline,
    * e.g. `"'cap:' || text"`). One definition keeps the four sampler
    * oracles in lockstep with the Scala fold — the round-8 salt change
    * had to edit four hand-inlined copies. */
  def bucketSql(expr: String, mod: Int): String =
    s"(${foldSql(expr)}) % $mod"

  /** The un-modded fold (see [[graft.pipeline.Corpus.hashFold]]) —
    * for oracles whose modulus is a SQL expression, not a literal. */
  def foldSql(expr: String): String =
    s"(ascii(substr(md5($expr), 1, 1)) * 29791 + " +
      s"ascii(substr(md5($expr), 2, 1)) * 961 + " +
      s"ascii(substr(md5($expr), 3, 1)) * 31 + " +
      s"ascii(substr(md5($expr), 4, 1)))"
}
