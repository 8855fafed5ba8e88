package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.Schemas
import graft.model._

/**
 * Loads definitions back from the metric_defs / sla_defs JSON tables —
 * the inverse of [[DefinitionExport]] and the replacement for the
 * reference's runtime Python-module loading (definitions/
 * definition.py:46-71): the JSON tables are the dynamic interchange
 * format, the compiled registry is the typed source of truth, and
 * this loader lets a deployment ship definition changes as data
 * (SURVEY.md §7 "What's hard" #3).
 */
object DefinitionLoader {

  private def parseMap(json: String): Seq[(String, String)] =
    if (json == null) Nil
    else {
      // flat {"k": "v"} objects only — exactly what the export writes
      val inner = json.trim.stripPrefix("{").stripSuffix("}").trim
      if (inner.isEmpty) Nil
      else inner.split(",(?=\\s*\")").toSeq.map { kv =>
        val Array(k, v) = kv.split(":", 2)
        def unq(s: String) = s.trim.stripPrefix("\"").stripSuffix("\"")
        unq(k) -> unq(v)
      }
    }

  private def parseTableRef(json: String): TableRef = {
    val m = parseMap(json).toMap
    TableRef(m.getOrElse("database", ""), m.getOrElse("table", ""),
      m.getOrElse("alias", ""), m.getOrElse("catalog", ""))
  }

  /** Read metric_defs JSON (written by DefinitionExport.dump) into
    * model metric sets, grouped per account. */
  def loadMetricSets(spark: SparkSession, path: String): Seq[(String, MetricSet)] = {
    val rows = spark.read.schema(Schemas.metricDefs).json(path).collect()
    rows.groupBy(r => (r.getAs[String]("account"), r.getAs[String]("metric_set")))
      .toSeq.sortBy(_._1)
      .map { case ((account, setName), rs) =>
        val metrics: Seq[MetricLike] = rs.toSeq.map { r =>
          val metadata = parseMap(r.getAs[String]("metadata"))
            .map { case (k, v) => Metadata(k, v) }
          val dimensions = parseMap(r.getAs[String]("dimensions"))
            .map { case (k, v) => Dimension(k, v) }
          val base = (r.getAs[String]("namespace"), r.getAs[String]("name"),
            Frequency.fromName(r.getAs[String]("frequency")),
            r.getAs[String]("statistic"), Widget(r.getAs[String]("dashboard")))
          val query = r.getAs[String]("query")
          if (query != null) {
            BusinessMetric(query, parseTableRef(r.getAs[String]("dataset")),
              referenceDatasets = Nil, // list form re-derivable if needed
              base._1, base._2, base._3, base._4, base._5, metadata, dimensions)
          } else Metric(base._1, base._2, base._3, base._4, base._5,
            metadata, dimensions)
        }
        account -> MetricSet(setName, metrics)
      }
  }
}
