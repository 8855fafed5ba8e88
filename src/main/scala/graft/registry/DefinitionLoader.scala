package graft.registry

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}
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
 *
 * Nested JSON-string columns (metadata/dimensions/dataset) are parsed
 * with Spark's from_json — full JSON escaping semantics, not string
 * surgery — so values containing quotes, commas, or escapes round-trip
 * exactly.
 */
object DefinitionLoader {

  private val mapType = MapType(StringType, StringType)

  private def rowMap(r: Row, field: String): Seq[(String, String)] =
    Option(r.getAs[scala.collection.Map[String, String]](field))
      .map(_.toSeq).getOrElse(Nil)

  /** Read metric_defs JSON (written by DefinitionExport.dump) into
    * model metric sets, grouped per account. */
  def loadMetricSets(spark: SparkSession, path: String): Seq[(String, MetricSet)] = {
    val parsed = spark.read.schema(Schemas.metricDefs).json(path)
      .withColumn("metadata_m", from_json(col("metadata"), mapType))
      .withColumn("dimensions_m", from_json(col("dimensions"), mapType))
      .withColumn("dataset_m", from_json(col("dataset"), mapType))
    val rows = parsed.collect()
    rows.groupBy(r => (r.getAs[String]("account"), r.getAs[String]("metric_set")))
      .toSeq.sortBy(_._1)
      .map { case ((account, setName), rs) =>
        val metrics: Seq[MetricLike] = rs.toSeq.map { r =>
          val metadata = rowMap(r, "metadata_m").map { case (k, v) => Metadata(k, v) }
          val dimensions = rowMap(r, "dimensions_m").map { case (k, v) => Dimension(k, v) }
          val base = (r.getAs[String]("namespace"), r.getAs[String]("name"),
            Frequency.fromName(r.getAs[String]("frequency")),
            r.getAs[String]("statistic"), Widget(r.getAs[String]("dashboard")))
          val query = r.getAs[String]("query")
          if (query != null) {
            val ds = rowMap(r, "dataset_m").toMap
            BusinessMetric(query,
              TableRef(ds.getOrElse("database", ""), ds.getOrElse("table", ""),
                ds.getOrElse("alias", ""), ds.getOrElse("catalog", "")),
              referenceDatasets = Nil, // list form re-derivable if needed
              base._1, base._2, base._3, base._4, base._5, metadata, dimensions)
          } else Metric(base._1, base._2, base._3, base._4, base._5,
            metadata, dimensions)
        }
        account -> MetricSet(setName, metrics)
      }
  }
}
