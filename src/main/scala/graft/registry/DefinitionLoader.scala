package graft.registry

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, MapType, StringType}
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
 * Round-trip completeness: periodOverride (exported as `period`),
 * BusinessMetric.referenceDatasets, and DataSetMetric (dataset
 * without query) all restore — a loaded multi-table metric registers
 * every table its query touches. Dimension/metadata ORDER is restored
 * from the JSON text itself: uniqueId/alarmUniqueId concatenate
 * dimensions in definition order, and from_json's Scala Map drops
 * insertion order above 4 entries — so those two columns go through
 * [[orderedPairs]], an order-preserving parser for exactly the flat
 * string objects [[DefinitionExport.jsonObject]] emits. Array-valued
 * columns stay on from_json (JSON array order is preserved; the
 * objects inside are keyed, so map order is irrelevant there).
 */
object DefinitionLoader {

  private val mapType = MapType(StringType, StringType)

  /** Order-preserving inverse of [[DefinitionExport.jsonObject]]:
    * extracts ("k" : "v") pairs in text order and unescapes the
    * \" \\ \n \r \t \uXXXX forms `quote` produces. */
  private[registry] def orderedPairs(json: String): Seq[(String, String)] = {
    if (json == null) return Nil
    val pair = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    def unescape(s: String): String = {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < s.length) {
          s.charAt(i + 1) match {
            case '"' => sb += '"'; i += 2
            case '\\' => sb += '\\'; i += 2
            case 'n' => sb += '\n'; i += 2
            case 'r' => sb += '\r'; i += 2
            case 't' => sb += '\t'; i += 2
            case 'u' if i + 5 < s.length =>
              sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar
              i += 6
            case other => sb += other; i += 2
          }
        } else { sb += c; i += 1 }
      }
      sb.toString
    }
    pair.findAllMatchIn(json)
      .map(m => unescape(m.group(1)) -> unescape(m.group(2))).toSeq
  }

  private def tableRef(m: scala.collection.Map[String, String]): TableRef =
    TableRef(m.getOrElse("database", ""), m.getOrElse("table", ""),
      m.getOrElse("alias", ""), m.getOrElse("catalog", ""))

  /** Read metric_defs JSON (written by DefinitionExport.dump) into
    * model metric sets, grouped per account. */
  def loadMetricSets(spark: SparkSession, path: String): Seq[(String, MetricSet)] = {
    val parsed = spark.read.schema(Schemas.metricDefs).json(path)
      .withColumn("dataset_m", from_json(col("dataset"), mapType))
      .withColumn("ref_datasets_m",
        from_json(col("reference_datasets"), ArrayType(mapType)))
    val rows = parsed.collect()
    rows.groupBy(r => (r.getAs[String]("account"), r.getAs[String]("metric_set")))
      .toSeq.sortBy(_._1)
      .map { case ((account, setName), rs) =>
        val metrics: Seq[MetricLike] = rs.toSeq.map { r =>
          val metadata = orderedPairs(r.getAs[String]("metadata"))
            .map { case (k, v) => Metadata(k, v) }
          val dimensions = orderedPairs(r.getAs[String]("dimensions"))
            .map { case (k, v) => Dimension(k, v) }
          val frequency = Frequency.fromName(r.getAs[String]("frequency"))
          // the export writes the EFFECTIVE period; a value differing
          // from the frequency default restores as an override.
          // NORMALIZATION (intentional, lossy at object level): an
          // explicit periodOverride equal to the frequency's default
          // round-trips to None — semantically identical (the
          // effective period is unchanged) but not object-equal, so
          // full-equality consumers only hold for overrides that
          // differ from the default. The export format carries the
          // effective period, not the override provenance, exactly
          // like the reference's period derivation
          // (/root/reference/dataquality/metric.py:92-101) which
          // computes period FROM frequency and never records whether
          // a caller supplied it explicitly.
          val period = r.getAs[Int]("period")
          val periodOverride =
            if (period != frequency.periodSeconds) Some(period) else None
          val namespace = r.getAs[String]("namespace")
          val name = r.getAs[String]("name")
          val statistic = r.getAs[String]("statistic")
          val widget = Widget(r.getAs[String]("dashboard"))
          val query = r.getAs[String]("query")
          val dsMap = Option(r.getAs[scala.collection.Map[String, String]]("dataset_m"))
          if (query != null) {
            val refs = Option(r.getAs[scala.collection.Seq[
                scala.collection.Map[String, String]]]("ref_datasets_m"))
              .map(_.toSeq.map(tableRef)).getOrElse(Nil)
            BusinessMetric(query, dsMap.map(tableRef).getOrElse(TableRef("", "", "", "")),
              referenceDatasets = refs,
              namespace, name, frequency, statistic, widget, metadata,
              dimensions, periodOverride)
          } else dsMap match {
            // dataset without a query = DataSetMetric — collapsing it
            // to a plain Metric would lose its table pointer
            case Some(ds) => DataSetMetric(tableRef(ds), namespace, name,
              frequency, statistic, widget, metadata, dimensions,
              periodOverride)
            case None => Metric(namespace, name, frequency, statistic,
              widget, metadata, dimensions, periodOverride)
          }
        }
        account -> MetricSet(setName, metrics)
      }
  }
}
