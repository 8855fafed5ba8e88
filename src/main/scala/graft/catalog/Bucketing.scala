package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed-table utilities: pre-shuffle fact tables by join key at
 * write time so repeated joins/aggregations on that key run with NO
 * exchange — at 100 TB the shuffle is the dominant cost of a fact⋈fact
 * join, and bucketing amortizes it across every downstream query.
 *
 * This is the engine-side replacement for the reference's fixed
 * Hive-partition layout: partitioning prunes by time/region, bucketing
 * co-locates by key.
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted session-catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — plans with
    * zero Exchange when bucket counts match. */
  def coLocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))
}
