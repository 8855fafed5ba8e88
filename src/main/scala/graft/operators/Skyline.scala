package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * 2-D Pareto skyline (Börzsönyi et al. 2001): the rows not dominated
 * by any other — `a` dominates `b` iff `a.x ≤ b.x ∧ a.y ≤ b.y` with
 * at least one strict. The standard multi-objective shortlist
 * (cheapest-for-its-size parts, best-quality-per-token documents);
 * both axes minimize, so negate a column to maximize it.
 *
 * The naive formulation is an O(n²) self-join — a non-starter at any
 * scale (PlanSweepSpec would reject the cartesian). In 2-D the
 * skyline has a sorted structure instead: a row is dominated iff
 *   (min y over STRICTLY smaller x) ≤ y   — strict-x dominator, or
 *   (min y over EQUAL x) < y              — same-x dominator,
 * so two prefix-minimum passes decide every row. Neither pass is a
 * global sort:
 *
 *  - the strict-x prefix splits into VALUE buckets (`x div
 *    bucketWidth`): a per-bucket min-y aggregate (map-side
 *    combinable), an unpartitioned prefix window over the BUCKET
 *    table — bounded by the value range, hundreds of rows, the
 *    packing-offsets trade — and a per-bucket RANGE window for the
 *    within-bucket strict prefix;
 *  - the same-x minimum is a plain `min over (partition by x)`.
 *
 * Ties: duplicate (x, y) points are all non-dominated together (no
 * strict inequality between them) and all kept — dedupe upstream if
 * one representative is wanted.
 *
 * @param xCol,yCol integral columns (cast exact — floats would make
 *                  the dominance test engine-dependent)
 * @return input rows that form the skyline
 */
object Skyline {

  def pareto2D(points: DataFrame, xCol: String, yCol: String,
      bucketWidth: Long = 65536L): DataFrame = {
    require(bucketWidth >= 1, "positive bucket width")
    val x = col(xCol).cast("long")
    val y = col(yCol).cast("long")
    val withB = points.withColumn("__bx",
      (x - pmod(x, lit(bucketWidth))) / lit(bucketWidth))
    // bucket table: value-range-bounded cardinality, so the
    // unpartitioned prefix window is a few hundred rows, not the data
    val wBuckets = Window.orderBy("__bx")
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketPrefix = withB.groupBy("__bx").agg(min(y).as("__bmin"))
      .withColumn("__prevmin", min(col("__bmin")).over(wBuckets))
      .select(col("__bx"), col("__prevmin"))
    // within-bucket strict-x prefix: RANGE frame on x, so equal-x
    // rows never see each other here
    val wStrict = Window.partitionBy("__bx").orderBy(x)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy(col("__bx"), x)
    withB
      .join(broadcast(bucketPrefix), Seq("__bx"))
      .withColumn("__strictmin",
        least(coalesce(min(y).over(wStrict), lit(Long.MaxValue)),
          coalesce(col("__prevmin"), lit(Long.MaxValue))))
      .withColumn("__samemin", min(y).over(wSame))
      .filter(!(col("__strictmin") <= y || col("__samemin") < y))
      .drop("__bx", "__prevmin", "__strictmin", "__samemin")
  }
}
