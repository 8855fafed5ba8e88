package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Binned interval join: match point rows to interval rows with
 * `start <= point <= end` WITHOUT the BroadcastNestedLoopJoin Spark
 * plans for a bare range predicate. Both sides are mapped onto
 * fixed-width bins over the join domain — a point belongs to exactly
 * one bin, an interval explodes to every bin it overlaps — so the
 * match becomes a hash equi-join on the bin id followed by the exact
 * range filter. Shuffle volume is |points| + |intervals| × (avg
 * interval width / binWidth + 1): pick binWidth near the typical
 * interval width to keep the blow-up a small constant. Each matching
 * (point, interval) pair meets in exactly one bin (the point's), so
 * no post-join dedup is needed — the property that lets this scale
 * linearly where a naive theta join is quadratic.
 */
object RangeJoin {

  /**
   * @param points   rows with numeric `pointCol` (cast dates/timestamps
   *                 to long in the caller)
   * @param intervals rows with numeric `startCol`/`endCol` (inclusive)
   * @param binWidth bin size in domain units
   * @return every (point row ⨯ matching interval row), all columns
   */
  def binned(points: DataFrame, intervals: DataFrame, pointCol: String,
      startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(pointCol)))
    val iv = intervals
      .filter(col(startCol) <= col(endCol))
      .withColumn("__bin",
        explode(sequence(bin(col(startCol)), bin(col(endCol)))))
    p.join(iv, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bin")
  }
}
