package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Misra-Gries frequency summary as a mergeable Spark [[Aggregator]] —
 * `capacity` counters of bounded state per partial, combining
 * map-side. The classic guarantee: every value with true count
 * > N / (capacity + 1) is present in the summary, and the mergeable
 * variant (sum counters, then subtract the (capacity+1)-th largest
 * and drop non-positives — Agarwal et al., "Mergeable Summaries")
 * preserves exactly that bound under any merge tree, so the summary
 * is a provable SUPERSET of the heavy hitters regardless of
 * partitioning or reduce order. Counts inside the summary are
 * order-dependent underestimates — [[HeavyHitters.exact]] never
 * reports them, only the membership.
 */
class MisraGriesAggregator(capacity: Int)
  extends Aggregator[String, Map[String, Long], Seq[String]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(m: Map[String, Long], x: String): Map[String, Long] =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < capacity => m.updated(x, 1L)
      // full and x absent: decrement every counter (x's +1 cancels
      // against one decrement — the textbook step), dropping zeros
      case None => m.flatMap { case (k, v) =>
        if (v > 1) Some(k -> (v - 1)) else None }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long])
      : Map[String, Long] = {
    val summed = b.foldLeft(a) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v) }
    if (summed.size <= capacity) summed
    else {
      // subtract the (capacity+1)-th largest count from everything;
      // ≤ capacity strictly-larger counters survive
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      summed.flatMap { case (k, v) =>
        if (v > cut) Some(k -> (v - cut)) else None }
    }
  }

  override def finish(m: Map[String, Long]): Seq[String] = m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

/**
 * EXACT heavy hitters without shuffling the long tail — the
 * frequent-items query ("which tokens/hosts/users exceed x% of the
 * stream?") rendered scale-first. A plain `groupBy(value).count()`
 * shuffles one row per DISTINCT value — at 100 TB the long tail of
 * near-unique values dominates that exchange while contributing
 * nothing to the answer. Two phases instead:
 *
 *   1. candidates: one Misra-Gries pass (single aggregate, map-side
 *      partials of `capacity` counters, merge-order-proof superset
 *      guarantee) — the full stream is read but only O(capacity)
 *      state ever moves;
 *   2. confirm: a broadcast semi-join keeps only candidate rows
 *      (≤ capacity distinct keys), whose exact counts are then a
 *      trivially small aggregation; the rational threshold compare
 *      `cnt · 10^6 ≥ N · ppm` avoids any floor-division edge.
 *
 * The result is bit-identical to the naive form (phase 1 cannot miss
 * a qualifier, phase 2 removes every false positive exactly) and the
 * only full-volume stages are narrow scans. Output:
 * (valueCol, cnt, share_ppm), exact.
 */
object HeavyHitters {

  def exact(df: DataFrame, valueCol: String, thresholdPpm: Long): DataFrame = {
    require(thresholdPpm > 0, "threshold must be positive")
    // capacity + 1 > 10^6/ppm makes the MG superset guarantee cover
    // the threshold exactly; 2x slack keeps candidates comfortable
    // when the distribution sits near the boundary
    val capacity = math.max(8, (2000000L / thresholdPpm).toInt)
    val spark = df.sparkSession
    import spark.implicits._
    val vals = df.select(col(valueCol).cast("string").as("v"))
    val cands = vals.as[String]
      .select(new MisraGriesAggregator(capacity).toColumn.name("cands"))
      .select(explode(col("cands")).as("v"))
    val total = vals.agg(count(lit(1)).cast("long").as("__total"))
    vals.join(broadcast(cands), Seq("v"), "left_semi")
      .groupBy("v").agg(count(lit(1)).cast("long").as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * 1000000L >= col("__total") * thresholdPpm)
      .select(col("v").as(valueCol), col("cnt"),
        expr("(1000000 * cnt) div greatest(__total, 1L)").cast("long")
          .as("share_ppm"))
  }
}
