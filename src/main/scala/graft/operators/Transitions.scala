package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * First-order event-transition matrix ("user journey" Markov
 * counts): for each ordered pair of event types, how often does a
 * user's NEXT event follow the current one, and with what empirical
 * probability — the input to funnel design, anomaly baselines
 * ("error→purchase should be rare"), and journey visualization.
 * Complements [[Funnel]] (which checks ONE prescribed path) with the
 * full observed graph.
 *
 * Ordering is (ts, tieCol) per user — the tie column makes
 * same-timestamp events a total order so the matrix is deterministic
 * and replayable.
 *
 * Scale shape: ONE shuffle by user (the lead window; per-task memory
 * bounded by a user's own event volume), then a map-side-combinable
 * count whose key space is |event types|² — bounded regardless of
 * corpus size. Probabilities are integer ppm via floor division,
 * row-normalized per source state.
 */
object Transitions {

  def eventTransitions(events: DataFrame, userCol: String = "user_id",
      typeCol: String = "event_type", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val steps = events
      .select(col(userCol), col(typeCol).as("from_type"), col(tsCol), col(tieCol))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val counts = steps.groupBy("from_type", "to_type")
      .agg(count(lit(1)).cast("long").as("n_trans"))
    val totals = counts.groupBy("from_type")
      .agg(sum("n_trans").cast("long").as("__tot"))
    counts.join(totals, Seq("from_type"))
      .withColumn("prob_ppm",
        expr("(1000000 * n_trans) div greatest(__tot, 1L)").cast("long"))
      .select("from_type", "to_type", "n_trans", "prob_ppm")
  }
}
