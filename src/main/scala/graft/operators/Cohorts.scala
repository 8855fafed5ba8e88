package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Cohort retention matrix over an event stream — "of the users whose
 * first activity was on day D, how many were active again D+n days
 * later?" — the companion analysis to [[Funnel]] in any product
 * metrics pipeline. Users are cohorted by their first active DAY;
 * each (cohort_day, offset_days) cell counts the cohort's users
 * active that many days later, with retention as integer ppm of the
 * cohort's size (its offset-0 population, which is the whole cohort
 * by construction).
 *
 * Plan shape: the raw stream immediately collapses to DISTINCT
 * (user, day) rows — the only pass over full event volume, a
 * map-side-combinable dedup keyed by user — then everything
 * downstream (first-day aggregate, the cohort join, the cell count)
 * operates on ≤ users × active-days rows, all keyed by user id. At
 * 100 TB of events the distinct is the cost; no later stage sees
 * more than one row per user-day, and the cohort-size rejoin is on
 * the (tiny) day key.
 */
object Cohorts {

  /** (cohort_day, offset_days, users, retained_ppm), one row per
    * cohort × observed offset. */
  def retention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val u = col(userCol)
    val days = events.select(u, to_date(col(tsCol)).as("__day")).distinct()
    val cohort = days.groupBy(u).agg(min(col("__day")).as("cohort_day"))
    val cells = days.join(cohort, Seq(userCol))
      .select(col("cohort_day"),
        datediff(col("__day"), col("cohort_day")).as("offset_days"))
      .groupBy("cohort_day", "offset_days")
      .agg(count(lit(1)).cast("long").as("users"))
    val sizes = cohort.groupBy("cohort_day")
      .agg(count(lit(1)).cast("long").as("__cohort_n"))
    cells.join(sizes, Seq("cohort_day"))
      .withColumn("retained_ppm",
        expr("(1000000 * users) div greatest(__cohort_n, 1L)").cast("long"))
      .select(col("cohort_day"), col("offset_days"), col("users"),
        col("retained_ppm"))
  }
}
