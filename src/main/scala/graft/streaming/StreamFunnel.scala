package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/**
 * Streaming ordered-funnel progress — the continuous form of
 * [[graft.operators.Funnel]]: per user, track the earliest
 * strictly-forward chain of stage times and emit the user's new
 * depth whenever an event extends it. Downstream, a latest-wins
 * aggregation by user gives live per-stage conversion counts.
 *
 * State per user is exactly `stages.length` longs (the chained
 * earliest times, unreached = MaxValue) — bounded regardless of
 * event volume, the property that lets a 1000-executor job hold
 * hundreds of millions of users in state. The chain has the prefix
 * property by construction: stage i can only be set while stage i−1
 * is set, because the strict `ts > t(i−1)` guard never passes
 * against MaxValue.
 *
 * Ordering contract: events are folded in event-time order WITHIN
 * each micro-batch (the group's iterator is sorted before folding),
 * and the incremental update is exact for per-user event-time-ordered
 * delivery across batches — the shape a partitioned log gives you.
 * A cross-batch late event can only deepen the funnel late, never
 * corrupt state (a stale earlier-stage time is monotonically ≤ any
 * chained follower). Batch [[graft.operators.Funnel]] over the full
 * log remains the reconciliation path, the same batch/stream parity
 * contract as the alarm pipeline.
 */
object StreamFunnel {

  /** times: earliest chained per-stage event time (epoch ms),
    * Long.MaxValue = unreached. */
  final case class FunnelState(times: Seq[Long])

  /** Emits (user_id, stage_reached) whenever a user's funnel depth
    * grows; Update output mode. */
  def funnelStream(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): Dataset[(Long, Int)] = {
    val spark = events.sparkSession
    import spark.implicits._
    val stageIndex = stages.zipWithIndex.toMap
    events
      .select(col(userCol).cast("long"), col(tsCol).cast("timestamp"),
        col(typeCol).cast("string"))
      .as[(Long, java.sql.Timestamp, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
            state: org.apache.spark.sql.streaming.GroupState[FunnelState]) => {
          val times = state.getOption
            .getOrElse(FunnelState(Seq.fill(stages.length)(Long.MaxValue)))
            .times.toArray
          val prevDepth = times.count(_ != Long.MaxValue)
          // intra-batch disorder is absorbed by sorting the group's
          // slice; ties fold in stage order (a view and a click at the
          // same instant do NOT chain — the guard is strict)
          it.toSeq.sortBy(e => (e._2.getTime, stageIndex.getOrElse(e._3, -1)))
            .foreach { case (_, ts, et) =>
              stageIndex.get(et).foreach { i =>
                val t = ts.getTime
                if (i == 0) times(0) = math.min(times(0), t)
                else if (times(i - 1) != Long.MaxValue && t > times(i - 1))
                  times(i) = math.min(times(i), t)
              }
            }
          state.update(FunnelState(times.toSeq))
          val depth = times.count(_ != Long.MaxValue)
          if (depth > prevDepth) Iterator((user, depth)) else Iterator.empty
        })
  }
}
