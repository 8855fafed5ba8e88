package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.model.{ComparisonOperator, TreatMissingData}

/**
 * Streaming alarm state machine (O-23 streaming variant; SURVEY.md §7
 * "What's hard" #1/#5): per-series CloudWatch-style M-of-N evaluation
 * as flatMapGroupsWithState. State per series = ring buffer of the
 * last N breach votes + the current alarm state; each incoming window
 * value advances the machine and state *transitions* are emitted
 * (alarm actions fire on change, not level — cw_alarm.py:52-62).
 *
 * Scale: state is O(evaluation_periods) booleans per series — millions
 * of series fit comfortably in the state store; keys partition across
 * executors by series hash.
 */
object AlarmStream {

  final case class SeriesPoint(
      seriesId: String, windowStart: Long, value: Option[Double],
      threshold: Double, comparisonOperator: String,
      datapointsToAlarm: Int, evaluationPeriods: Int,
      treatMissingData: String)

  /** Per-series machine state, mirroring the batch variant's two
    * views of history: `slotVotes` = last N slots (missing slots as
    * None — drives MISSING insufficiency and the NB/B policies);
    * `realVotes` = last N breach flags of REAL datapoints (drives
    * IGNORE/MISSING vote counting, where missing slots don't vote). */
  final case class AlarmState(
      slotVotes: List[Option[Boolean]], realVotes: List[Boolean], state: String)

  final case class Transition(
      seriesId: String, windowStart: Long, prevState: String,
      newState: String)

  /** Advance one series' machine over a batch of points (ordered by
    * window). Pure function — unit-testable without Spark; semantics
    * match graft.operators.AlarmStateMachine.evaluate. */
  private[graft] def advance(
      points: Iterator[SeriesPoint],
      st: AlarmState): (AlarmState, List[Transition]) =
    points.toSeq.sortBy(_.windowStart).foldLeft((st, List.empty[Transition])) {
      case ((s, out), p) =>
        val op = ComparisonOperator.fromName(p.comparisonOperator)
        val n = math.max(p.evaluationPeriods, 1)
        val policy = TreatMissingData.fromName(p.treatMissingData)
        val realBreach = p.value.map(v => op.breaches(v, p.threshold))
        val slotVote: Option[Boolean] = realBreach.orElse(policy match {
          case TreatMissingData.NotBreaching => Some(false)
          case TreatMissingData.Breaching => Some(true)
          case _ => None // IGNORE / MISSING: slot doesn't vote
        })
        val slotVotes = (s.slotVotes :+ slotVote).takeRight(n)
        val realVotes = (s.realVotes ++ realBreach).takeRight(n)
        val counted = policy match {
          case TreatMissingData.Ignore | TreatMissingData.Missing =>
            realVotes // last N real datapoints, gaps skipped
          case _ => slotVotes.flatten // last N slots (all voted)
        }
        // MISSING: insufficient iff no real datapoint in the last N
        // slots — same trigger as the batch variant.
        val newState =
          if (policy == TreatMissingData.Missing && !slotVotes.exists(_.isDefined))
            "INSUFFICIENT_DATA"
          else if (counted.count(identity) >= p.datapointsToAlarm) "ALARM"
          else "OK"
        val next = AlarmState(slotVotes, realVotes, newState)
        val out2 = if (newState != s.state)
          Transition(p.seriesId, p.windowStart, s.state, newState) :: out
        else out
        (next, out2)
    } match { case (s, out) => (s, out.reverse) }

  /** Wire the machine into a streaming Dataset of series points. */
  def transitions(points: Dataset[SeriesPoint]): Dataset[Transition] = {
    val spark = points.sparkSession
    import spark.implicits._
    points.groupByKey(_.seriesId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (key: String, it: Iterator[SeriesPoint], gs: GroupState[AlarmState]) => {
          val st = gs.getOption.getOrElse(AlarmState(Nil, Nil, "INSUFFICIENT_DATA"))
          val (next, out) = advance(it, st)
          gs.update(next)
          out.iterator
        })
  }
}
