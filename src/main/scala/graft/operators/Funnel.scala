package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Ordered funnel analysis over an event stream — "of the users who
 * did A, how many later did B, then C?" — the standard product/
 * behavior query a metrics pipeline runs next to sessionization.
 * Stage i counts users whose earliest qualifying stage-i event is
 * STRICTLY after their stage-(i−1) time, with stage times chaining
 * from each user's earliest stage-1 event.
 *
 * Plan shape (scale rationale): each stage is a type-pruned scan
 * (`event_type = s` pushes to the source) → per-user min-timestamp
 * aggregate (map-side combinable) → equi-join on the user key with
 * the previous stage's frame. The joined side only ever SHRINKS
 * (stage frames are monotonically non-increasing user sets), so at
 * 100 TB the deep stages broadcast; the event table itself is
 * scanned once per stage with the stage filter pushed down — never
 * shuffled on anything but the user key. Conversion is reported
 * per-stage as integer ppm of the stage-1 population (single-row
 * broadcast), floor-division exact.
 *
 * Output: (stage: int, event_type, users: long, conv_ppm: long),
 * one row per stage in order.
 */
object Funnel {

  def funnel(events: DataFrame, stages: Seq[String],
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val u = col(userCol)
    // per-user chained earliest stage times: frames(i) = users who
    // reached stage i, with the time they reached it
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(u).agg(min(col(tsCol)).as("__t"))
    val frames = stages.tail.scanLeft(first) { (prev, stage) =>
      events.filter(col(typeCol) === stage)
        .select(u, col(tsCol))
        .join(prev.select(u, col("__t").as("__pt")), Seq(userCol))
        .filter(col(tsCol) > col("__pt"))
        .groupBy(u).agg(min(col(tsCol)).as("__t"))
    }
    val counts = frames.zip(stages).zipWithIndex.map {
      case ((frame, stage), i) =>
        frame.agg(count(lit(1)).cast("long").as("users"))
          .select(lit(i + 1).as("stage"), lit(stage).as("event_type"),
            col("users"))
    }.reduce(_.unionByName(_))
    val entry = counts.filter(col("stage") === 1)
      .select(col("users").as("__u1"))
    counts.crossJoin(broadcast(entry))
      .withColumn("conv_ppm",
        expr("(1000000 * users) div greatest(__u1, 1L)").cast("long"))
      .select(col("stage"), col("event_type"), col("users"), col("conv_ppm"))
  }
}
