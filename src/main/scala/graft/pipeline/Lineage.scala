package graft.pipeline

import org.apache.spark.sql.DataFrame

/**
 * Lineage-truncation hygiene for iterative operators.
 *
 * Round 13 moved every iterative loop (BPE merges, PageRank, k-core,
 * label propagation, entity resolution) from `persist()` to
 * `localCheckpoint()` — persist caches data but NOT the logical plan,
 * so each round re-analyzed an O(rounds)-deep plan (the k-core
 * 43.5 s forensics). The round-14 follow-up (ADVICE): localCheckpoint
 * blocks live in the block manager and are freed only when the
 * superseded Dataset is GARBAGE-COLLECTED (ContextCleaner hooks the
 * RDD's finalizer path) — a long-running loop on a quiet driver heap
 * can accumulate O(rounds × state size) of dead checkpoint blocks in
 * executor storage before any GC runs, because the driver-side
 * Dataset objects are tiny.
 *
 * `cycle` makes the release deterministic: eagerly checkpoint the
 * next round's state, then explicitly unpersist the superseded
 * round's checkpoint RDD (non-blocking). The superseded frame's
 * blocks are gone as soon as the round commits, independent of driver
 * GC pressure.
 *
 * The checkpointed RDD is reached reflectively: `localCheckpoint()`
 * returns a Dataset over `o.a.s.sql.execution.LogicalRDD`, whose
 * `rdd` accessor is `private[sql]` at the Scala source level but — as
 * with all Scala access modifiers — public in bytecode. A non-
 * LogicalRDD plan (not a checkpoint product) is a silent no-op, so
 * callers cannot double-free or free a live plan by mistake.
 */
object Lineage {

  /** Eagerly localCheckpoint `next`, then release the block-manager
    * storage of `prev` (a frame produced by a previous
    * `localCheckpoint()`/`cycle` call, now superseded). Ordering
    * matters: the new state MATERIALIZES before the old blocks go —
    * `next`'s plan reads `prev`'s blocks. */
  def cycle(next: DataFrame, prev: DataFrame): DataFrame = {
    val cp = next.localCheckpoint()
    release(prev)
    cp
  }

  /** Unpersist the checkpoint blocks behind a localCheckpoint-ed
    * frame. No-op (never a throw) for frames that are not checkpoint
    * products. */
  def release(df: DataFrame): Unit =
    try {
      val lp = df.queryExecution.logical
      if (lp.getClass.getSimpleName == "LogicalRDD") {
        lp.getClass.getMethod("rdd").invoke(lp) match {
          case rdd: org.apache.spark.rdd.RDD[_] => rdd.unpersist(blocking = false)
          case _ => ()
        }
      }
    } catch { case scala.util.control.NonFatal(_) => () }
}
