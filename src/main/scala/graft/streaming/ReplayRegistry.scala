package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Shared live-query registry for the verification replay harnesses
 * ([[StreamParity]], [[PipelineReplay]]). Replays run on CHILD
 * sessions, and `StreamingQueryManager` is per-session — a leaked
 * replay never shows in the parent's `spark.streams.active`, so
 * harness-level residue checks (Bench's `drainStreamingResidue`)
 * need this registry to see it.
 */
private[streaming] object ReplayRegistry {

  val live: java.util.Set[StreamingQuery] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[StreamingQuery]()

  /** Replay queries still running (empty unless a replay leaked).
    * Prunes entries whose query has since stopped — e.g. a leaked
    * replay a harness drain stopped from outside — so a past leak
    * can't keep reporting residue after the JVM is quiet again. */
  def activeReplays: Seq[StreamingQuery] = {
    import scala.jdk.CollectionConverters._
    live.removeIf(q => !q.isActive)
    live.asScala.toSeq
  }
}
