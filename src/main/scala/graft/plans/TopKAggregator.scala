package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * Bounded-heap top-k aggregator (SURVEY §7's custom-aggregate
 * candidate): keeps the k highest-scoring (id, score) pairs per group
 * with O(n log k) work and O(k) state, with map-side partial
 * aggregation — at scale this replaces the window row_number() ranking,
 * which must shuffle and SORT every candidate in a group before
 * discarding all but k.
 *
 * Ties break toward the smaller id, matching the window-rank ordering
 * (`ORDER BY score DESC, id`), so both paths return identical sets.
 */
case class ScoredId(id: Long, score: Double)

class TopKAggregator(k: Int)
  extends Aggregator[ScoredId, List[ScoredId], Seq[ScoredId]] {

  /** Sort: best first — higher score, then smaller id. Compares via
    * java.lang.Double.compare so NaN orders LARGEST, matching Spark's
    * window `ORDER BY score DESC` (plain > treats NaN as losing every
    * comparison, which would silently drop a NaN-scored candidate the
    * window path ranks #1 — the identical-sets contract). */
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = java.lang.Double.compare(a.score, b.score)
    c > 0 || (c == 0 && a.id < b.id)
  }

  override def zero: List[ScoredId] = Nil

  private def insert(buf: List[ScoredId], x: ScoredId): List[ScoredId] = {
    // buf is kept sorted best-first and at most k long; insertion is
    // O(k) — fine for the small k of top-k queries.
    val (front, back) = buf.span(better(_, x))
    val merged = front ::: (x :: back)
    if (merged.length > k) merged.take(k) else merged
  }

  override def reduce(buf: List[ScoredId], x: ScoredId): List[ScoredId] =
    if (buf.length == k && better(buf.last, x)) buf else insert(buf, x)

  override def merge(a: List[ScoredId], b: List[ScoredId]): List[ScoredId] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[ScoredId]): Seq[ScoredId] = buf

  override def bufferEncoder: Encoder[List[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
