package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/**
 * Online CUSUM level-shift detection as a stateful stream — the
 * streaming twin of [[graft.operators.Anomaly.cusumShift]]. CUSUM is
 * inherently online (state after point t is a pure fold of points
 * ≤ t), so the stream carries exactly seven longs per series and
 * emits a refreshed summary every micro-batch: the live "has this
 * metric shifted yet?" signal, versus the batch operator's
 * retrospective audit.
 *
 * Contract: per-series points must be processed in bucket order.
 * Within one micro-batch the group's slice is sorted by bucket (the
 * canonical-intra-batch rule every fold operator here follows);
 * ACROSS batches the caller must deliver buckets chronologically —
 * the natural shape when the input is the watermark-closed output of
 * an upstream windowed aggregation ([[StreamingStatAgg]]), which
 * emits windows in close order. A bucket arriving after a later
 * bucket was folded would silently corrupt the walk, which is why the
 * production composition is agg→cusum in one pipeline, not cusum over
 * raw events.
 *
 * State is 7 longs per series — bounded by SERIES CARDINALITY alone,
 * the smallest possible footprint for this statistic (no window
 * buffer: the fold absorbs each point into scalars). The fold
 * arithmetic is bit-identical to the batch operator: truncating
 * integer warmup mean, max(0, ·) walks, first crossing at its
 * absolute 1-based index.
 */
object StreamCusum {

  case class Point(series: String, bucket: Long, x: Long)

  case class CusumState(nSeen: Long, warmSum: Long, mu: Long,
    sp: Long, sn: Long, mx: Long, fi: Long)

  case class CusumUpdate(series: String, n_points: Long, mu: Long,
    max_cusum: Long, first_shift_idx: Option[Long])

  /** One fold step — shared arithmetic with the batch operator's
    * compiled aggregate() (kept in plain Scala here: the stream's
    * per-point work is a state update, not a columnar pass). */
  private[streaming] def step(st: CusumState, x: Long, warmup: Int,
      slack: Long, threshold: Long): CusumState = {
    val n = st.nSeen + 1
    if (n < warmup) st.copy(nSeen = n, warmSum = st.warmSum + x)
    else if (n == warmup) {
      val ws = st.warmSum + x
      // truncating division — identical to the batch `div`
      st.copy(nSeen = n, warmSum = ws, mu = ws / warmup)
    } else {
      val sp = math.max(0L, st.sp + x - st.mu - slack)
      val sn = math.max(0L, st.sn + st.mu - x - slack)
      val mx = math.max(st.mx, math.max(sp, sn))
      val fi = if (st.fi > 0L) st.fi
        else if (sp > threshold || sn > threshold) n
        else 0L
      CusumState(n, st.warmSum, st.mu, sp, sn, mx, fi)
    }
  }

  /** Per-series summaries refreshed every micro-batch (update mode). */
  def cusumStream(points: Dataset[Point], warmup: Int, slack: Long,
      threshold: Long): Dataset[CusumUpdate] = {
    require(warmup > 0 && slack >= 0 && threshold > 0,
      "need warmup > 0, slack >= 0, threshold > 0")
    import points.sparkSession.implicits._
    points.groupByKey(_.series)
      .mapGroupsWithState[CusumState, CusumUpdate](GroupStateTimeout.NoTimeout) {
        (series: String, rows: Iterator[Point], gs: GroupState[CusumState]) =>
          var st = gs.getOption.getOrElse(CusumState(0L, 0L, 0L, 0L, 0L, 0L, 0L))
          rows.toSeq.sortBy(_.bucket).foreach { p =>
            st = step(st, p.x, warmup, slack, threshold)
          }
          gs.update(st)
          CusumUpdate(series, st.nSeen,
            if (st.nSeen >= warmup) st.mu else 0L,
            st.mx, if (st.fi > 0L) Some(st.fi) else None)
      }
  }
}
