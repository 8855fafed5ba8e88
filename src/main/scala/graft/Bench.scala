package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times on
  * SPARK_GRAFT_SF_DIR. Queries run through the same SparkEntry
  * contract the correctness gate uses.
  *
  * Methodology (round 6): each query is timed over N independent
  * trials (default 3, SPARK_GRAFT_TRIALS) and the reported number is
  * the MEDIAN, with per-query [min,max] spread recorded alongside.
  * A single-trial bench cannot distinguish a code regression from
  * JIT/code-cache warm-up order — round 5 recorded 3–6x "regressions"
  * on queries whose code had not changed. The median of independent
  * trials absorbs the one-time JIT/codegen compilation cost into the
  * first trial and reports steady-state throughput, which is the
  * regime a long-lived cluster job runs in. Queries whose median sits
  * >20% above their fastest trial are listed in "unstable" so a noisy
  * number is never silently treated as a regression or a win. (The
  * max trial is NOT used for the flag: the first trial legitimately
  * carries residual JIT/codegen cost — that is exactly the noise the
  * median exists to discard.)
  *
  * Streaming isolation (round 8): round 7's bench ran the streaming
  * parity harness 4th of 72 in sorted order, and every later query
  * inherited its JVM residue (state-store maintenance thread, stream
  * listener bus, memory sinks) — the r7 bench recorded a 2.1x
  * "regression" on verbatim-unchanged code. Streaming queries now run
  * LAST, and after each one the bench tears down streaming residue
  * (stop leftover streams, StateStore.stop()) and verifies the JVM is
  * streaming-quiet before the next timing starts — checking BOTH the
  * parent session's StreamingQueryManager and StreamParity's registry
  * of child-session replays (managers are per-session, so the parent
  * alone would never see a leaked replay).
  *
  * Taint guard (round 8): >8 unstable queries marks the whole artifact
  * `"tainted":true` — a polluted JVM or loaded machine can no longer
  * masquerade as an engine regression (round 7 had 17 unstable vs the
  * usual ≤6). SPARK_GRAFT_SKIP (comma-separated query names) excludes
  * queries from a run for A/B forensics.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val trials = math.max(1, sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up at the next-smaller scale factor pays parquet
    // reader class loading and the bulk of codegen compilation once.
    // sf0.01 (not sf0.001) so row counts are high enough to trigger
    // JIT of every hot loop. Runs in the SAME sorted order as the
    // timed loop — no ordering tricks; per-query medians (not the
    // warm-up pass) are what make the timings order-independent.
    val warmDir = Seq("sf0.01", "sf0.001")
      .map(n => new java.io.File(new java.io.File(sfDir).getParentFile, n))
      .find(d => d.isDirectory && d.getPath != new java.io.File(sfDir).getPath)
      .getOrElse(new java.io.File("/nonexistent"))
    val warmupWanted = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val warmedUp = warmupWanted && warmDir.isDirectory
    // Queries that start Structured Streaming work: run last and tear
    // down their JVM residue so batch timings never inherit it.
    val streamingQueries = Set("q_alarm_stream_parity")
    val skip = sys.env.getOrElse("SPARK_GRAFT_SKIP", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet
    // SPARK_GRAFT_ORDER_SEED permutes the batch-query order (streaming
    // still last): a permuted run whose medians match the sorted run
    // within noise proves the timings are order-independent — the
    // check that caught round 7's streaming-residue coupling.
    val orderSeed = sys.env.get("SPARK_GRAFT_ORDER_SEED").map(_.toLong)
    val sorted = SparkEntry.queries.toSeq
      .filterNot { case (n, _) => skip.contains(n) }
      .sortBy { case (n, _) => (streamingQueries.contains(n), n) }
    val names = orderSeed match {
      case None => sorted
      case Some(seed) =>
        val (batch, streaming) = sorted.partition {
          case (n, _) => !streamingQueries.contains(n) }
        new scala.util.Random(seed).shuffle(batch) ++ streaming
    }
    // Drop every trace a streaming query leaves in the shared JVM:
    // stop any stream that outlived its query, unload state-store
    // providers AND their maintenance thread (a fresh stream restarts
    // it lazily). StreamingQueryManager is per-session and the parity
    // replay runs on a CHILD session, so the parent's spark.streams
    // alone would never see a leaked replay — the StreamParity
    // registry covers that side. Harmless no-op after batch queries.
    def leakedStreams() =
      spark.streams.active.toSeq ++ graft.streaming.StreamParity.activeReplays
    def drainStreamingResidue(): Unit = {
      leakedStreams().foreach { q =>
        try q.stop() catch { case scala.util.control.NonFatal(_) => () }
      }
      try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    if (warmedUp) {
      names.foreach { case (name, fn) =>
        try fn(spark, warmDir.getPath).count()
        catch { case scala.util.control.NonFatal(_) => () }
        spark.catalog.clearCache()
        if (streamingQueries.contains(name)) drainStreamingResidue()
      }
    }
    final case class Timing(name: String, median: Double, min: Double,
        max: Double, ok: Boolean)
    val errMsgs = scala.collection.mutable.Map.empty[String, String]
    val results = names.map { case (name, fn) =>
      // a timing starts only on a streaming-quiet JVM (parent session
      // AND the child-session replay registry)
      require(leakedStreams().isEmpty,
        s"streaming residue before $name: " +
          leakedStreams().map(_.name).mkString(","))
      val samples = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case scala.util.control.NonFatal(e) =>
            // first failure message per query goes into the artifact —
            // a silent -1 is undiagnosable from the driver's capture.
            // Strip EVERY control character plus quote/backslash: one
            // raw control byte (U+0000-U+001F) in the message would invalidate the
            // whole detail JSON, losing the artifact, not just the row.
            errMsgs.getOrElseUpdate(name,
              (e.getMessage match {
                case null => e.getClass.getName
                case m => e.getClass.getName + ": " + m
              }).replaceAll("[\\u0000-\\u001f\"\\\\]", " ").take(300))
            false }
        // the timed window is the QUERY alone — cache-clear and
        // streaming teardown are harness hygiene between trials, and
        // charging them to the query would re-create the measurement
        // distortion the teardown exists to prevent
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (streamingQueries.contains(name)) drainStreamingResidue()
        (dt, ok)
      }
      val ok = samples.forall(_._2)
      val ts = samples.map(_._1).sorted
      val median =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      Timing(name, median, ts.head, ts.last, ok)
    }
    // failed queries report -1 (never a fake wall time) and are listed
    // in "errors" so a broken engine can't benchmark as a fast one.
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON.
    def f6(v: Double) = String.format(java.util.Locale.ROOT, "%.6f", Double.box(v))
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val spread = results.map(r => "\"" + r.name + "\":[" + f6(r.min) + "," + f6(r.max) + "]")
      .mkString("{", ",", "}")
    // Unstable = median >20% above the fastest trial AND >100 ms above
    // it. The relative test alone flags 30 ms wobble on a 0.15 s query
    // — jitter that cannot distort a ~30 s total; the absolute floor
    // keeps the flag about distortion that could actually move a
    // round-over-round comparison.
    def isUnstable(r: Timing) = r.ok && r.min > 0 &&
      (r.median - r.min) / r.min > 0.2 && r.median - r.min > 0.1
    val unstable = results.filter(isUnstable)
      .map(r => "\"" + r.name + "\"").mkString("[", ",", "]")
    val errors = results.collect { case r if !r.ok =>
      "\"" + r.name + "\":\"" + errMsgs.getOrElse(r.name, "unknown") + "\""
    }.mkString("{", ",", "}")
    val total = results.collect { case r if r.ok => r.median }.sum
    // Taint guard: healthy rounds sit at ≤6 unstable queries; >8 means
    // the RUN is untrustworthy (polluted JVM / loaded machine), not
    // that the engine regressed — round 7's lesson, encoded.
    val unstableCount = results.count(isUnstable)
    val tainted = unstableCount > 8
    if (tainted) System.err.println(
      s"BENCH TAINTED: $unstableCount unstable queries (>8) — treat " +
        "totals as environment noise, not engine performance")
    // Full-precision medians + spread + instability flags go to a side
    // file: the harness that captures this process's stdout keeps only
    // the last ~2000 characters, and a 69-query spread map pushed the
    // start of the JSON line out of that window every round (BENCH_r01
    // ..r06 all record parsed:null). The final stdout line is kept
    // compact (3-decimal medians, no spread) so it always fits.
    val qs6 = results.map(r => "\"" + r.name + "\":" + (if (r.ok) f6(r.median) else "-1.0"))
      .mkString("{", ",", "}")
    val detail = s"""{"metric":"total","value":$total,"unit":"sec","warmup":$warmedUp,"trials":$trials,"tainted":$tainted,"queries":$qs6,"spread":$spread,"unstable":$unstable,"errors":$errors,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_DETAIL.json", "UTF-8")
      try w.println(detail) finally w.close()
    } catch { case scala.util.control.NonFatal(_) => () }
    // "warmup" records whether the untimed warm-up pass ran, so
    // cross-round deltas stay attributable (warm vs cold JIT numbers
    // are not comparable).
    val qs3 = results.map(r => "\"" + r.name + "\":" + (if (r.ok) f3(r.median) else "-1.0"))
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","warmup":$warmedUp,"trials":$trials,"tainted":$tainted,"queries":$qs3,"sf":"$sfDir"}""")
    spark.stop()
  }
}
