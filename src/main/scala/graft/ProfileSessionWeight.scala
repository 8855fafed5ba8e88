package graft

import org.apache.spark.sql.SparkSession

/**
 * Forensics for the ~1.5× small-query drift vs round 6 (VERDICT r8,
 * next-round #5): tiny queries (`q_doc_signals` 0.09→0.15 s,
 * `q_stat_windows` 0.22→0.32 s) slowed as the board grew 60→74 queries
 * even though their own plans did not change. Hypothesis: SESSION
 * weight, not plan weight — every query's wall time includes Catalyst
 * phases (parse/analyze/optimize/plan) whose cost scales with what the
 * session has accumulated (registered native functions, temp views,
 * cached file indexes), plus fixed per-query harness costs
 * (`spark.read.parquet` re-listing + footer reads).
 *
 * Measures each target query twice in one bench-shaped session —
 * FRESH (first touch after session build) and POST-SWEEP (after one
 * full query-board sweep, the regime bench medians live in) — with the
 * Catalyst phase breakdown from `QueryExecution.tracker` separated
 * from execution wall time. If post-sweep phase time ≈ fresh phase
 * time, session weight is NOT the cause and the drift is JVM-level
 * (code cache, GC) — knowable only empirically.
 */
object ProfileSessionWeight {

  private final case class Shot(name: String, when: String,
      phasesMs: Map[String, Long], wallSec: Double)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val targets = Seq("q_doc_signals", "q_stat_windows", "q_defs_metrics",
      "q_pivot", "q_align10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def shoot(name: String, when: String): Shot = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      // Materialize optimization + physical planning on THIS
      // DataFrame's own tracker before reading phases: count() plans a
      // derived QueryExecution, so without this touch the tracker only
      // ever records the analysis phase and the breakdown silently
      // omits optimize/plan — the phases the tool exists to measure.
      // Construction is inside the timed window too (analysis runs
      // eagerly at construction).
      df.queryExecution.executedPlan
      df.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val phases = df.queryExecution.tracker.phases
        .map { case (p, s) => p -> (s.endTimeMs - s.startTimeMs) }
      spark.catalog.clearCache()
      Shot(name, when, phases.toMap, wall)
    }

    // repeat=3, keep min: isolates the structural cost from scheduler
    // jitter on a shared box
    def best(name: String, when: String): Shot =
      (1 to 3).map(_ => shoot(name, when)).minBy(_.wallSec)

    val fresh = targets.map(n => best(n, "fresh"))
    // one full sweep = the state a bench trial round leaves behind
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => n == "q_alarm_stream_parity" }
      .foreach { case (_, fn) =>
        try fn(spark, sfDir).count()
        catch { case scala.util.control.NonFatal(_) => () }
        spark.catalog.clearCache()
      }
    val after = targets.map(n => best(n, "post-sweep"))

    def fmt(s: Shot): String = {
      val planMs = s.phasesMs.values.sum
      f"${s.name}%-16s ${s.when}%-10s wall ${s.wallSec}%6.3fs  " +
        f"catalyst ${planMs}%4d ms  (" +
        s.phasesMs.toSeq.sortBy(_._1).map { case (p, ms) => s"$p=$ms" }
          .mkString(" ") + ")"
    }
    (fresh ++ after).foreach(s => println(fmt(s)))
    val freshWall = fresh.map(_.wallSec).sum
    val afterWall = after.map(_.wallSec).sum
    val freshPhase = fresh.map(_.phasesMs.values.sum).sum
    val afterPhase = after.map(_.phasesMs.values.sum).sum
    println(f"TOTAL fresh wall ${freshWall}%6.3fs catalyst ${freshPhase} ms | " +
      f"post-sweep wall ${afterWall}%6.3fs catalyst ${afterPhase} ms")
    spark.stop()
  }
}
