package graft

import scala.collection.concurrent.TrieMap

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/**
 * Single-query forensics: times ONE named `SparkEntry` query under
 * exactly the Bench format-4 protocol (construction + `toRdd.count()`
 * in one window, cache cleared between trials), but additionally
 * splits the window into CONSTRUCTION (the `fn(spark, dir)` call —
 * where eager operators like kCore/labelPropagation run their
 * persist+count rounds) vs EXECUTION (the returned plan's
 * `toRdd.count()`), and counts the Spark jobs each phase submits with
 * their scheduler-side wall time. Built for the round-12 `q_kcore`
 * contradiction (bench median 43.5 s vs profile cell 6.7 s): the two
 * instruments ran different fixtures AND different measurement
 * windows, and neither could say where inside the query the time
 * went.
 *
 * Usage: runMain graft.ProfileQuery <name[,name...]> [sfDir] [trials]
 */
object ProfileQuery {

  private final class JobListener extends SparkListener {
    val started = TrieMap.empty[Int, Long]
    val jobs = TrieMap.empty[Int, Long] // jobId -> elapsed ms
    // memory axis (round 14): per-task peak EXECUTION memory (the
    // operator working set Spark's memory manager accounts — joins,
    // sorts, aggregates), spill volumes, and shuffle bytes. Peak is
    // the max over tasks; multiplied by concurrent task slots it
    // upper-bounds an executor's demand at this per-partition size,
    // which is the number a 100x extrapolation needs (partition count
    // grows with data; per-partition working set is what must fit).
    val peakTaskMem = new AtomicLong(0L)
    val spillMemB = new AtomicLong(0L)
    val spillDiskB = new AtomicLong(0L)
    val shufReadB = new AtomicLong(0L)
    val shufWriteB = new AtomicLong(0L)
    override def onJobStart(j: SparkListenerJobStart): Unit =
      started.put(j.jobId, j.time)
    override def onJobEnd(j: SparkListenerJobEnd): Unit =
      started.get(j.jobId).foreach(t0 => jobs.put(j.jobId, j.time - t0))
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        peakTaskMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
        spillMemB.addAndGet(m.memoryBytesSpilled)
        spillDiskB.addAndGet(m.diskBytesSpilled)
        shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  /** Wait until the listener's job count stabilizes (two consecutive
    * unchanged 100 ms polls, 2 s cap) — a fixed sleep misattributes
    * late job-end events from a loaded bus into the next phase,
    * skewing exactly the construct/execute split this tool exists to
    * measure. */
  private def drain(lst: JobListener): Unit = {
    var prev = -1; var stable = 0; var waited = 0
    while (stable < 2 && waited < 2000) {
      Thread.sleep(100); waited += 100
      val n = lst.jobs.size
      if (n == prev) stable += 1 else { stable = 0; prev = n }
    }
  }

  def main(args: Array[String]): Unit = {
    val qnames = args(0).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val trials = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "4000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    qnames.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to trials).foreach { t =>
        // host-weather reading per trial (round-15: profile cells
        // carry the same canary evidence as bench artifacts — the sf1
        // memory sweep showed 2x wall spread between trials with no
        // weather column to attribute it to)
        val canSpin = Canary.spin(cpus.toInt)
        val canBw = Canary.bw(cpus.toInt)
        // the bw array must NOT survive into the heap measurement —
        // a live 512 MiB probe buffer would inflate every heapPeak
        // reading and break comparability with earlier memory cells.
        // Dropping the reference is not enough: resetPeakUsage reads
        // the pools' CURRENT usage as the new watermark, and a dead
        // 512 MiB array still counts as used until a GC actually
        // collects it — so force one before re-basing the peaks.
        Canary.releaseBw()
        System.gc()
        val lst = new JobListener
        spark.sparkContext.addSparkListener(lst)
        // JVM heap peak per trial: reset the heap pools' peak-usage
        // watermark so the reading covers THIS trial only
        import scala.jdk.CollectionConverters._
        val heapPools = java.lang.management.ManagementFactory
          .getMemoryPoolMXBeans.asScala
          .filter(_.getType == java.lang.management.MemoryType.HEAP)
        heapPools.foreach(p => try p.resetPeakUsage()
          catch { case scala.util.control.NonFatal(_) => () })
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        drain(lst)
        val constructionJobs = lst.jobs.size
        val constructionJobMs = lst.jobs.values.sum
        val t2 = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t3 = System.nanoTime()
        drain(lst)
        val totalJobs = lst.jobs.size
        val totalJobMs = lst.jobs.values.sum
        spark.sparkContext.removeSparkListener(lst)
        spark.catalog.clearCache()
        // free localCheckpoint blocks (ContextCleaner acts on GC)
        System.gc()
        graft.streaming.StreamParity.activeReplays.foreach { q =>
          try q.stop() catch { case scala.util.control.NonFatal(_) => () }
        }
        // mirror Bench.drainStreamingResidue (ADVICE): stopping the
        // replay leaves state-store providers and their maintenance
        // thread alive, skewing subsequent trials of the very
        // construct/execute split this tool measures
        try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
        catch { case scala.util.control.NonFatal(_) => () }
        val heapPeakB = heapPools.map(_.getPeakUsage.getUsed).sum
        def mb(b: Long) = b / 1048576.0
        println(f"$name trial $t: total ${(t1 - t0 + t3 - t2) / 1e9}%.2fs = " +
          f"construct ${(t1 - t0) / 1e9}%.2fs " +
          f"($constructionJobs jobs, ${constructionJobMs / 1e3}%.2fs sched) " +
          f"+ execute ${(t3 - t2) / 1e9}%.2fs " +
          f"(${totalJobs - constructionJobs} jobs, " +
          f"${(totalJobMs - constructionJobMs) / 1e3}%.2fs sched) | " +
          f"mem: peakTask ${mb(lst.peakTaskMem.get)}%.1f MB, " +
          f"heapPeak ${mb(heapPeakB)}%.0f MB, " +
          f"spill mem ${mb(lst.spillMemB.get)}%.0f MB / " +
          f"disk ${mb(lst.spillDiskB.get)}%.0f MB, " +
          f"shuffle r ${mb(lst.shufReadB.get)}%.0f MB / " +
          f"w ${mb(lst.shufWriteB.get)}%.0f MB | " +
          f"canary spin ${canSpin}%.3fs bw ${canBw}%.3fs")
      }
    }
    spark.stop()
  }
}
