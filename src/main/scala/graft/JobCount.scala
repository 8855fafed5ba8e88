package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageSubmitted}
import org.apache.spark.sql.SparkSession

/** Optimization-round evidence tool: counts the Spark JOBS and STAGES a
  * query costs end to end — DataFrame construction (where iterative
  * operators run their eager localCheckpoint/collect work) PLUS
  * execution via the bench's `toRdd.count()` action. Final-plan node
  * counts hide this completely: a driver loop's plan shows only the
  * tail reading `Scan ExistingRDD` checkpoint products, while every
  * loop round cost a full cluster job. One line per query:
  * `JOBCOUNT <name> jobs=<n> stages=<n> wall=<s>`.
  *
  * Usage: runMain graft.JobCount <query>[,<query>...]
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobCount <q1,q2,...>")
    val names = args(0).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
        stages.incrementAndGet()
    })
    names.foreach { name =>
      // one untimed warm pass would hide construction jobs; count cold,
      // report wall only as context (job counts are the deterministic
      // signal — they do not depend on host speed)
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      // listener events are delivered async; a short drain pause keeps
      // the counts complete (diagnostic tool — not a timing surface)
      Thread.sleep(1000)
      println(f"JOBCOUNT $name jobs=${jobs.get()} stages=${stages.get()} wall=$dt%.2f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
