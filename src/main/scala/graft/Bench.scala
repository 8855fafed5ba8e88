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
    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    if (warmedUp) {
      names.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).count()
        catch { case scala.util.control.NonFatal(_) => () }
        spark.catalog.clearCache()
      }
    }
    final case class Timing(name: String, median: Double, min: Double,
        max: Double, ok: Boolean)
    val results = names.map { case (name, fn) =>
      val samples = (1 to trials).map { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case scala.util.control.NonFatal(_) => false }
        // caches persisted inside operators are per-query working sets —
        // clear so trials are independent and a long run doesn't
        // accumulate session storage
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      val ok = samples.forall(_._2)
      val ts = samples.map(_._1).sorted
      val median =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      Timing(name, median, ts.head, ts.last, ok)
    }
    // failed queries report -1 (never a fake wall time) and are listed
    // in "errors" so a broken engine can't benchmark as a fast one
    def f(v: Double) = "%.6f".format(v)
    val qs = results.map(r => "\"" + r.name + "\":" + (if (r.ok) f(r.median) else "-1.0"))
      .mkString("{", ",", "}")
    val spread = results.map(r => "\"" + r.name + "\":[" + f(r.min) + "," + f(r.max) + "]")
      .mkString("{", ",", "}")
    val unstable = results
      .filter(r => r.ok && r.min > 0 && (r.median - r.min) / r.min > 0.2)
      .map(r => "\"" + r.name + "\"").mkString("[", ",", "]")
    val errors = results.collect { case r if !r.ok => "\"" + r.name + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case r if r.ok => r.median }.sum
    // "warmup" records whether the untimed warm-up pass ran, so
    // cross-round deltas stay attributable (warm vs cold JIT numbers
    // are not comparable).
    println(s"""{"metric":"total","value":$total,"unit":"sec","warmup":$warmedUp,"trials":$trials,"queries":$qs,"spread":$spread,"unstable":$unstable,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
