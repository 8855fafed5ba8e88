package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query wall times on
  * SPARK_GRAFT_SF_DIR. Queries run through the same SparkEntry
  * contract the correctness gate uses. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up at the smallest scale factor: pays JIT/codegen
    // compilation and parquet-reader class loading once, so the timed
    // numbers measure steady-state throughput — the regime a long-lived
    // cluster job actually runs in. Falls back to no warm-up if the
    // small fixture isn't present.
    // sf0.01 (not sf0.001) so the row counts are high enough to trigger
    // JIT compilation of every hot loop — a 50-row fixture leaves the
    // interpreter paths cold and the first timed text query pays them.
    val warmDir = Seq("sf0.01", "sf0.001")
      .map(n => new java.io.File(new java.io.File(sfDir).getParentFile, n))
      .find(d => d.isDirectory && d.getPath != new java.io.File(sfDir).getPath)
      .getOrElse(new java.io.File("/nonexistent"))
    val warmupWanted = sys.env.getOrElse("SPARK_GRAFT_WARMUP", "1") != "0"
    val warmedUp = warmupWanted && warmDir.isDirectory
    if (warmedUp) {
      // REVERSE sorted order: the timed loop below runs in sorted
      // order, so warming in reverse puts the first-timed queries'
      // generated code freshest in the JIT/code cache. (Round-4 bench
      // showed the first two timed queries paying ~+0.6 s each purely
      // from warm-up recency — standalone reruns converge to the
      // round-3 numbers — and the penalty grows with query count as
      // the warm-up pass churns more generated classes.)
      SparkEntry.queries.toSeq.sortBy(_._1).reverse.foreach { case (_, fn) =>
        try fn(spark, warmDir.getPath).count()
        catch { case scala.util.control.NonFatal(_) => () }
        spark.catalog.clearCache()
      }
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case scala.util.control.NonFatal(_) => false }
      // caches persisted inside operators are per-query working sets —
      // clear them so a 45-query run doesn't accumulate session storage
      spark.catalog.clearCache()
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    // failed queries report -1 (never a fake wall time) and are listed
    // in "errors" so a broken engine can't benchmark as a fast one
    val qs = results.map { case (k, v, ok) => "\"" + k + "\":" + (if (ok) v else -1.0) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // "warmup" records whether the untimed warm-up pass ran, so
    // cross-round deltas stay attributable (warm vs cold JIT numbers
    // are not comparable).
    println(s"""{"metric":"total","value":$total,"unit":"sec","warmup":$warmedUp,"queries":$qs,"errors":$errors,"sf":"$sfDir"}""")
    spark.stop()
  }
}
