package graft.plans

import org.apache.spark.sql.SparkSession

/**
 * One-call registration of every native Catalyst expression the engine
 * ships (minhash signatures, simhash fingerprints, vector dot). Called
 * from the table-access layer so any session that reads a lake table
 * has the functions available; `createOrReplaceTempFunction` is an
 * idempotent map put, so calling per-read is free. Deployments that
 * build their own sessions can instead enable
 * `spark.sql.extensions=graft.plans.GraftExtensions`.
 */
object NativeFns {
  def register(spark: SparkSession): Unit =
    // guard on one name: all four register together, and re-replacing
    // would log a registry WARN per table read
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"))) {
      XxMinHash.register(spark)
      Md5MinHash.register(spark)
      SimHash64.register(spark)
      VecDot.register(spark)
      WordShingles.register(spark)
      SortableDoubleBits.register(spark)
      BloomMightContain.register(spark)
      VecProject.register(spark)
      SrpSig.register(spark)
      LangMarkerCounts.register(spark)
      Ilog2Fx.register(spark)
      ViterbiSeg.register(spark)
      WpGreedy.register(spark)
      HashedFeats.register(spark)
      VecDist2.register(spark)
      Md5Fold31.register(spark)
      HashedGrams.register(spark)
    }
}
