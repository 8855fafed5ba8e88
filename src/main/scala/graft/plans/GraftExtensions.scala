package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * Session-extension entry point: registers the engine's native
 * expressions at session build time, so a deployment enables them with
 * `spark.sql.extensions=graft.plans.GraftExtensions` (or
 * `.withExtensions(new GraftExtensions)`) and every session — SQL or
 * Column API — sees them without per-session registration calls.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("xx_minhash"),
      new ExpressionInfo(classOf[XxMinHash].getName, "xx_minhash"),
      (exprs: Seq[Expression]) => XxMinHash(exprs.head,
        k = FnArgs.intArg("xx_minhash", "k", exprs(1)),
        seed = FnArgs.longArg("xx_minhash", "seed", exprs(2)))))
    ext.injectFunction((
      new FunctionIdentifier("md5_minhash"),
      new ExpressionInfo(classOf[Md5MinHash].getName, "md5_minhash"),
      (exprs: Seq[Expression]) => Md5MinHash(exprs.head,
        k = FnArgs.intArg("md5_minhash", "k", exprs(1)))))
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (exprs: Seq[Expression]) => VecDot(exprs.head, exprs(1),
        pad = FnArgs.flagArg("vec_dot", "pad", exprs.lift(2)))))
    ext.injectFunction((
      new FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (exprs: Seq[Expression]) => WordShingles(exprs.head,
        n = FnArgs.intArg("word_shingles", "n", exprs(1)),
        distinct = FnArgs.flagArg("word_shingles", "distinct", exprs.lift(2)))))
    ext.injectFunction((
      new FunctionIdentifier("sortable_double_bits"),
      new ExpressionInfo(classOf[SortableDoubleBits].getName, "sortable_double_bits"),
      (exprs: Seq[Expression]) => SortableDoubleBits(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
      (exprs: Seq[Expression]) => BloomMightContain(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("vec_project_i64"),
      new ExpressionInfo(classOf[VecProject].getName, "vec_project_i64"),
      (exprs: Seq[Expression]) => VecProject(exprs.head,
        k = FnArgs.intArg("vec_project_i64", "k", exprs(1)),
        dim = FnArgs.intArg("vec_project_i64", "dim", exprs(2)),
        seed = FnArgs.longArg("vec_project_i64", "seed", exprs(3)),
        scale = FnArgs.longArg("vec_project_i64", "scale", exprs(4)))))
    ext.injectFunction((
      new FunctionIdentifier("lang_marker_counts"),
      new ExpressionInfo(classOf[LangMarkerCounts].getName, "lang_marker_counts"),
      (exprs: Seq[Expression]) => LangMarkerCounts(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("ilog2_fx"),
      new ExpressionInfo(classOf[Ilog2Fx].getName, "ilog2_fx"),
      (exprs: Seq[Expression]) => Ilog2Fx(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("viterbi_seg"),
      new ExpressionInfo(classOf[ViterbiSeg].getName, "viterbi_seg"),
      (exprs: Seq[Expression]) => ViterbiSeg(exprs.head, exprs(1),
        nBest = FnArgs.intArg("viterbi_seg", "nBest", exprs(2)))))
    ext.injectFunction((
      new FunctionIdentifier("wp_greedy"),
      new ExpressionInfo(classOf[WpGreedy].getName, "wp_greedy"),
      (exprs: Seq[Expression]) => WpGreedy(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("hashed_feats"),
      new ExpressionInfo(classOf[HashedFeats].getName, "hashed_feats"),
      (exprs: Seq[Expression]) => HashedFeats(exprs.head,
        buckets = FnArgs.longArg("hashed_feats", "buckets", exprs(1)),
        n = FnArgs.intArg("hashed_feats", "n", exprs(2)))))
    ext.injectFunction((
      new FunctionIdentifier("vec_dist2"),
      new ExpressionInfo(classOf[VecDist2].getName, "vec_dist2"),
      (exprs: Seq[Expression]) => VecDist2(exprs.head, exprs(1))))
    ext.injectFunction((
      new FunctionIdentifier("md5_fold31"),
      new ExpressionInfo(classOf[Md5Fold31].getName, "md5_fold31"),
      (exprs: Seq[Expression]) => Md5Fold31(exprs.head)))
    ext.injectFunction((
      new FunctionIdentifier("srp_sig"),
      new ExpressionInfo(classOf[SrpSig].getName, "srp_sig"),
      (exprs: Seq[Expression]) => SrpSig(exprs.head,
        bits = FnArgs.intArg("srp_sig", "bits", exprs(1)),
        dim = FnArgs.intArg("srp_sig", "dim", exprs(2)),
        seed = FnArgs.longArg("srp_sig", "seed", exprs(3)))))
  }
}
