package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph operators for web-corpus curation. A crawl's host graph
 * is a quality prior: authority-ranked hosts seed frontier ordering
 * and per-domain quality weights (the role centrality scores play in
 * public web-corpus pipelines such as Common Crawl's host-level
 * ranking), feeding [[Corpus.sourceCap]]-style selection with a
 * principled per-source weight instead of a flat cap.
 */
object Graphs {

  /**
   * Fixed-point PageRank — the textbook damped iteration rendered
   * entirely in scaled integers ("rank units" of 1/`scale`), so every
   * iteration is deterministic to the last bit regardless of merge
   * order, partitioning, or engine: float PageRank drifts in the last
   * ulp between reduce orders, which breaks hash-exact verification
   * and makes incremental re-runs non-reproducible (the same trade
   * [[Corpus.unigramDfScore]] documents for LM scoring). Truncating
   * integer division is part of the contract: each iteration loses
   * < 1 rank unit per node to rounding, bounded and identical
   * everywhere.
   *
   * Per iteration: contrib(edge src→dst) = rank(src) div deg(src);
   * rank'(v) = (1000−d)·init div 1000 + d·Σ contrib(v) div 1000, with
   * `d` in permille. Dangling-node mass (nodes with no out-edges) is
   * dropped, matching the classic distributed formulation — ranks are
   * an ORDERING signal, not a probability distribution; callers who
   * need conservation renormalize downstream.
   *
   * Scale shape: edges are deduplicated and materialized ONCE
   * (eagerly — they fan out to the degree table and every iteration's
   * contribution join), and an iteration is one shuffle join of ranks
   * against edges on `src` plus one map-side-combinable integer sum
   * by `dst` — the canonical Spark PageRank loop, with hot hubs
   * (every host links to google.com) riding AQE skew-join on the
   * contribution join and folding into partial sums before the
   * exchange on the aggregation side.
   *
   * @param edges (srcCol, dstCol) directed link table; duplicates
   *              collapse (unweighted graph)
   * @return (node, rank) — rank in units of 1/`scale`
   */
  def pageRankFixedPoint(edges: DataFrame, iters: Int,
      dampingPermille: Long = 850L, scale: Long = 1000000000L,
      srcCol: String = "src", dstCol: String = "dst"): DataFrame = {
    require(iters >= 1, "at least one iteration")
    require(dampingPermille >= 0 && dampingPermille <= 1000,
      "damping is a permille")
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().persist()
    e.count() // eager: fans out to degrees, nodes, and every iteration
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct().persist()
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val n = nodes.count()
    val init = scale / n
    val base = ((1000L - dampingPermille) * init) / 1000L
    var ranks = nodes.withColumn("rank", lit(init))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .join(outDeg, Seq("src"))
        .select(col("dst").as("node"), expr("rank div __deg").as("__c"))
      val summed = contribs.groupBy("node").agg(sum("__c").as("__in"))
      ranks = nodes.join(summed, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"($dampingPermille * coalesce(__in, 0L)) div 1000"))
            .cast("long").as("rank"))
    }
    ranks
  }
}
