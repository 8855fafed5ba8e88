package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/**
 * Shape-comparison profile for embedding near-dup candidate
 * generation: the round-8 rework deduplicates candidate pairs on IDs
 * and REJOINS the vectors afterwards (two extra equi-joins), where the
 * old shape carried both vectors through the band self-join and the
 * distinct exchange (no rejoin, but every multi-band collision ships
 * the vector payload once per shared band).
 *
 * The trade is width-dependent: at dim-64 (256 B payload) the fan-out
 * is cheap and the rejoin's two extra shuffles can dominate; at
 * dim-1024 (~4 KB payload, the regime production text embeddings live
 * in) the fan-out dominates the exchange. This main measures both
 * shapes at 1× and 10× corpus scale for both widths and prints the
 * numbers PLANS.md cites — the rejoin shape is kept as the default
 * because the engine's target is the wide-vector regime.
 */
object ProfileEmbedShape {

  // The pre-round-8 fan-out shape now lives in Dedup itself as the
  // `carryVectors = true` narrow-vector path, so this profile measures
  // the two REAL code paths rather than a local re-implementation.

  /** Widen dim-64 fixtures to dim-1024 by tiling: cosine structure is
    * preserved (tiling scales both dot and norms by the tile count). */
  private def widened(vecs: DataFrame, tiles: Int): DataFrame =
    vecs.select(col("vec_id"),
      flatten(array_repeat(col("embedding"), tiles)).as("embedding"))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def vecsAt(m: Int, tiles: Int): DataFrame = {
      val v = ProfileScale.scaledVecs(spark, sfDir, m).select("vec_id", "embedding")
      if (tiles > 1) widened(v, tiles) else v
    }
    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "old_fanout" -> (v => Dedup.embeddingNearDupPairs(v, threshold = 0.9,
        carryVectors = true)),
      "new_rejoin" -> (v => Dedup.embeddingNearDupPairs(v, threshold = 0.9)))

    // warm both shapes once so JIT/codegen cost lands outside timings
    shapes.foreach { case (_, f) => f(vecsAt(1, 1)).count() }
    spark.catalog.clearCache()

    // INTERLEAVED min-of-2 (the bench/profile round-9 methodology):
    // back-to-back trials of one cell can both land inside a single
    // multi-second host stall; a full sweep between a cell's samples
    // makes that near-impossible.
    val cells = for {
      tiles <- Seq(1, 16); m <- Seq(1, 10); (name, f) <- shapes
    } yield (tiles, m, name, f)
    val best = scala.collection.mutable.Map.empty[(Int, Int, String),
      graft.ProfileScale.RunStats]
    (1 to 2).foreach { _ =>
      cells.foreach { case (tiles, m, name, f) =>
        val s = ProfileScale.profiledOnce(spark)(f(vecsAt(m, tiles)))
        val k = (tiles, m, name)
        if (!best.contains(k) || s.elapsedSec < best(k).elapsedSec) best(k) = s
      }
    }
    val rows = cells.map { case (tiles, m, name, _) =>
      val s = best((tiles, m, name))
      val line = f"dim=${64 * tiles}%4d x$m%-2d $name%-10s " +
        f"${s.elapsedSec}%6.2fs shuffleW ${s.shuffleWriteMB}%8.1fMB " +
        f"rows ${s.rows}%7d skew ${s.worstSkew}%4.2f"
      System.err.println(s"[embed-shape] $line")
      line
    }
    println(rows.mkString("\n"))
    spark.stop()
  }
}
