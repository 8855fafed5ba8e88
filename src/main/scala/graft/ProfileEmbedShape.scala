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

  /** Widen dim-64 fixtures to 64×`tiles` dims with hash-derived
    * values that are INCOMPRESSIBLE bytes but GEOMETRY-PRESERVING —
    * both properties matter, and each round-10 attempt that had only
    * one of them produced a broken benchmark:
    *
    *  - Round-9 tiling preserved geometry but 16 repeats of the same
    *    64-float block compressed away in shuffle/parquet, and (worse,
    *    discovered this round) the derived fixture carried the BASE
    *    parquet's stats, so the payload join planned as broadcast and
    *    shipped nothing at all.
    *  - Fully random extra dims (first round-10 attempt) are
    *    incompressible but destroy the corpus's cluster structure: SRP
    *    bits go uniform, every 4-bit band bucket holds ~1/16 of the
    *    corpus, candidate generation degenerates toward all-pairs with
    *    8 KB join rows, and the sweep died spilling ~80 GB. (Real
    *    embedding corpora are clustered; LSH banding PRESUPPOSES
    *    that.)
    *
    * So each extra dim = base(region, j) + 0.01·noise(content, j):
    * `region` hashes the vector's 16-bit SRP sign pattern (similar
    * vectors share it, so their extra blocks stay ~identical and band
    * bucket structure matches the dim-64 fixture's), `noise` hashes
    * the exact vector content (distinct vectors differ in every
    * float's mantissa — nothing for LZ4 to find; exact copies under
    * shifted ids stay bit-identical, keeping cosine 1.0 pairs). */
  private def widened(vecs: DataFrame, tiles: Int): DataFrame = {
    val extra = 64 * (tiles - 1)
    def u(seed: org.apache.spark.sql.Column, j: org.apache.spark.sql.Column) =
      pmod(xxhash64(seed, j), lit(2000003L)).cast("double") / 1000001.0 - 1.0
    vecs.select(col("vec_id"), col("embedding"),
        xxhash64(graft.functions.VectorFns.srpSignature(col("embedding"), 16))
          .as("__region"),
        xxhash64(col("embedding")).as("__seed"))
      .select(col("vec_id"),
        concat(col("embedding"),
          transform(sequence(lit(0), lit(extra - 1)), j =>
            (u(col("__region"), j) + u(col("__seed"), j) * 0.01)
              .cast("float"))).as("embedding"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Round-10 discovery: profiling the DERIVED fixture directly is a
    // fiction. Catalyst estimates the widened/scaled plan's size from
    // the BASE parquet's stats (a few MB), so the band self-join in
    // the carryVectors shape planned as a BroadcastHashJoin — the
    // banded corpus, vectors and all, was driver-collected and
    // broadcast, and the b·N payload-shipping term never touched the
    // shuffle at ANY width (the round-9 table's flat 6.2 MB column —
    // previously misread as tiling compression — is just the final
    // pair-distinct). Real deployments store embeddings in the lake;
    // their scans carry real stats and the self-join becomes a
    // payload-shuffling SMJ. So: each fixture is MATERIALIZED to
    // parquet once (outside the timed window) and the shapes profile
    // the read-back table.
    val fixtureRoot = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft_embedshape_${ProcessHandle.current().pid()}")
    def vecsAt(m: Int, tiles: Int): DataFrame = {
      val path = new java.io.File(fixtureRoot, s"d${64 * tiles}_x$m").getPath
      if (!new java.io.File(path, "_SUCCESS").exists()) {
        val v = ProfileScale.scaledVecs(spark, sfDir, m).select("vec_id", "embedding")
        (if (tiles > 1) widened(v, tiles) else v)
          .write.mode("overwrite").parquet(path)
      }
      spark.read.parquet(path)
    }
    // bits=64 (16-bit band keys), NOT the 16-bit/4-bit-key default the
    // small declared fixtures use: LSH band-key width is a function of
    // corpus size, and at 20k vectors a 4-bit key puts ~1/16 of the
    // corpus in EVERY bucket — candidate generation degenerates toward
    // all-pairs (~5M+ candidate pairs), and with materialized 4 KB
    // payloads both shapes then sort tens of GB and die spilling (two
    // round-10 sweeps did exactly that). That is not a shape
    // difference, it is a mis-parameterized operator: at 100 TB the
    // FIRST scale knob is signature width, before any join-shape
    // choice. The shapes are compared at the sizing a real corpus
    // this dense would use.
    val shapes: Seq[(String, DataFrame => DataFrame)] = Seq(
      "old_fanout" -> (v => Dedup.embeddingNearDupPairs(v, threshold = 0.9,
        bits = 64, carryVectors = true)),
      "new_rejoin" -> (v => Dedup.embeddingNearDupPairs(v, threshold = 0.9,
        bits = 64)))

    try {
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
    (1 to 2).foreach { round =>
      cells.foreach { case (tiles, m, name, f) =>
        val s = ProfileScale.profiledOnce(spark)(f(vecsAt(m, tiles)))
        val k = (tiles, m, name)
        if (!best.contains(k) || s.elapsedSec < best(k).elapsedSec) best(k) = s
        // per-cell progress so a died-mid-sweep log is attributable
        System.err.println(f"[embed-shape] round $round dim=${64 * tiles}%4d " +
          f"x$m%-2d $name%-10s ${s.elapsedSec}%6.2fs " +
          f"${s.shuffleWriteMB}%8.1fMB")
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
    } finally {
      // fixtures are wiped even on a crashed sweep — the first
      // round-10 attempt died on a full disk and left its parquet
      // behind on top of the spill debris
      def wipe(f: java.io.File): Unit = {
        if (f.isDirectory)
          Option(f.listFiles()).getOrElse(Array.empty).foreach(wipe)
        f.delete(): Unit
      }
      wipe(fixtureRoot)
      spark.stop()
    }
  }
}
