package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Embedding-vector functions over Array[Float]/Array[Double] columns.
 * Dot products and norms use functions.aggregate / zip_with — a
 * sequential left-to-right fold, so results are deterministic for a
 * given row (independent of partitioning), which both the DuckDB
 * oracle and any re-run at scale rely on.
 */
object VectorFns {

  /** Sequential dot product of two vectors (double accumulation). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Euclidean norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; null-safe on zero vectors. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = norm(a) * norm(b)
    when(n > 0, d / n)
  }

  /**
   * Sign-random-projection LSH signature: `bits` hyperplane signs
   * packed into a string of '0'/'1'. Hyperplanes are pseudo-random but
   * fully deterministic — component j of plane p is derived from
   * xxhash64(seed, p, j) — so signatures are reproducible across runs
   * and executors with no stored model.
   */
  def srpSignature(vec: Column, bits: Int, seed: Int = 42): Column = {
    val planes = sequence(lit(0), lit(bits - 1))
    val sig = transform(planes, p => {
      val prods = zip_with(vec,
        sequence(lit(0), size(vec) - 1),
        (x, j) => x.cast("double") *
          ((pmod(xxhash64(lit(seed), p, j), lit(2001)) - 1000).cast("double") / 1000.0))
      when(aggregate(prods, lit(0.0), (acc, v) => acc + v) >= 0, "1").otherwise("0")
    })
    array_join(sig, "")
  }

  /** Split an SRP signature into `bands` equal substrings — the LSH
    * band keys two vectors must share (on any band) to become a
    * candidate pair. Returns array<struct<band:int, key:string>>. */
  def srpBands(signature: Column, bands: Int, bits: Int): Column = {
    val width = bits / bands
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        substring(signature, lit(1) + b * width, lit(width)).as("key")))
  }
}
