package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Weighted sampling without replacement via priority sampling
 * (Duffield–Lund–Thorup 2007): each row draws a deterministic
 * pseudo-uniform `u` from a content hash and gets priority `u / w`;
 * the k smallest priorities form the sample, so a row's inclusion
 * odds scale with its weight. The corpus-curation use is "sample k
 * documents proportional to token count" for eval-set construction
 * and mixture audits — a plain uniform sample under-represents long
 * documents by exactly the factor the token budget cares about.
 *
 * Determinism over randomness: `u` is the first 48 bits of
 * `md5(salt || id)` — replayable on any engine, stable across runs,
 * and independent of `w` (hashing the weight would correlate draw
 * and size). The priority is integer floor division
 * `(u · 10³) div w` — no float, so ranking and therefore the sample
 * set are hash-exact across engines (10³ keeps the product under
 * 2^58: u is 48 bits, and 10⁶ would overflow a long). Ties (same
 * priority) break on the id for a total order.
 *
 * Scale shape: priorities are a narrow map over the input; the
 * global smallest-k is sort-limit, which Spark plans as
 * TakeOrderedAndProject — per-partition top-k heaps then a k·P-row
 * driver merge, never a global sort of the corpus.
 */
object Sampling {

  /** 48-bit uniform from md5 — positive, fits a long exactly. */
  def hash48(c: Column): Column =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  /**
   * @param df        input rows
   * @param weightCol positive integer weight (e.g. token count);
   *                  rows with weight < 1 are dropped
   * @param idCol     unique id — hash salt + tie-break
   * @param k         sample size
   * @return the k sampled rows + (priority, u48) audit columns
   */
  def prioritySample(df: DataFrame, weightCol: String, idCol: String,
      k: Int, salt: String = "psample"): DataFrame = {
    require(k >= 1, "sample size k must be >= 1")
    df.filter(col(weightCol) >= 1)
      .withColumn("u48",
        hash48(concat(lit(salt + ":"), col(idCol).cast("string"))))
      .withColumn("priority",
        expr(s"(u48 * 1000L) div `$weightCol`"))
      .orderBy(col("priority"), col(idCol))
      .limit(k)
  }
}
