package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Pairwise association rules (market-basket support / confidence /
 * lift) over (basket, item) rows — the co-occurrence analysis behind
 * "users who error also purchase?" event audits and, pipeline-side,
 * behind tag/topic co-occurrence maps when curating multi-label
 * corpora. This is the A-priori k=2 pass; higher orders compose by
 * re-running over frequent pairs.
 *
 * All three metrics are integer ppm floor divisions, hash-exact
 * across engines. Lift's numerator `10⁶ · n_ab · n_baskets` runs in
 * DECIMAL(38,0) — at 10¹⁰ baskets the long form would overflow at
 * n_ab ≈ 10³ (the [[Profiling.joinCardinality]] lesson: audits must
 * not wrap on exactly the inputs they exist to flag).
 *
 * Scale shape: baskets dedupe to distinct (basket, item) first, so a
 * basket repeating one item 10⁶ times contributes one row. The pair
 * generator is a self-equi-join on basket id with `item_a < item_b` —
 * candidate volume is Σ itemsPerBasket², bounded by the item
 * VOCABULARY per basket (event types, tags), never corpus size. The
 * three count tables then join on tiny item/«item pair» keys.
 */
object AssocRules {

  /** @return (item_a, item_b, n_a, n_b, n_ab, support_ppm,
    *         confidence_ppm — of a→b, lift_ppm) for pairs with
    *         `n_ab >= minCount`, item_a < item_b. */
  def pairs(baskets: DataFrame, basketCol: String, itemCol: String,
      minCount: Long = 1L): DataFrame = {
    val b = baskets.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = b.select(countDistinct(col("__b")).as("__n"))
    val itemCounts = b.groupBy(col("__i")).agg(count(lit(1)).as("__c"))
    val pairCounts = b.as("l").join(b.as("r"),
        col("l.__b") === col("r.__b") && col("l.__i") < col("r.__i"))
      .groupBy(col("l.__i").as("item_a"), col("r.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairCounts
      .join(itemCounts.select(col("__i").as("item_a"), col("__c").as("n_a")),
        Seq("item_a"))
      .join(itemCounts.select(col("__i").as("item_b"), col("__c").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"),
        expr("(1000000L * n_ab) div __n").as("support_ppm"),
        expr("(1000000L * n_ab) div n_a").as("confidence_ppm"),
        // The denominator n_a·n_b gets the same decimal discipline as
        // the numerator: two hot items at ~3·10⁹ counts each would
        // wrap BIGINT·BIGINT before the decimal promotion kicked in.
        expr("CAST((CAST(1000000 AS DECIMAL(38,0)) * n_ab * __n - " +
          "pmod(CAST(1000000 AS DECIMAL(38,0)) * n_ab * __n, " +
          "CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0)))) " +
          "/ (CAST(n_a AS DECIMAL(19,0)) * CAST(n_b AS DECIMAL(19,0))) " +
          "AS BIGINT)").as("lift_ppm"))
  }
}
