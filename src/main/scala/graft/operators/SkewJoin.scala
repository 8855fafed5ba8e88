package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Salted equi-join for skewed keys: when one join key carries a
 * disproportionate share of the fact rows (one hot metric series, one
 * viral document), a plain hash join sends the whole hot key to one
 * task. Salting spreads the hot side over `salts` sub-keys and
 * replicates the (small or moderate) build side once per salt —
 * turning a straggler task into `salts` parallel ones.
 *
 * AQE's skew-join handling covers sort-merge joins automatically
 * (enabled in the session); this operator is the explicit form for
 * when the optimizer can't see the skew (e.g. post-explode keys) or
 * the build side must stay a shuffle join.
 */
object SkewJoin {

  /** Inner equi-join of `fact` (skewed) with `dim` on `key`. */
  def saltedEquiJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
