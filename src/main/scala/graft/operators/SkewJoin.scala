package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for cluster-scale joins and aggregations.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) handles most skew at runtime; these explicit shapes
  * are for the cases AQE cannot fix — a single pathological key inside
  * one shuffle partition of a shuffled join, or a hot-key aggregation
  * whose partial-agg state itself overwhelms one task.
  *
  * Both shapes preserve exact results: salting only changes *where*
  * rows meet, never which rows meet.
  */
object SkewJoin {

  /** Salted equi-join of a skewed fact side against a (non-broadcastable
    * but replicable) dimension side: facts get a deterministic salt in
    * [0, saltFactor) derived from a hash of the whole row, the dim side
    * is exploded ×saltFactor, and the join key becomes (key, salt) — a
    * hot key's rows now spread over saltFactor tasks.
    *
    * Cost model: dim side is replicated saltFactor× (use only when dim
    * ≪ facts but too big to broadcast); fact side gains one narrow
    * column. Prefer `broadcast()` when the dim fits in memory and AQE
    * skew-splitting when skew is moderate. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(facts.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts.join(saltedDim, keys :+ "__salt").drop("__salt")
  }

  /** Two-phase salted aggregation for hot grouping keys: phase 1
    * aggregates on (key, salt) — spreading one hot key's partial state
    * across saltFactor tasks — phase 2 merges the partials. Caller
    * supplies decomposable partial aggregates and the matching final
    * merge over the partial column names (sum→sum, count→sum,
    * min→min, max→max). */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltFactor: Int,
                      partials: Seq[Column], finals: Seq[Column]): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val phase1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    phase1.groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
