package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter shape): generate
  * candidate pairs by equi-join on blocking keys, score each pair as the
  * sum of per-field agreement weights, link above a threshold.
  *
  * This is the natural extension of the reference's *deterministic*
  * linkage — ICNARC↔Philips rows are joined on curated keys with a
  * hand-maintained error list (`/root/reference/clean_encounterids.py:
  * 86-95`, `31-53`); when no trustworthy key exists, field-agreement
  * scoring is what record-linkage practice (and the accompanying
  * F1000Research paper's citations) reaches for. Weights are the
  * caller's ln(m/u) estimates per comparator.
  *
  * Scale shape: blocking turns the quadratic all-pairs comparison into
  * one shuffle equi-join whose fan-out is Σ|block|² — choose blocking
  * keys so blocks stay bounded (add more keys or hash-coarsen a
  * continuous column); the scoring itself is a codegen'd per-row
  * expression over the joined frame.
  */
object Linkage {

  /** Candidate pairs: `left` × `right` restricted to equal blocking
    * keys. Left columns come out prefixed `a_`, right columns `b_`.
    * Null block keys never pair (SQL equality) — records with missing
    * blocking fields need a fallback blocking pass, which is standard
    * multi-pass linkage practice. */
  def candidatePairs(left: DataFrame, right: DataFrame,
                     blockKeys: Seq[String]): DataFrame = {
    val a = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"a_$c"))
    val b = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"b_$c"))
    val cond = blockKeys.map(k => col(s"a_$k") === col(s"b_$k")).reduce(_ && _)
    a.join(b, cond)
  }

  /** Score pairs: each comparator is (agreement predicate over the
    * prefixed pair frame, weight); the score is the weight sum of
    * agreeing comparators. */
  def scorePairs(pairs: DataFrame,
                 comparators: Seq[(Column, Double)]): DataFrame = {
    require(comparators.nonEmpty, "Linkage.scorePairs needs comparators")
    val score = comparators.map { case (pred, w) =>
      when(pred, lit(w)).otherwise(lit(0.0))
    }.reduce(_ + _)
    pairs.withColumn("link_score", score)
  }

  /** Full pipeline: block → score → threshold. */
  def link(left: DataFrame, right: DataFrame, blockKeys: Seq[String],
           comparators: Seq[(Column, Double)], threshold: Double): DataFrame =
    scorePairs(candidatePairs(left, right, blockKeys), comparators)
      .filter(col("link_score") >= threshold)

  /** Blocked sorted-neighborhood candidate generation — the linkage
    * blocking method for FUZZY keys that equi-blocking can't catch:
    * sort each block by a similarity-preserving key (name, normalized
    * address, phonetic code) and pair every record with its `w`
    * successors in sort order. Near-identical records land adjacent and
    * pair; candidate volume is `w·n` (linear, caller-bounded), never
    * the `Σ|block|²` an equi-join on a loose key risks.
    *
    * Implemented as `w` `lead` offsets over one (block, sortKeys, id)
    * window — ONE keyed exchange, one sort, no join. The equivalent
    * relational spelling (self-join on `rn` distance ≤ w, which the
    * q160 oracle replays) shuffles the relation twice and joins;
    * identical output, strictly worse plan. Emits (block, id_a, id_b)
    * with `dist` = sort-order gap (1..w); ties in the sort key are
    * ordered by id so pairs are deterministic. Sliding the window
    * ACROSS block boundaries (classic single-sequence SNM) is the
    * degenerate `blockCol = lit(1)` case — at scale prefer real blocks
    * plus a second pass on a rotated key, standard multi-pass
    * practice. */
  def sortedNeighborhoodPairs(df: DataFrame, blockCol: String,
                              sortCols: Seq[String], idCol: String,
                              w: Int): DataFrame = {
    require(w >= 1, s"neighborhood width must be ≥ 1, got $w")
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(blockCol))
      .orderBy(sortCols.map(col) :+ col(idCol): _*)
    val withLeads = (1 to w).foldLeft(df) { (d, k) =>
      d.withColumn(s"__n$k", lead(col(idCol), k).over(win))
    }
    val pairs = explode(array((1 to w).map(k =>
      struct(lit(k).as("dist"), col(s"__n$k").as("id_b"))): _*))
    withLeads
      .select(col(blockCol), col(idCol).as("id_a"), pairs.as("p"))
      .select(col(blockCol), col("id_a"), col("p.id_b"), col("p.dist"))
      .filter(col("id_b").isNotNull)
  }
}
