package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interval union / coverage per key: merge overlapping (or touching)
  * `[start, end)` intervals into maximal disjoint "islands" — the
  * genomics bedtools-merge / session-coverage primitive. Billing
  * ("concurrently-covered seconds"), uptime stitching, and span
  * dedup all reduce to it.
  *
  * Algorithm is the running-max island scan: order a key's intervals
  * by (start, end); an interval starts a new island iff its start
  * exceeds the running max of all PRECEDING ends; island ids are the
  * running sum of those start-flags; islands then aggregate to
  * (min start, max end, member count). Intervals that merely touch
  * (`start = prev end`) merge — half-open semantics.
  *
  * Scale shape: ONE hash exchange on the key — both window functions
  * and the island aggregation share the same (key) partitioning and
  * (start, end) sort, so Catalyst plans a single sort and no further
  * shuffle. Keys are independent; skew caps apply as for any window.
  */
object Intervals {

  /** Merge to islands: (key, island, start, end, n_merged).
    *
    * Precondition, ENFORCED: `start ≤ end` per row. A negative-length
    * interval silently corrupts the running-max scan (islands split on
    * garbage boundaries, coverage can go negative), so rather than
    * documenting a silent precondition the end column is routed
    * through a `when(end ≥ start, end).otherwise(raise_error(…))`
    * guard — load-bearing in every downstream use, so column pruning
    * cannot elide it, codegen'd, one comparison per row. Callers with
    * possibly-inverted spans must clamp before calling (see q156).
    * NULL-bounded rows (null start or end) pass through unchecked —
    * they carried no ordering information before the guard existed and
    * still don't; the running-max scan treats them as open rows the
    * same way it always did. */
  def mergeIntervals(df: DataFrame, keyCol: String, startCol: String,
                     endCol: String): DataFrame = {
    val endChecked = when(
      col(endCol).isNull || col(startCol).isNull || col(endCol) >= col(startCol),
      col(endCol))
      .otherwise(raise_error(concat(
        lit(s"Intervals.mergeIntervals: end < start ($endCol < $startCol) at key "),
        col(keyCol).cast("string"))))
    val src = df.withColumn(endCol, endChecked)
    val w = Window.partitionBy(col(keyCol)).orderBy(col(startCol), col(endCol))
    val prevMax = max(col(endCol)).over(w.rowsBetween(Window.unboundedPreceding, -1))
    src
      .withColumn("_new_island",
        when(prevMax.isNull || col(startCol) > prevMax, 1L).otherwise(0L))
      .withColumn("island",
        sum(col("_new_island")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(col(startCol)).as("start"), max(col(endCol)).as("end"),
        count(lit(1)).as("n_merged"))
  }

  /** Per-key coverage summary over the merged islands: island count,
    * total covered length, and the longest island. */
  def coverage(df: DataFrame, keyCol: String, startCol: String,
               endCol: String): DataFrame =
    mergeIntervals(df, keyCol, startCol, endCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("end") - col("start")).as("covered"),
        max(col("end") - col("start")).as("longest"))
}
