package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history construction: collapse an
  * event-sourced attribute stream (key, ts, attr) into versioned
  * validity ranges — one row per RUN of consecutive equal attribute
  * values, `[valid_from, valid_to)` half-open, `valid_to` null for the
  * currently-open version. This is the warehouse-side complement of
  * [[SnapshotDiff]] (which diffs two point-in-time snapshots): here the
  * full change history is derived in one pass from the raw event log,
  * the shape a dimension-table maintenance job needs when the upstream
  * is a CDC/event feed rather than periodic snapshots.
  *
  * Algorithm is gaps-and-islands: a `lag` over (key ORDER BY ts, tie)
  * marks run starts (first row, or attribute differs from its
  * predecessor), runs are numbered with `row_number` over the
  * filtered starts, and `lead` closes each version with the next
  * version's start. Ordering ties on `ts` are broken by `tieCol` so
  * the history is deterministic under at-same-instant events.
  *
  * Scale shape: ONE hash exchange on `keyCol`; all three window
  * functions share that partitioning (same window spec ⇒ Catalyst
  * plans a single sort per partition, no extra shuffle). Keys are
  * independent, so 100 TB of events across 10⁹ users parallelizes to
  * whatever `spark.sql.shuffle.partitions` allows; per-key state is a
  * sort of that key's rows only. Skewed keys (one entity with a
  * pathological event count) are the same hazard as any window — cap
  * upstream or pre-aggregate runs per (key, day) first.
  */
object Scd2 {

  /** Full type-2 history: (key, attr, valid_from, valid_to, version).
    * `valid_to` is the next version's `valid_from` (half-open range),
    * null on the open version; `version` is 1-based per key in
    * chronological order.
    */
  def buildHistory(df: DataFrame, keyCol: String, attrCol: String,
                   tsCol: String, tieCol: String): DataFrame = {
    val order = Seq(col(tsCol), col(tieCol))
    val wLag = Window.partitionBy(col(keyCol)).orderBy(order: _*)
    val starts = df
      .withColumn("_prev", lag(col(attrCol), 1).over(wLag))
      .where(col("_prev").isNull || col("_prev") =!= col(attrCol))
    // the filtered starts reuse the same (key, ts, tie) partitioning +
    // ordering, so version numbering and range closing stay in the
    // one exchange the lag already paid for
    starts
      .withColumn("version", row_number().over(wLag))
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(wLag))
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("version"))
  }

  /** Incremental maintenance: fold a delta of NEW events (all at or
    * after each key's open-version start — the CDC contract) into an
    * existing history. Closed versions are immutable and pass through
    * untouched; each key's OPEN version re-enters the run fold as a
    * synthetic event (tie = Long.MinValue so it orders before any real
    * event at the same instant), the open+delta slice is rebuilt with
    * [[buildHistory]], and rebuilt version numbers shift by the key's
    * already-assigned count. `applyDelta(build(base), delta)` ≡
    * `build(base ∪ delta)` exactly — the invariant q157 gates.
    *
    * Scale shape: the closed history is never re-shuffled or re-sorted
    * — only the open-version slice (one row per live key) plus the
    * delta flows through the window build. A day's increment costs
    * O(live keys + delta), not O(all history); the version-offset join
    * is dimension-sized (open versions) and broadcastable. */
  def applyDelta(history: DataFrame, delta: DataFrame, keyCol: String,
                 attrCol: String, tsCol: String, tieCol: String): DataFrame = {
    val closed = history.filter(col("valid_to").isNotNull)
      .select(col(keyCol), col(attrCol), col("valid_from"),
        col("valid_to"), col("version"))
    val open = history.filter(col("valid_to").isNull)
    val openAsEvents = open.select(col(keyCol), col(attrCol),
      col("valid_from").as(tsCol), lit(Long.MinValue).as(tieCol))
    val slice = openAsEvents.unionByName(
      delta.select(col(keyCol), col(attrCol), col(tsCol),
        col(tieCol).cast("long")))
    val rebuilt = buildHistory(slice, keyCol, attrCol, tsCol, tieCol)
    val offsets = open.select(col(keyCol), (col("version") - 1).as("_voff"))
    rebuilt.join(broadcast(offsets), Seq(keyCol), "left")
      .withColumn("version", (col("version") + coalesce(col("_voff"), lit(0))).cast("int"))
      .drop("_voff")
      .unionByName(closed)
  }

  /** Point-in-time lookup against a built history: the version whose
    * `[valid_from, valid_to)` range covers `at`. Broadcast-friendly when
    * the history is dimension-sized.
    */
  def asOf(history: DataFrame, at: Column): DataFrame =
    history.where(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))
}
