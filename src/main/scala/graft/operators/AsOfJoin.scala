package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Left as-of join: attach to every left row the single most recent right
  * row with `right.time <= left.time` on matching equi-keys (the temporal
  * "latest observation carried forward" join — e.g. each lab result joined
  * to the most recent prior assessment, the pattern behind the reference's
  * per-stay chart/lab alignment, `dataset_curation.ipynb` cell 44).
  *
  * Implementation is the union + running-window trick, NOT a range join:
  * tag both sides, union, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over a running row frame per key. Cost is one
  * shuffle on the key and O(1) window state per row — no candidate-pair
  * explosion, no per-left-row scan of right history. A naive
  * `left.time >= right.time` range join materialises O(L·R) pairs per key
  * before the arg-max; at 100 TB with hot keys that is the difference
  * between a linear pass and an unrunnable plan. AQE handles moderate key
  * skew; a pathological single hot key would need range-bucketed
  * sub-splits with boundary carry, which this implementation trades away
  * for simplicity.
  *
  * Semantics (matching DuckDB `ASOF JOIN` / pandas `merge_asof`):
  *   - inclusive: a right row at exactly `left.time` matches;
  *   - ties among right rows at the same time resolve to the greatest
  *     `tieBreak` value (deterministic — required for a hash-stable gate);
  *   - unmatched left rows keep null payload columns;
  *   - `tolerance` (an interval expression, e.g. "INTERVAL 1 HOUR") nulls
  *     the payload when the match is older than `left.time - tolerance`;
  *   - time columns must be NON-NULL: a null time sorts to one end of
  *     the scan and would silently match nothing (backward) or
  *     everything-before-it (forward). Filter null times upstream.
  */
object AsOfJoin {

  /** @param on        equi-key column names (present on both sides)
    * @param leftTime  left ordering column (any orderable type)
    * @param rightTime right ordering column (same type as leftTime)
    * @param tieBreak  right column breaking right-time ties (greatest wins)
    * @param rightPrefix prefix for carried right columns in the output
    * @param tolerance optional SQL interval expression; matches further
    *                  than `tolerance` from `leftTime` are nulled out
    * @param direction "backward" (latest right at-or-before, the default)
    *                  or "forward" (earliest right at-or-after — the
    *                  next-observation join; same plan scanning time
    *                  descending)
    * Output: every left column, plus `rightPrefix + c` for each non-key
    * right column (including rightTime and tieBreak).
    */
  def asOf(
      left: DataFrame,
      right: DataFrame,
      on: Seq[String],
      leftTime: String,
      rightTime: String,
      tieBreak: String,
      rightPrefix: String = "right_",
      tolerance: Option[String] = None,
      direction: String = "backward"): DataFrame = {
    require(on.nonEmpty, "AsOfJoin.asOf needs at least one equi-key column")
    require(left.columns.contains(leftTime), s"left is missing time column $leftTime")
    require(right.columns.contains(rightTime), s"right is missing time column $rightTime")
    require(right.columns.contains(tieBreak), s"right is missing tie-break column $tieBreak")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")

    val payloadCols = right.columns.filterNot(on.contains).toSeq
    val keyCols = on.map(col)
    val tieType = right.schema(tieBreak).dataType

    // Tagged union: right rows carry their payload as one struct; left rows
    // carry the full left row. __side orders right (0) before left (1) at
    // equal times so an exactly-simultaneous observation is visible.
    val rightTagged = right.select(
      keyCols ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        col(tieBreak).as("__tie"),
        struct(payloadCols.map(col): _*).as("__payload"),
        lit(null).cast(structType(left)).as("__row")): _*)
    val leftTagged = left.select(
      keyCols ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        lit(null).cast(tieType).as("__tie"),
        lit(null).cast(structType(right, payloadCols)).as("__payload"),
        struct(left.columns.map(col): _*).as("__row")): _*)

    // forward scans time descending: the carried "last right seen" is
    // then the SMALLEST right time ≥ the left time. Either way ties at
    // equal time put right rows first (inclusive bound) and resolve
    // among right rows to the greatest tieBreak (last in __tie-asc scan).
    val tOrder = if (direction == "backward") col("__t").asc else col("__t").desc
    val w = Window
      .partitionBy(keyCols: _*)
      .orderBy(tOrder, col("__side").asc, col("__tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightTagged.unionByName(leftTagged)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val withinTolerance: Column = tolerance match {
      case Some(interval) if direction == "backward" =>
        col(s"__asof.$rightTime") >= col("__row").getField(leftTime) - expr(interval)
      case Some(interval) =>
        col(s"__asof.$rightTime") <= col("__row").getField(leftTime) + expr(interval)
      case None => lit(true)
    }
    val out = left.columns.map(c => col(s"__row.$c").as(c)) ++
      payloadCols.map(c => when(withinTolerance, col(s"__asof.$c")).as(rightPrefix + c))
    carried.select(out: _*)
  }

  private def structType(df: DataFrame): org.apache.spark.sql.types.StructType =
    df.schema

  private def structType(df: DataFrame, cols: Seq[String]): org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))
}
