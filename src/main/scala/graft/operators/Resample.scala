package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key time-grid resampling with forward fill — the gap-fill every
  * time-series consumer (feature extraction over sensor/event streams,
  * the reference's chartevents-style long tables) needs before
  * fixed-step models can read the data: bucket observations onto a
  * regular `slotSeconds` grid, materialize EVERY slot between each
  * key's first and last observation, and carry the last observed value
  * forward across empty slots.
  *
  * Scale shape:
  *  - slotting is a per-row projection (epoch-second arithmetic — no
  *    timezone semantics on the hot path);
  *  - the grid comes from one `sequence` explode per key, bounded by
  *    span/slotSeconds — never a cross join against a calendar table;
  *  - the forward fill is one window per key over GRID rows (grid ≫
  *    observations only when the series is sparse — exactly when
  *    gap-fill is the point);
  *  - per-slot aggregation is a rounded mean (partial-aggregated
  *    map-side; rounding makes the value engine-reproducible, the q01
  *    precedent).
  *
  * Returns `(key, slot, v_obs, v_fill, filled)` — `v_obs` null on
  * gap slots, `v_fill` the forward-filled value (null only before a
  * key's first observation, which cannot happen here because the grid
  * starts AT the first observation), `filled` true on gap slots. */
object Resample {

  def resampleFill(events: DataFrame, keyCol: String, tsCol: String,
                   valCol: String, slotSeconds: Long): DataFrame = {
    require(slotSeconds > 0, s"slotSeconds must be positive, got $slotSeconds")
    val slotted = events.select(col(keyCol).as("key"),
      floor(col(tsCol).cast("long") / slotSeconds).as("slot"),
      col(valCol).as("v"))
    val perSlot = slotted.groupBy(col("key"), col("slot"))
      .agg(round(avg(col("v")), 4).as("v_obs"))
    val bounds = slotted.groupBy(col("key"))
      .agg(min(col("slot")).as("lo"), max(col("slot")).as("hi"))
    val grid = bounds.select(col("key"),
      explode(sequence(col("lo"), col("hi"))).as("slot"))
    val w = Window.partitionBy(col("key")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(perSlot, Seq("key", "slot"), "left")
      .select(col("key"), col("slot"), col("v_obs"),
        last(col("v_obs"), ignoreNulls = true).over(w).as("v_fill"),
        col("v_obs").isNull.as("filled"))
  }
}
