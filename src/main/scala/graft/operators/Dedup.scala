package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record-merge deduplication: collapse fragmented per-entity rows into
  * one row per key.
  *
  * Reference: `combine_non_unique_philips_encounters`
  * (`/root/reference/clean_encounterids.py:129-191`) merges duplicate
  * ICU-stay fragments with a per-column aggregation recipe — `first`,
  * `min(inTime)`, `max(outTime)`, `sum(lengthOfStay)`, plus a "concat"
  * variant adding `count` and `collect_list`, and a custom `_get_err`
  * aggregate (first value != 'NA', else 'NA',
  * `clean_encounterids.py:122-127`).
  *
  * Spark-first notes (SURVEY.md §2.4 A1-A3):
  *  - pandas `first` is "first non-null in file order"; Spark's `first()`
  *    is nondeterministic after a shuffle. We use `min_by(col, orderCol)`
  *    against an explicit stable ordering column, which is deterministic
  *    and needs no extra window/shuffle beyond the one groupBy.
  *  - the concat variant's pandas MultiIndex flattening becomes plain
  *    column aliases.
  *  - all of these are single hash-aggregations: one shuffle on the key,
  *    map-side partial aggregation for the min/max/sum/count parts.
  */
object Dedup {

  /** Deterministic stand-in for order-sensitive `first`: value of `c` on
    * the row with the smallest `ord` in the group. `ord` must be unique
    * per row (e.g. a primary key or `monotonically_increasing_id` stamped
    * at ingest) for full determinism. */
  def firstBy(c: Column, ord: Column): Column = min_by(c, ord)

  /** `_get_err` intent: first group value different from `default`, else
    * `default`. Deterministic variant (min over the non-default values,
    * which is order-free). Reference: `clean_encounterids.py:122-127`. */
  def firstNonDefault(c: Column, default: String): Column =
    coalesce(min(when(c =!= default, c)), lit(default))

  /** Sorted, comma-joined group values — the deterministic Spark shape of
    * the reference's `collect_list` concat-dedup
    * (`clean_encounterids.py:133-141`). Sorting removes the
    * arrival-order nondeterminism `collect_list` has after a shuffle. */
  def sortedConcat(c: Column): Column =
    array_join(sort_array(collect_list(c.cast("string"))), ",")

  /** "simple" merge: caller supplies the per-column aggregation recipe;
    * this is just the canonical groupBy shape with key uniqueness as the
    * post-condition (checked by Validation.duplicateKeys). */
  def combine(df: DataFrame, key: Seq[String], aggs: Seq[Column]): DataFrame = {
    require(aggs.nonEmpty, "Dedup.combine needs at least one aggregate column")
    df.groupBy(key.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
