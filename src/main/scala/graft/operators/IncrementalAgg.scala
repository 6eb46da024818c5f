package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep a small partial-state table
  * `(keys, _cnt, _sum)` and fold new data into it batch by batch,
  * instead of re-scanning the full history per refresh — the pattern
  * that turns a 100 TB daily rollup into a delta-sized job. Works for
  * any algebraic aggregate (count/sum/min/max and everything derivable
  * from them: mean, rates); holistic aggregates (exact percentiles)
  * need sketches instead ([[Reports.quartilesApprox]]).
  *
  * The reference's analogue is its CSV checkpoint of the slow
  * chartevents stage (`/root/reference/dataset_curation.ipynb:cell 50`,
  * "processing this large table is slow") — a materialization it can
  * only reuse wholesale; partial-state maintenance is the composable
  * form.
  */
object IncrementalAgg {

  /** Collapse a batch to per-key partial state. One hash aggregation,
    * map-side combined — the output is keys-cardinality small. */
  def partial(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("_cnt"), sum(col(valueCol)).as("_sum"))

  /** Merge partial states (previous state ∪ new deltas) into one state:
    * counts and sums add. The shuffle moves only state rows, never
    * facts. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "IncrementalAgg.merge needs at least one state")
    states.reduce(_.unionByName(_))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_cnt")).as("_cnt"), sum(col("_sum")).as("_sum"))
  }

  /** Publish state as user-facing aggregates: n, total, mean. */
  def finish(state: DataFrame): DataFrame =
    state.select(state.columns.filterNot(_.startsWith("_")).map(col) ++ Seq(
      col("_cnt").as("n"), col("_sum").as("total"),
      (col("_sum") / col("_cnt")).as("mean")): _*)
}
