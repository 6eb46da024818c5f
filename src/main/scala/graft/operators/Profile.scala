package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass dataset profiling — the "dataset card" a curation pipeline
  * publishes with every corpus snapshot: per column, row count, null
  * count, distinct count, and numeric min/max (null for non-numeric
  * columns via try_cast). ONE aggregation pass over the data: every
  * column's metrics are computed in a single `agg` (Spark plans the
  * multi-distinct with one expand — still a single scan of the input),
  * collapsed to one row, then exploded to the long `(column, …)` form.
  * Profiling a 100 TB table costs one scan, shuffles only partial
  * aggregates, and sends one metadata-sized row to the planner. */
object Profile {

  def datasetCard(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "datasetCard needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val metrics = cols.map { c =>
      val num = expr(s"try_cast(`$c` as double)")
      struct(lit(c).as("column"),
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("n_null"),
        count_distinct(col(c)).as("n_distinct"),
        round(min(num), 4).as("min_num"),
        round(max(num), 4).as("max_num")).as(s"m_$c")
    }
    df.agg(metrics.head, metrics.tail: _*)
      .select(explode(array(cols.map(c => col(s"m_$c")): _*)).as("m"))
      .select(col("m.column"), col("m.n_rows"), col("m.n_null"),
        col("m.n_distinct"), col("m.min_num"), col("m.max_num"))
  }
}
