package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality checks — the engine's version of the reference's
  * print-based `validation()` (`/root/reference/clean_encounterids.py:97-120`)
  * and the notebook's uniqueness asserts (`ipynb:cell 10`).
  *
  * Everything returns a DataFrame (composable, lazily planned) rather
  * than printing; callers decide whether to `count()`, assert, or sink.
  */
object Validation {

  /** Groups whose key occurs more than once — the dedup post-condition
    * and the reference's `groups[count==2]` inspection. One hash agg. */
  def duplicateKeys(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** True iff `keys` is a primary key of `df`. */
  def isUnique(df: DataFrame, keys: Seq[String]): Boolean =
    duplicateKeys(df, keys).isEmpty

  /** Row/distinct/null-count summary for a key column, mirroring the
    * counts `validation()` prints. Single pass, single row out. */
  def keyProfile(df: DataFrame, key: String): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col(key)).as("n_distinct"),
      count(when(col(key).isNull, 1)).as("n_null"))

  /** Declarative expectation suite in ONE pass: each rule is
    * (name, violation predicate); all rules fold into a single
    * aggregation over one scan — `sum(when(violation, 1))` per rule
    * beside the row count — then unpivot to the tall report
    * (rule, n_violations, n_rows, viol_rate). The
    * great-expectations-style contract check a pipeline runs on every
    * snapshot: N rules cost ONE scan regardless of N, vs the naive
    * one-filter-per-rule N scans. Cross-table rules (referential
    * integrity) enter as predicates over a pre-joined frame — a
    * broadcast left join whose null right side IS the violation
    * column (see q164). Rule names must be plain identifiers (they
    * ride through a `stack` literal). */
  def expectationReport(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "expectationReport needs at least one rule")
    require(rules.forall(_._1.matches("[A-Za-z0-9_]+")),
      s"rule names must be [A-Za-z0-9_]+: ${rules.map(_._1)}")
    require(rules.map(_._1).distinct.size == rules.size,
      s"rule names must be unique: ${rules.map(_._1)}")
    require(!rules.exists(_._1 == "__n_rows"),
      "rule name __n_rows is reserved")
    val agg = df.agg(count(lit(1)).as("__n_rows"),
      rules.map { case (n, v) => sum(when(v, 1L).otherwise(0L)).as(n) }: _*)
    val stackExpr = s"stack(${rules.size}, " +
      rules.map { case (n, _) => s"'$n', `$n`" }.mkString(", ") +
      ") as (rule, n_violations)"
    agg.select(expr(stackExpr), col("__n_rows").as("n_rows"))
      .withColumn("viol_rate", round(col("n_violations") / col("n_rows"), 6))
  }

  /** Attach a key-quality observation to `df`: row count and null count
    * for `key` are collected AS A SIDE EFFECT of whatever action the
    * caller runs next — zero extra passes over the data, which at 100 TB
    * is the difference between free metrics and a second full scan
    * (`keyProfile` is the standalone-pass form). Read the metrics from
    * the returned [[Observation]] after the action completes:
    * `obs.get("n_rows")`. Spark routes them via accumulator-style
    * `CollectMetrics`, so they are exact even under task retries. */
  def observed(df: DataFrame, name: String, key: String): (DataFrame, Observation) = {
    val obs = Observation(name)
    val observedDf = df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(col(key).isNull, 1)).as("n_null"))
    (observedDf, obs)
  }
}
