package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-cleaning / correction operators.
  *
  * Reproduces the reference's "known-bad join key" repair semantics
  * (`/root/reference/clean_encounterids.py:31-84`): a small curated issue
  * list maps bad source keys to corrected keys; rows not on the list keep
  * their original key. The reference does this with a pandas left merge +
  * `fillna` (and, for ICNARC ids, a buggy row loop whose *intent* is a
  * keyed lookup — see SURVEY.md §7.4#2). Spark-first shape: broadcast
  * left join + `coalesce`, which keeps the big fact-side scan
  * shuffle-free — the issue list is always dimension-sized.
  */
object KeyCorrection {

  /** Left-join `issues(keyCol, correctedCol)` onto `df` and replace
    * `keyCol` with the corrected value where present.
    * Adds `<keyCol>_original` preserving the raw key
    * (reference: `clean_encounterids.py:74-82`).
    *
    * The issue list is deduplicated on the key before the join (smallest
    * corrected value wins, deterministically): a duplicate key would
    * otherwise silently fan out fact rows through the left join and
    * corrupt downstream counts/sums (ADVICE r1). The reference's curated
    * list assumes uniqueness; here it is enforced.
    */
  def correctKeys(df: DataFrame, issues: DataFrame,
                  keyCol: String, correctedCol: String): DataFrame = {
    val orig = s"${keyCol}_original"
    val uniqueIssues = issues.withColumnRenamed(keyCol, orig)
      .groupBy(col(orig)).agg(min(col(correctedCol)).as(correctedCol))
    df.withColumnRenamed(keyCol, orig)
      .join(broadcast(uniqueIssues), Seq(orig), "left")
      .withColumn(keyCol, coalesce(col(correctedCol), col(orig)))
      .drop(correctedCol)
  }

  /** Variant of [[correctKeys]] where the lookup key and the column
    * being repaired differ: join `issues(joinKey, correctedCol)` on
    * `joinKey` and overwrite `targetCol` where a correction exists —
    * the reference's WW repair *intent* (replace `CIS Patient ID` for
    * records whose `ICNARC number` is on the issue list;
    * `clean_encounterids.py:43-50`, whose row loop tests Series *index*
    * membership — a latent bug this keyed join does not replicate). */
  def correctVia(df: DataFrame, issues: DataFrame, joinKey: String,
                 targetCol: String, correctedCol: String): DataFrame = {
    val uniqueIssues = issues
      .groupBy(col(joinKey)).agg(min(col(correctedCol)).as(correctedCol))
    df.withColumnRenamed(targetCol, s"${targetCol}_original")
      .join(broadcast(uniqueIssues), Seq(joinKey), "left")
      .withColumn(targetCol, coalesce(col(correctedCol), col(s"${targetCol}_original")))
      .drop(correctedCol)
  }

  /** Null-safe default fill: `coalesce(col, lit(default))`
    * (reference: `Explanation.fillna('NA')`, `clean_encounterids.py:78`). */
  def fillDefault(c: Column, default: String): Column = coalesce(c, lit(default))

  /** Prioritized 3-way coalesce — the reference's in-hospital mortality
    * derivation *intent* (`clean_encounterids.py:274-291`, whose row loop
    * crashes when all three are null; we implement the documented intent). */
  def threeWayCoalesce(first: Column, second: Column, third: Column): Column =
    coalesce(first, second, third)
}
