package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Repetition-based document quality filters (Gopher-style): the
  * fraction of a document made of repeated word n-grams is the classic
  * signal for boilerplate, keyboard mashing, and template spam in
  * web-scale training corpora.
  *
  * Capability extension beyond the reference (driver brief) — the
  * reference's quality checks are row-count/uniqueness invariants
  * (`/root/reference/clean_encounterids.py:97-120`); this generalizes
  * them to content-level quality.
  *
  * Scale shape: the metrics are doc-LOCAL — no cross-document state —
  * so they are computed narrowly per row (sort the gram array, count
  * distincts and the longest equal-run with one fold) inside the scan
  * projection: ZERO shuffles for the per-doc table, where an
  * explode + (doc, gram) re-aggregation would move every corpus token
  * through two exchanges. Per-doc work is O(tokens · log tokens); a
  * document always fits its executor (the text column already does).
  */
object QualityFilters {

  /** Per-row duplicated-n-gram fraction, computed narrowly (no shuffle):
    * `1 − |distinct grams| / |grams|`. Null for docs shorter than n
    * tokens. */
  def dupFraction(text: Column, n: Int): Column =
    element_at(
      transform(array(TextAnalysis.wordShingles(text, n)), g =>
        when(size(g) > 0,
          lit(1.0) - size(array_distinct(g)).cast("double") / size(g))),
      1)

  /** Longest equal-element run in an ALREADY-SORTED array = count of the
    * most frequent element: one sequential fold carrying (prev value,
    * current run, best run). */
  private def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x <=> acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Per-document repetition metrics over word n-grams: returns
    * `idCols ++ (n_grams, dup_frac, top_share)` where `dup_frac` is the
    * duplicated-gram fraction and `top_share` the share of the single
    * most frequent gram. Docs shorter than n tokens are dropped (they
    * have no n-grams to judge). Purely narrow — the gram array binds
    * once per row, is sorted once, and both metrics fall out of
    * `array_distinct` + the run-length fold. */
  def ngramRepetition(df: DataFrame, idCols: Seq[String], textCol: String,
                      n: Int): DataFrame = {
    val ids = idCols.map(col)
    df.select(ids :+ TextAnalysis.wordShingles(col(textCol), n).as("_grams"): _*)
      .filter(size(col("_grams")) > 0)
      .select(ids ++ Seq(
        size(col("_grams")).as("n_grams"),
        (lit(1.0) - size(array_distinct(col("_grams"))).cast("double")
          / size(col("_grams"))).as("dup_frac"),
        (maxRunLength(array_sort(col("_grams"))).cast("double")
          / size(col("_grams"))).as("top_share")): _*)
  }
}
