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
  * Scale shape: [[ngramRepetition]] explodes n-grams and aggregates
  * twice — (doc, gram) then doc — so the heavy per-row tokenization is a
  * narrow map and both aggregations combine map-side before their
  * shuffle. [[dupFraction]] is the shuffle-free variant: when only the
  * duplicate fraction is needed (no top-gram share), `array_distinct`
  * computes it per row inside whole-stage codegen with zero exchanges.
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

  /** Per-document repetition metrics over word n-grams: returns
    * `idCols ++ (n_grams, dup_frac, top_share)` where `dup_frac` is the
    * duplicated-gram fraction and `top_share` the share of the single
    * most frequent gram. Docs shorter than n tokens are dropped (they
    * have no n-grams to judge).
    *
    * Two hash aggregations, both with map-side partial combine; the
    * explode is linear in corpus token count — no quadratic per-doc
    * array scans, which is what makes this shape survive 100 TB. */
  def ngramRepetition(df: DataFrame, idCols: Seq[String], textCol: String,
                      n: Int): DataFrame = {
    val ids = idCols.map(col)
    val grams = df
      .select(ids :+ TextAnalysis.wordShingles(col(textCol), n).as("_grams"): _*)
      .filter(size(col("_grams")) > 0)
      .select(ids ++ Seq(size(col("_grams")).as("_total"),
        explode(col("_grams")).as("_gram")): _*)
    grams
      .groupBy(ids ++ Seq(col("_total"), col("_gram")): _*)
      .agg(count(lit(1)).as("_c"))
      .groupBy(ids :+ col("_total"): _*)
      .agg(count(lit(1)).as("_n_distinct"), max(col("_c")).as("_top"))
      .select(ids ++ Seq(
        col("_total").as("n_grams"),
        (lit(1.0) - col("_n_distinct").cast("double") / col("_total"))
          .as("dup_frac"),
        (col("_top").cast("double") / col("_total")).as("top_share")): _*)
  }
}
