package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Character n-gram language-model scoring: fit unsmoothed n-gram
  * frequencies on a corpus, score each document by its mean log
  * probability — the cheap proxy for "does this read like the corpus"
  * used to rank candidate training documents (a KenLM-style perplexity
  * filter, reduced to the Spark-expressible core).
  *
  * Capability extension beyond the reference (driver brief): the
  * reference's closest analogue is the per-variable frequency plausibility
  * tables (`/root/reference/dataset_curation.ipynb:cell 61`).
  *
  * Scale shape: the model is a `(gram, count)` table bounded by the
  * n-gram vocabulary (≤ charset^n, thousands of rows for n = 3) — it is
  * fit with one explode + hash-agg over the corpus and is always
  * broadcastable at scoring time, so scoring adds no shuffle on the
  * corpus side beyond the per-doc aggregation.
  */
object NgramLm {

  /** All character n-grams of the normalized text, as an array column.
    * The normalized string binds once per row (single-element `transform`
    * lambda) so the regex normalization is not re-evaluated per window —
    * see [[TextAnalysis.wordShingles]] for the measured rationale. */
  def charNgrams(c: Column, n: Int): Column =
    element_at(
      transform(array(TextAnalysis.normalizeText(c)), t =>
        when(length(t) >= n,
          transform(sequence(lit(1), length(t) - lit(n - 1)),
            i => t.substr(i, lit(n))))
          .otherwise(array(Seq.empty[Column]: _*).cast("array<string>"))),
      1)

  /** Fit the model: `(gram, c)` counts plus the corpus total stamped on
    * every row (a 1-row aggregate cross-joined in — broadcast, no
    * shuffle of the counts). The total is computed arithmetically from
    * normalized lengths — `Σ max(len − n + 1, 0)` — NOT by re-counting
    * the exploded grams: summing counts would re-run the whole corpus
    * explode a second time (Catalyst does not share the unpersisted
    * subtree between the crossJoin's two sides). */
  def fit(df: DataFrame, textCol: String, n: Int): DataFrame = {
    val counts = df.select(explode(charNgrams(col(textCol), n)).as("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("c"))
    val total = df.agg(
      sum(greatest(length(TextAnalysis.normalizeText(col(textCol))) - lit(n - 1),
        lit(0)).cast("long")).as("total"))
    counts.crossJoin(broadcast(total))
  }

  /** Score documents against a fitted model: mean `ln P(gram)` over each
    * document's n-grams (grams absent from the model are impossible by
    * construction when the model was fit on the same corpus; against a
    * FOREIGN model use [[scoreSmoothed]] — here join misses silently
    * drop the gram). Returns `idCols ++ (n_grams, avg_logp)`. */
  def score(df: DataFrame, idCols: Seq[String], textCol: String,
            model: DataFrame, n: Int): DataFrame = {
    val ids = idCols.map(col)
    val docGrams = df
      .select(ids :+ explode(charNgrams(col(textCol), n)).as("gram"): _*)
      .groupBy(ids :+ col("gram"): _*)
      .agg(count(lit(1)).as("dc"))
    docGrams
      .join(broadcast(model), Seq("gram"))
      .groupBy(ids: _*)
      .agg(sum(col("dc")).as("n_grams"),
        (sum(col("dc") * log(col("c").cast("double") / col("total")))
          / sum(col("dc"))).as("avg_logp"))
  }

  /** Score against a FOREIGN model (fit on a different corpus) with
    * add-one / Laplace smoothing: `P(g) = (c_g + 1) / (total + V)` with
    * `c_g = 0` for grams the model never saw and `V` the model's
    * vocabulary size — unseen grams contribute a finite penalty instead
    * of silently dropping out of the mean (which flattered exactly the
    * out-of-domain documents a cross-corpus quality filter exists to
    * catch). Plan shape is [[score]] plus one more 1-row broadcast (the
    * model's `(V, total)` aggregate) and a LEFT join in place of the
    * inner one; the corpus side still shuffles only for the per-doc
    * aggregation. Returns `idCols ++ (n_grams, avg_logp)`. */
  def scoreSmoothed(df: DataFrame, idCols: Seq[String], textCol: String,
                    model: DataFrame, n: Int): DataFrame = {
    val ids = idCols.map(col)
    // max(): `total` is stamped constant on every model row, and max is
    // deterministic where first() is not
    val stats = model.agg(count(lit(1)).as("v"), max(col("total")).as("mtotal"))
    val docGrams = df
      .select(ids :+ explode(charNgrams(col(textCol), n)).as("gram"): _*)
      .groupBy(ids :+ col("gram"): _*)
      .agg(count(lit(1)).as("dc"))
    docGrams
      .join(broadcast(model.select(col("gram"), col("c"))), Seq("gram"), "left")
      .crossJoin(broadcast(stats))
      .groupBy(ids: _*)
      .agg(sum(col("dc")).as("n_grams"),
        (sum(col("dc") *
          log((coalesce(col("c"), lit(0L)) + lit(1L)).cast("double")
            / (col("mtotal") + col("v"))))
          / sum(col("dc"))).as("avg_logp"))
  }
}
