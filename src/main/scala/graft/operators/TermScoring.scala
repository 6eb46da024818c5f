package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextAnalysis

/** Corpus term weighting (TF-IDF) — the relevance primitive behind
  * keyword extraction, quota selection by topical coverage, and cheap
  * lexical retrieval over a training corpus.
  *
  * Dataflow at scale: one explode over the corpus, one (doc, term)
  * aggregation, and a document-frequency aggregation DERIVED from the
  * term-frequency table (its rows are already distinct (doc, term)
  * pairs, so df = count per term — no second pass over raw text, no
  * countDistinct). The corpus size joins in as a broadcast 1-row
  * aggregate, never a driver-side `.count()`. Shuffle keys are
  * (doc, term) then term — both well-distributed; a boilerplate-heavy
  * corpus would cap term df exactly like [[TextDedup.jaccardPairs]]'s
  * `maxShingleDf` guard.
  */
object TermScoring {

  /** Per-(doc, term) TF-IDF scores: `tf · ln((N+1)/(df+1))`, smoothed so
    * a term present in every document scores just above zero rather than
    * dividing by zero on an empty corpus. Returns
    * `(id, term, tf, df, tfidf)` with tfidf rounded to 4 dp (the
    * cross-engine float-determinism rule). */
  def tfIdf(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("term"))
    val tf = tok.groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(n))
      .select(col("id"), col("term"), col("tf"), col("df"),
        round(col("tf") * log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))), 4)
          .as("tfidf"))
  }

  /** Top-`k` terms per document by (tfidf desc, term asc) — ranked on
    * the ROUNDED score so rank ties are engine-independent. The ranking
    * window partitions by doc id (well-distributed); at selection-only
    * scale the bounded-heap [[graft.functions.TopKAgg]] shape trims
    * map-side first. */
  def topTermsPerDoc(scored: DataFrame, k: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Top-`k` corpus vocabulary by (frequency desc, term asc — the
    * deterministic tie-break): one explode + hash-agg, then a global
    * top-k (`TakeOrderedAndProject`, never a full sort). Returns
    * `(term, c)`. */
  def topVocabulary(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(TextAnalysis.wsTokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term").asc)
      .limit(k)

  /** Per-document out-of-vocabulary rate against a `(term)` vocabulary
    * table: tokens explode, the vocabulary broadcasts (it is top-k-sized
    * by construction), misses count as OOV. Returns
    * `idCols ++ (n_tok, n_oov)` — the coverage signal that decides
    * whether a tokenizer/vocab fits a corpus before training starts. */
  def oovRate(docs: DataFrame, idCols: Seq[String], textCol: String,
              vocab: DataFrame): DataFrame = {
    val ids = idCols.map(col)
    docs.select(ids :+ explode(TextAnalysis.wsTokens(col(textCol))).as("term"): _*)
      .join(broadcast(vocab.select(col("term"), lit(true).as("_in_vocab"))),
        Seq("term"), "left")
      .groupBy(ids: _*)
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("_in_vocab").isNull, 1L).otherwise(0L)).as("n_oov"))
  }
}
