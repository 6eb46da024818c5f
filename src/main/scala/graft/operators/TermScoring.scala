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
}
