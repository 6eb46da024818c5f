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
    // tf feeds both the df agg and the final join; session-owned cache —
    // see TextDedup's cache contract (clearCache() between batches)
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

  /** BM25 relevance of every document against a fixed bag of query
    * terms (Robertson et al.'s Okapi BM25, public formula; idf in the
    * never-negative `ln(1 + (N − df + ½)/(df + ½))` form Lucene uses):
    *
    *   score(d) = Σ_{t∈q} idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    *
    * — the lexical-retrieval primitive for seeding topical subsets and
    * quality-mixing a corpus against a reference query set.
    *
    * Dataflow at scale: document length and corpus stats come from one
    * explode + agg; the tf table is filtered to the query terms BEFORE
    * its aggregation, so everything after the first agg is
    * query-sized, and df/stats join in as broadcasts. Returns one row
    * per document with ≥ 1 matching term: `(id, n_terms, bm25)`
    * (rounded to 4 dp — the cross-engine float rule; the ≤|q|-term sum
    * leaves FP error ~1e-15, far under the rounding unit). */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25 needs at least one query term")
    val tok = docs.select(col(idCol).as("id"),
      explode(TextAnalysis.wsTokens(col(textCol))).as("term"))
    // dl feeds stats and the per-doc join; session-owned cache — see
    // TextDedup's cache contract
    val dl = tok.groupBy(col("id")).agg(count(lit(1)).as("dl"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // integer token counts sum exactly in double → avgdl is bit-stable
    // regardless of partial-agg order
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = tok.filter(col("term").isin(queryTerms: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") + lit(k1) *
      (lit(1.0) - lit(b) + lit(b) * col("dl") / col("avgdl"))
    tf.join(broadcast(dfx), Seq("term"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .withColumn("contrib", idf * col("tf") * lit(k1 + 1.0) / norm)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"), round(sum(col("contrib")), 4).as("bm25"))
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
