package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.functions.TextAnalysis

/** End-to-end training-corpus curation: the composed funnel a large-scale
  * data pipeline runs before tokenization — quality/length gate, exact
  * dedup, MinHash-LSH near-dup removal — reported as per-stage survivor
  * counts (the funnel metrics every curation run publishes).
  *
  * Stage chain and scale behavior (each stage is one pass over the
  * previous stage's survivors, persisted because it feeds both the next
  * stage and its own funnel aggregate):
  *   1. `s1_raw`      — score every doc once (normalize / token count /
  *                      quality are per-row expressions in one codegen'd
  *                      scan; no shuffle).
  *   2. `s2_quality`  — filter on quality ≥ minQuality AND tokens ≥
  *                      minTokens (narrow; no shuffle).
  *   3. `s3_exact`    — exact dedup on the md5 content fingerprint,
  *                      smallest id canonical (one shuffle on fp).
  *   4. `s4_neardup`  — MinHash(k)+LSH banding candidates, exact-Jaccard
  *                      verified ≥ threshold. Two drop policies:
  *                      greedy (default) drops the greater id of each
  *                      verified pair — one candidate-join, no
  *                      iteration; `transitive = true` runs
  *                      [[Components.connectedComponents]] over the pair
  *                      graph and keeps only each cluster's minimum id,
  *                      so duplicate CHAINS (A~B~C with A≁C) collapse to
  *                      one survivor at the cost of a few propagation
  *                      rounds.
  *
  * Only the LSH stage shuffles more than once, and its keys are band
  * hashes / shingles — cardinality ~docs × bands, never docs², so the
  * funnel stays linear in corpus size at 100 TB.
  */
object Curation {

  /** Run the funnel over `corpus(idCol, textCol)`; returns one row per
    * stage: `(stage, n_docs, n_tokens)` where n_tokens sums surviving
    * whitespace token counts. */
  def funnel(
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.5,
      minTokens: Int = 10,
      shingleSize: Int = 5,
      minhashK: Int = 8,
      rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.3,
      transitive: Boolean = false,
      maxBandDf: Option[Int] = None): DataFrame = {
    require(minhashK % rowsPerBand == 0,
      s"minhashK=$minhashK not divisible by rowsPerBand=$rowsPerBand")

    // one scoring pass; staged projections so normalize/split run once
    val scored = corpus
      .select(col(idCol).as("id"), col(textCol).as("text"),
        TextAnalysis.normalizeText(col(textCol)).as("norm"))
      .select(col("id"), col("text"), col("norm"),
        size(split(col("norm"), " ")).as("n_ws"),
        TextAnalysis.qualityScore(col("text")).as("q"))
      .persist(StorageLevel.MEMORY_AND_DISK)

    val qual = scored
      .filter(col("q") >= minQuality && col("n_ws") >= minTokens)

    // norm is dead after the fingerprint — dropping it halves the
    // persisted footprint (shingleTable re-derives tokens from text)
    val exact = qual
      .withColumn("fp", md5(col("norm")))
      .withColumn("keep_id", min(col("id")).over(Window.partitionBy(col("fp"))))
      .filter(col("id") === col("keep_id"))
      .drop("fp", "keep_id", "norm")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val shingles = TextDedup
      .shingleTable(exact, "id", "text", shingleSize)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val pairs = TextDedup
      .minHashLshPairs(shingles, minhashK, rowsPerBand, jaccardThreshold, maxBandDf)
    val dropIds =
      if (transitive)
        Components.connectedComponents(pairs, "a_id", "b_id")
          .filter(col("id") =!= col("comp")).select(col("id"))
      else
        pairs.select(col("b_id").as("id")).distinct()
    val survivors = exact.join(dropIds, Seq("id"), "left_anti")

    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum(col("n_ws")), lit(0L)).as("n_tokens"))
        .select(lit(name).as("stage"), col("n_docs"), col("n_tokens"))

    stage("s1_raw", scored)
      .unionByName(stage("s2_quality", qual))
      .unionByName(stage("s3_exact", exact))
      .unionByName(stage("s4_neardup", survivors))
      .orderBy(col("stage"))
  }

  /** Per-domain document cap — the crawl-curation quota that keeps one
    * hot domain from dominating a training mix: at most `maxPerDomain`
    * docs per `domainCol` value survive, chosen by a DETERMINISTIC
    * priority (md5 of the id, ties to the id) — rerun-stable and
    * engine-portable, never "first N in scan order".
    *
    * Scale shape: selection runs through the native bounded-heap
    * per-key top-k plan ([[graft.plans.TopKPerKey]]) — partial heaps
    * trim every map partition to k rows per domain BEFORE the shuffle,
    * so a 10⁸-doc domain ships k rows per partition, while the
    * equivalent `row_number() OVER (PARTITION BY domain ...)` window
    * materializes and sorts the entire hot domain in a single task and
    * dies exactly there. The oracle states the window form — same
    * result, the plan is the difference. */
  def domainCap(docs: DataFrame, domainCol: String, idCol: String,
                maxPerDomain: Int): DataFrame = {
    require(maxPerDomain > 0, s"maxPerDomain must be positive, got $maxPerDomain")
    require(!docs.columns.contains("domain_pri"),
      "domainCap stages its priority as 'domain_pri' — rename that input column")
    val prio = docs.withColumn("domain_pri", md5(col(idCol).cast("string")))
    graft.plans.TopKPerKey.of(prio, Seq(domainCol),
        Seq(("domain_pri", false), (idCol, false)), maxPerDomain)
      .drop("domain_pri")
  }
}
