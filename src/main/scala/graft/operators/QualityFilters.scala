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

  /** FastText-style hashed linear classifier applied at scan time — the
    * model-based quality scorer (educational-value / toxicity / domain
    * classifiers) every modern curation pipeline runs after the
    * heuristic gates: each token hashes into one of `weights.length`
    * buckets (first 32 md5 bits, mod dim — engine-portable, no feature
    * dictionary to ship), and the document scores
    * `sigmoid(scale · (Σ w[h(t)] / n_tokens + bias))`.
    *
    * Scale shape: a trained linear model is a few KB–MB, so the weight
    * vector rides the plan as a LITERAL array — no model join, no
    * shuffle, the whole scorer is one sequential per-row fold inside
    * whole-stage codegen; scoring 100 TB is exactly one scan. (A
    * vocabulary-keyed model with per-term columns would broadcast-join
    * instead — that shape is [[TermScoring.oovRate]]'s.) The sequential
    * fold also pins float addition order, so the oracle reproduces the
    * score bit-for-bit before rounding. */
  def linearScore(text: Column, weights: Seq[Double], bias: Double,
                  scale: Double): Column = {
    require(weights.nonEmpty, "linearScore needs a non-empty weight vector")
    val dim = weights.length
    val toks = TextAnalysis.wsTokens(text)
    val wArr = array(weights.map(lit): _*)
    val hit = (t: Column) => element_at(wArr,
      (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % dim + 1).cast("int"))
    val s = aggregate(toks, lit(0.0), (acc, t) => acc + hit(t))
    val z = (s / greatest(size(toks), lit(1)).cast("double") + lit(bias)) * lit(scale)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Token → feature bucket, the [[linearScore]] hash: first 32 md5
    * bits mod `dim` (engine-portable, no dictionary to ship). */
  private[graft] def tokenBucket(t: Column, dim: Int): Column =
    conv(substring(md5(t), 1, 8), 16, 10).cast("long") % dim

  /** DISTRIBUTED logistic-regression fit for the [[linearScore]] model —
    * the training half of the curation loop (score half: q109). Plain
    * full-batch gradient descent as ITERATED AGGREGATION: each epoch is
    * one distributed pass producing a `dim+1`-value gradient, the
    * driver applies the update, and the new weights ride the next
    * epoch's plan as literals — the classic Spark shape for a model
    * that fits in a closure (no MLlib, no parameter server; cf. the
    * published L-BFGS-on-Spark designs, which iterate exactly this
    * collect-broadcast loop). Per epoch: one codegen'd scan computes
    * each doc's `p = σ(Σ w[h(t)]/n + b)`, then the token explode
    * shuffles `(bucket, q)` pairs with map-side combine into `dim`
    * partial sums — at 100 TB that is 2 scans + a dim-row shuffle per
    * epoch, nothing driver-side but the `dim`-length gradient itself.
    *
    * Determinism contract (what makes the DuckDB oracle able to replay
    * the fit EXACTLY, epoch by epoch): per-doc residual contributions
    * are quantized to longs — `q_d = round((p−y)/n · 2²⁰)` — so
    * gradient accumulation is exact integer arithmetic, independent of
    * partitioning and add order; updated weights re-quantize to the
    * 2⁻³⁰ dyadic grid, which makes every next-epoch per-doc
    * Σ w[h(t)] an exact double sum (order-irrelevant). Every other
    * cross-engine operation is IEEE exact-rounded on identical inputs,
    * so the whole trajectory is reproducible arithmetic, not
    * approximately-equal floats. The one transcendental (`exp`) sits
    * behind the ·2²⁰ rounding, where a 1-ulp cross-engine difference
    * cannot move the integer except on a measure-zero boundary.
    * Quantization costs ≤ 2⁻²⁰ per-doc gradient error and ≤ 2⁻³⁰
    * weight error — noise relative to GD's own step error. The
    * gradient is the MEAN over docs (scale-invariant: the same lr
    * works at sf0.001 and at 100 TB). Returns `(weights, bias)`. */
  def logisticFit(df: DataFrame, textCol: String, labelCol: String,
                  dim: Int, epochs: Int, lr: Double): (Seq[Double], Double) = {
    require(dim > 0 && epochs > 0, s"need dim>0, epochs>0; got ($dim, $epochs)")
    val quant = 1L << 20
    val wQuant = (1L << 30).toDouble
    // round-half-away-from-zero onto the 2^-30 grid — matches SQL round()
    def grid(x: Double): Double =
      math.copySign(math.floor(math.abs(x) * wQuant + 0.5), x) / wQuant
    val base = df.select(col(labelCol).cast("double").as("y"),
        TextAnalysis.wsTokens(col(textCol)).as("tk"))
      .withColumn("n", greatest(size(col("tk")), lit(1)).cast("double"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nDocs = base.count().toDouble
      var w = Vector.fill(dim)(0.0)
      var b = 0.0
      for (_ <- 1 to epochs) {
        val wArr = array(w.map(lit): _*)
        val zSum = aggregate(col("tk"), lit(0.0), (acc, t) =>
          acc + element_at(wArr, (tokenBucket(t, dim) + 1).cast("int")))
        val p = lit(1.0) / (lit(1.0) + exp(-(zSum / col("n") + lit(b))))
        val scored = base.select(col("tk"), col("n"),
          round((p - col("y")) * quant).cast("long").as("qb"),
          round((p - col("y")) / col("n") * quant).cast("long").as("q"))
        val gradB = scored.agg(sum(col("qb"))).head.getLong(0)
        val gradW = scored.select(explode(col("tk")).as("t"), col("q"))
          .groupBy(tokenBucket(col("t"), dim).as("bkt"))
          .agg(sum(col("q")).as("s"))
          .collect().map(r => r.getLong(0).toInt -> r.getLong(1)).toMap
        w = Vector.tabulate(dim)(j =>
          grid(w(j) - lr * (gradW.getOrElse(j, 0L).toDouble / (quant * nDocs))))
        b = grid(b - lr * (gradB.toDouble / (quant * nDocs)))
      }
      (w, b)
    } finally { base.unpersist(): Unit }
  }
}
