package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Report-table operators: frequency/rate tables, completeness,
  * histograms, top-k — the reference's §2 "demonstration analysis"
  * outputs (SURVEY.md §2.4 A4-A12, §2.6).
  *
  * Scale notes: the rate-over-total pattern uses an unpartitioned window
  * `sum over ()`, which is fine *after* aggregation (the windowed input is
  * already group-count-sized, i.e. tiny), never over the raw fact table.
  * Histograms bucket with pure arithmetic (no UDF) so they stay inside
  * whole-stage codegen and reduce map-side.
  */
object Reports {

  /** Frequency table with percentage-of-total
    * (reference: `ipynb:cell 28` mortality rates, cells 33/35/37).
    * The window runs over the aggregated (small) result, not the fact. */
  def freqTable(df: DataFrame, key: String, cnt: Column = lit(1)): DataFrame = {
    val counts = df.groupBy(col(key)).agg(count(cnt).as("cnt"))
    // the empty-partition window DOES plan a single-partition
    // WindowExec (Spark warns) — deliberately safe here: it runs over
    // `counts`, a group-CARDINALITY frame (one row per key value,
    // dimension-sized at any corpus scale), never over the fact table
    counts.withColumn("pct",
      round(lit(100.0) * col("cnt") / sum("cnt").over(Window.partitionBy()), 4))
  }

  /** Per-group distinct-entity completeness vs the global distinct count
    * (reference: `ipynb:cell 57` — fraction of stays with each variable).
    * Exact `countDistinct` here; at 100 TB swap in
    * `approx_count_distinct` (HLL) — same API shape. */
  def completeness(df: DataFrame, groupKey: String, entity: String): DataFrame = {
    val total = df.select(countDistinct(col(entity)).as("total"))
    df.groupBy(col(groupKey)).agg(countDistinct(col(entity)).as("n_entities"))
      .crossJoin(broadcast(total))
      .withColumn("completeness", round(col("n_entities") / col("total"), 4))
      .drop("total")
  }

  /** Fixed-width histogram (reference: `plt.hist(vals, bins=20)`,
    * `ipynb:cells 40,42,65`). Pure-arithmetic bucketing → codegen'd,
    * partial-aggregated map-side; one shuffle of at most `bins` rows. */
  def histogram(df: DataFrame, c: Column, lo: Double, width: Double): DataFrame =
    df.select(floor((c - lit(lo)) / lit(width)).cast("int").as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Deterministic top-k: total order (measure desc, then tie-break keys
    * asc) before limit. Spark plans this as TakeOrderedAndProject — no
    * global sort, each partition keeps k rows. */
  def topK(df: DataFrame, k: Int, measure: Column, tieBreak: Column*): DataFrame =
    df.orderBy(measure.desc +: tieBreak.map(_.asc): _*).limit(k)

  /** Sketch-based completeness for the 100 TB path: HyperLogLog++
    * (`approx_count_distinct`) replaces the exact distinct count, whose
    * per-group distinct sets would dominate shuffle volume at scale.
    * Same output shape as [[completeness]]; `rsd` is the target
    * relative standard deviation (accuracy ↔ sketch size). */
  def completenessApprox(df: DataFrame, groupKey: String, entity: String,
                         rsd: Double = 0.05): DataFrame = {
    val total = df.select(approx_count_distinct(col(entity), rsd).as("total"))
    df.groupBy(col(groupKey)).agg(approx_count_distinct(col(entity), rsd).as("n_entities"))
      .crossJoin(broadcast(total))
      .withColumn("completeness", round(col("n_entities") / col("total"), 4))
      .drop("total")
  }

  /** Sketch-based grouped quantiles for the 100 TB path: t-digest-style
    * `percentile_approx` replaces the exact per-group sort. `acc` is
    * the accuracy parameter (1/relative-error). */
  def quartilesApprox(df: DataFrame, key: String, value: Column,
                      acc: Int = 1000): DataFrame =
    df.groupBy(col(key)).agg(
      percentile_approx(value, lit(0.25), lit(acc)).as("p25"),
      percentile_approx(value, lit(0.5), lit(acc)).as("p50"),
      percentile_approx(value, lit(0.75), lit(acc)).as("p75"))

  /** Per-group distinct-count SKETCHES as persistable values (Apache
    * DataSketches HLL via `hll_sketch_agg`): unlike
    * `approx_count_distinct`, whose HLL++ state never surfaces, the
    * sketch lands as a binary column — write it as ordinary rows,
    * reload tomorrow, [[mergeDistinctSketches]] across groups/days, and
    * only then estimate. Same persist→merge lifecycle as the t-digest
    * (TDigest) and the Misra-Gries summaries (HeavyHitters), applied
    * to COUNT(DISTINCT): the three sketch families a 100 TB pipeline
    * maintains incrementally instead of rescanning history. */
  def distinctSketches(df: DataFrame, groupCol: String,
                       entityCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(hll_sketch_agg(col(entityCol)).as("sk"))

  /** Union previously-stored sketches (set union, not sum — overlapping
    * groups count each entity once) and estimate. */
  def mergeDistinctSketches(sketches: DataFrame): DataFrame =
    sketches.agg(hll_union_agg(col("sk")).as("sk"))
      .select(hll_sketch_estimate(col("sk")).as("est"))

  /** Sketch-based heavy hitters for the 100 TB path: a Count-Min sketch
    * of `keyCol` (one distributed merge pass, fixed `eps`/`confidence`-
    * sized state) estimates each candidate's frequency; candidates are
    * the exact distinct keys of a SMALL candidate frame the caller
    * supplies (e.g. yesterday's hitters, or a capped distinct). Estimates
    * only ever OVER-count, so every true heavy hitter above the
    * threshold survives; the exact groupBy is the small-data oracle in
    * the spec. Returns `(key, est)` for estimates ≥ `minCount`. */
  def heavyHittersApprox(df: DataFrame, keyCol: String, candidates: DataFrame,
                         minCount: Long, eps: Double = 0.001,
                         confidence: Double = 0.99): DataFrame = {
    // sketch over the string rendering so build-side and estimate-side
    // hashing agree for any key type
    val sketch = df.stat.countMinSketch(col(keyCol).cast("string"), eps, confidence, seed = 42)
    val bcast = df.sparkSession.sparkContext.broadcast(sketch)
    val est = udf((k: String) => bcast.value.estimateCount(k))
    // the sketch build side silently skips nulls, so a null candidate
    // can never be a heavy hitter — and CountMinSketch.estimateCount
    // throws on null. Drop nulls before probing (they survive distinct).
    candidates.select(col(keyCol)).filter(col(keyCol).isNotNull).distinct()
      .withColumn("est", est(col(keyCol).cast("string")))
      .filter(col("est") >= minCount)
  }
}
