package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable CUSUM peak detection — the two-level prefix-scan
  * decomposition of the change-detection statistic `S_i = Σ(x_j − x̄)`.
  *
  * The naive form (one running-sum window partitioned by the series
  * key, see q163) is correct but collapses to |keys| sequential tasks:
  * with 5 event types and 10⁹ rows, 5 tasks each sort and scan 2·10⁸
  * rows — measured ×17 at the ×100 probe, unrunnable at 100 TB. This
  * operator re-partitions the scan by (key, TIME BUCKET): local
  * windows compute per-bucket prefixes in parallel, per-bucket sums
  * roll into carry-in offsets through a tiny (keys×buckets)-sized
  * window, and the global statistic reassembles as
  * `S′_i = n·(carry_sum + local_prefix_i) − (carry_n + local_rn)·total`
  * — the mean-centred prefix SCALED BY n (positive), so argmax and
  * peak structure are preserved while everything stays EXACT integer
  * arithmetic (inputs are fixed-point cents; decimal(38,0) kills
  * overflow at any realistic n·Σ). Exactness is what makes the
  * decomposition gateable: two-level ≡ single-level bit-for-bit, no
  * float-rounding seam (the q169 oracle replays the single-level
  * integer form).
  *
  * Peak location: within a bucket the global-|S′| extreme is always
  * the bucket's max-S′ or min-S′ row (carry is constant across the
  * bucket), so per-bucket argmax/argmin candidates (earliest-time
  * tie-break via lexicographic struct extremes) suffice; the final
  * pick scans 2·buckets candidate rows per key.
  *
  * Scale shape: parallelism = keys × buckets (choose `bucketUs` so
  * buckets ≫ cores/keys); one exchange for the local windows, one
  * dimension-sized carry window, broadcast joins back. The operator
  * targets LOW-cardinality keys — high-cardinality series already
  * parallelize under the naive form.
  */
object Cusum {

  /** One-sided CUSUM drift ALARMS — the decision layer over the
    * statistic: upward drift is `S⁺_i = R_i − min_{j≤i} R_j` where
    * `R_i = n·cumsum(cents) − i·total` (the n-scaled mean-centred
    * prefix), because the textbook recursive `max(0, S⁺+x−μ)` form is
    * exactly "distance above the running minimum" — an identity that
    * turns the non-associative recursion into two window functions
    * (running sum + running min), both decomposable by the
    * [[peakByKey]] two-level trick when key cardinality is low. Alarm
    * when S⁺ exceeds `h` = `hPermille`·n·|total|/1000 — an exact
    * integer threshold in the same scaled units, no σ estimate and no
    * float surface. Emits per key: n, alarm count (no reset — the pure
    * exceedance count), and the earliest alarm time (null when the
    * series never drifts). Degenerate edge: a series summing to
    * exactly zero has h = 0, so every positive S⁺ alarms — a zero-mean
    * signal needs an absolute threshold, not a mean-relative one; pick
    * the reference level upstream. */
  def upwardAlarms(df: DataFrame, keyCol: String, tusCol: String,
                   tieCol: String, centsCol: String,
                   hPermille: Int): DataFrame = {
    require(hPermille > 0, s"hPermille must be positive, got $hPermille")
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tusCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val totals = df.groupBy(col(keyCol))
      .agg(sum(col(centsCol).cast(dec)).as("__total"),
        count(lit(1)).cast(dec).as("__n"))
    val scored = df.join(broadcast(totals), Seq(keyCol))
      .withColumn("__r",
        col("__n") * sum(col(centsCol).cast(dec)).over(w) -
          count(lit(1)).over(w).cast(dec) * col("__total"))
      // the recursion starts at S⁺₀ = 0, i.e. the running min includes
      // the EMPTY prefix R₀ = 0 — hence least(·, 0)
      .withColumn("__rmin", least(min(col("__r")).over(w), lit(0).cast(dec)))
      .withColumn("__splus", col("__r") - col("__rmin"))
      // compare 1000·S⁺ > n·|total|·hPermille — cross-multiplied so the
      // threshold stays an exact integer product, never a division
      .withColumn("__alarm",
        lit(1000) * col("__splus") > col("__n") * abs(col("__total")) * hPermille)
    scored.groupBy(col(keyCol))
      .agg(first(col("__n").cast("long")).as("n"),
        sum(when(col("__alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("__alarm"), col(tusCol))).as("first_alarm_tus"))
  }

  /** [[upwardAlarms]] decomposed two-level, the [[peakByKey]] recipe
    * applied to BOTH running statistics: R decomposes as carry + local
    * prefix; the running min of R at row i is
    * `least(min over PREVIOUS buckets of that bucket's min R,
    * current bucket's local running min of R, 0)` — bucket-level mins
    * aggregate without an extra exchange (the rows are already
    * (key, bucket)-clustered for the local windows), roll through one
    * dimension-sized window, and broadcast back. One fact exchange
    * total; parallelism keys×buckets. Alarm semantics and output are
    * IDENTICAL to [[upwardAlarms]] (exact integers — q179 gates both
    * against one oracle). */
  def upwardAlarmsScalable(df: DataFrame, keyCol: String, tusCol: String,
                           tieCol: String, centsCol: String,
                           hPermille: Int, bucketUs: Long): DataFrame = {
    require(hPermille > 0, s"hPermille must be positive, got $hPermille")
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val dec = "decimal(38,0)"
    val b = df.withColumn("__b", expr(s"$tusCol div $bucketUs"))
    val wLoc = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tusCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketAgg = b.groupBy(col(keyCol), col("__b"))
      .agg(sum(col(centsCol).cast(dec)).as("__bsum"),
        count(lit(1)).cast(dec).as("__bn"))
      .localCheckpoint()
    val carries = bucketAgg
      .withColumn("__csum",
        coalesce(sum(col("__bsum")).over(wCarry), lit(0).cast(dec)))
      .withColumn("__cn",
        coalesce(sum(col("__bn")).over(wCarry), lit(0).cast(dec)))
      .select(col(keyCol), col("__b"), col("__csum"), col("__cn"))
    val totals = bucketAgg.groupBy(col(keyCol))
      .agg(sum(col("__bsum")).as("__total"), sum(col("__bn")).as("__n"))
    val withR = b
      .withColumn("__lrun", sum(col(centsCol).cast(dec)).over(wLoc))
      .withColumn("__lrn", count(lit(1)).over(wLoc).cast(dec))
      .join(broadcast(carries), Seq(keyCol, "__b"))
      .join(broadcast(totals), Seq(keyCol))
      .withColumn("__r",
        col("__n") * (col("__csum") + col("__lrun")) -
          (col("__cn") + col("__lrn")) * col("__total"))
      .withColumn("__lminr", min(col("__r")).over(wLoc))
    // bucket-level R minima: aggregation over the ALREADY-clustered
    // rows (no exchange), then one dimension-sized running window
    val bmins = withR.groupBy(col(keyCol), col("__b"))
      .agg(min(col("__r")).as("__bminr"))
      .withColumn("__prevmin", min(col("__bminr")).over(wCarry))
      .select(col(keyCol), col("__b"), col("__prevmin"))
    withR.join(broadcast(bmins), Seq(keyCol, "__b"))
      .withColumn("__rmin",
        least(coalesce(col("__prevmin"), col("__r")), col("__lminr"),
          lit(0).cast(dec)))
      .withColumn("__alarm",
        lit(1000) * (col("__r") - col("__rmin")) >
          col("__n") * abs(col("__total")) * hPermille)
      .groupBy(col(keyCol))
      .agg(first(col("__n").cast("long")).as("n"),
        sum(when(col("__alarm"), 1L).otherwise(0L)).as("n_alarms"),
        min(when(col("__alarm"), col(tusCol))).as("first_alarm_tus"))
  }

  /** Peak |S| per key: (key, n, peak_dev: decimal(38,0) = n-scaled
    * |S| at the peak, peak_tus = earliest time achieving it).
    * `centsCol` must be an exact integer (fixed-point) value column;
    * ties on `tusCol` break by `tieCol`. */
  def peakByKey(df: DataFrame, keyCol: String, tusCol: String,
                tieCol: String, centsCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"bucketUs must be positive, got $bucketUs")
    val dec = "decimal(38,0)"
    val b = df.withColumn("__b", expr(s"$tusCol div $bucketUs"))
    val wLoc = Window.partitionBy(col(keyCol), col("__b"))
      .orderBy(col(tusCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wCarry = Window.partitionBy(col(keyCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // cast BEFORE summing: a long-typed sum would wrap (or throw under
    // ANSI) once a key's Σcents passes 2^63 — exactly the regime the
    // decimal lane exists for. The (keys×buckets) bucket aggregate is
    // materialized once (localCheckpoint: it is dimension-sized) and
    // feeds BOTH the carry window and the per-key totals, so the fact
    // table is scanned once for it, not twice.
    val bucketAgg = b.groupBy(col(keyCol), col("__b"))
      .agg(sum(col(centsCol).cast(dec)).as("__bsum"),
        count(lit(1)).cast(dec).as("__bn"))
      .localCheckpoint()
    val carries = bucketAgg
      .withColumn("__csum",
        coalesce(sum(col("__bsum")).over(wCarry), lit(0).cast(dec)))
      .withColumn("__cn",
        coalesce(sum(col("__bn")).over(wCarry), lit(0).cast(dec)))
      .select(col(keyCol), col("__b"), col("__csum"), col("__cn"))
    val totals = bucketAgg.groupBy(col(keyCol))
      .agg(sum(col("__bsum")).as("__total"), sum(col("__bn")).as("__n"))
    val s = b
      .withColumn("__lrun", sum(col(centsCol).cast(dec)).over(wLoc))
      .withColumn("__lrn", count(lit(1)).over(wLoc).cast(dec))
      .join(broadcast(carries), Seq(keyCol, "__b"))
      .join(broadcast(totals), Seq(keyCol))
      .withColumn("__s",
        col("__n") * (col("__csum") + col("__lrun")) -
          (col("__cn") + col("__lrn")) * col("__total"))
    val cand = s.groupBy(col(keyCol), col("__b"))
      .agg(max(struct(col("__s").as("v"), (-col(tusCol)).as("nt"))).as("hi"),
        min(struct(col("__s").as("v"), col(tusCol).as("t"))).as("lo"))
      .select(col(keyCol), explode(array(
        struct(abs(col("hi.v")).as("dev"), (-col("hi.nt")).as("tus")),
        struct(abs(col("lo.v")).as("dev"), col("lo.t").as("tus")))).as("c"))
    cand.join(broadcast(totals), Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(first(col("__n").cast("long")).as("n"),
        max(struct(col("c.dev").as("dev"), (-col("c.tus")).as("nt"))).as("m"))
      .select(col(keyCol), col("n"), col("m.dev").as("peak_dev"),
        (-col("m.nt")).as("peak_tus"))
  }
}
