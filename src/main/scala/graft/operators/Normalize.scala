package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group distribution normalization for heterogeneous-source
  * mixing: outlier clipping (winsorization) against per-group exact
  * percentiles. One grouped percentile aggregation (the bounds table is
  * group-cardinality-sized → broadcast join back), one narrow clip
  * projection. At 100 TB use [[Normalize.winsorizeApprox]] — same
  * two-step shape, sketch-sized state ([[Normalize.winsorize]]'s exact
  * percentile buffers every group value). */
object Normalize {

  /** Append `<valueCol>_wins` — `valueCol` clipped to its group's
    * [loP, hiP] exact percentile band — plus the band columns `p_lo`,
    * `p_hi`. Group bounds join back via broadcast. */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
                loP: Double, hiP: Double): DataFrame = {
    require(0 <= loP && loP < hiP && hiP <= 1, s"need 0 ≤ loP < hiP ≤ 1, got ($loP, $hiP)")
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, array(${loP}D, ${hiP}D))").as("p_arr"))
      .select(col(groupCol), col("p_arr")(0).as("p_lo"), col("p_arr")(1).as("p_hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_wins",
        least(greatest(col(valueCol).cast("double"), col("p_lo")), col("p_hi")))
  }

  /** [[winsorize]] with sketch-based bounds — the 100 TB path: the
    * exact `percentile` buffers every value of a group in one
    * aggregation buffer, while `percentile_approx` keeps a fixed-size
    * t-digest-style sketch per group and merges map-side. `acc` is the
    * accuracy knob (1/relative-rank-error) — and winsorization clips at
    * TAIL quantiles, where value density is thin and a given rank error
    * costs more value error than at the median, so size acc above the
    * default for tight tails (measured at bench scale: p05 off ~1.5% at
    * acc=1000, within 1% at 10000). The bounded-error gate in
    * `ScaleOpsSpec` pins the approx bounds within tolerance of the
    * exact ones at bench scale, so this path is tested, not just
    * described. */
  def winsorizeApprox(df: DataFrame, groupCol: String, valueCol: String,
                      loP: Double, hiP: Double, acc: Int = 1000): DataFrame = {
    require(0 <= loP && loP < hiP && hiP <= 1, s"need 0 ≤ loP < hiP ≤ 1, got ($loP, $hiP)")
    require(acc > 0, s"accuracy must be positive, got $acc")
    val bounds = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(valueCol), array(lit(loP), lit(hiP)), lit(acc)).as("p_arr"))
      .select(col(groupCol),
        col("p_arr")(0).cast("double").as("p_lo"),
        col("p_arr")(1).cast("double").as("p_hi"))
    df.join(broadcast(bounds), Seq(groupCol))
      .withColumn(s"${valueCol}_wins",
        least(greatest(col(valueCol).cast("double"), col("p_lo")), col("p_hi")))
  }

  /** Append `<valueCol>_filled` — nulls imputed with the group's mean of
    * the present values (the standard curation fill before models that
    * can't take missing features). Same two-step shape as
    * [[winsorize]]: one grouped aggregate (group-cardinality-sized →
    * broadcast back), one narrow coalesce projection. Groups whose
    * values are ALL null stay null — a mean of nothing is not 0. */
  def imputeGroupMean(df: DataFrame, groupCol: String,
                      valueCol: String): DataFrame = {
    val means = df.groupBy(col(groupCol))
      .agg(avg(col(valueCol)).as("_grp_mean"))
    df.join(broadcast(means), Seq(groupCol))
      .withColumn(s"${valueCol}_filled",
        coalesce(col(valueCol).cast("double"), col("_grp_mean")))
      .drop("_grp_mean")
  }

  /** Robust (median/MAD) outlier scoring per group — the resistant
    * alternative to z-scores when the tail itself is what's being
    * hunted: mean and stddev move with every outlier they're supposed
    * to flag, while median and MAD (median absolute deviation) have a
    * 50% breakdown point. Appends the group's `med`, `mad`, the robust
    * score `rz = 0.6745·(x − med)/MAD` (0.6745 = Φ⁻¹(0.75) rescales
    * MAD to σ under normality), and `is_outlier` = |rz| > cut (the
    * conventional 3.5). A zero MAD (more than half the group identical)
    * yields rz null / is_outlier false rather than ±∞.
    *
    * Scale shape: two grouped percentile aggregations (med, then MAD
    * over the residuals) with dimension-sized results broadcast back;
    * the scoring itself is a narrow projection. The exact `percentile`
    * buffers each group's values — at 100 TB swap `percentile_approx`
    * exactly as [[winsorizeApprox]] does, same call shape. */
  def robustZOutliers(df: DataFrame, groupCol: String, valueCol: String,
                      cut: Double = 3.5): DataFrame = {
    require(cut > 0, s"cut must be positive, got $cut")
    val med = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5D)").as("med"))
    val withMed = df.join(broadcast(med), Seq(groupCol))
    val mad = withMed.groupBy(col(groupCol))
      .agg(expr(s"percentile(abs($valueCol - med), 0.5D)").as("mad"))
    withMed.join(broadcast(mad), Seq(groupCol))
      .withColumn("rz",
        when(col("mad") > 0,
          lit(0.6745) * (col(valueCol) - col("med")) / col("mad")))
      .withColumn("is_outlier",
        coalesce(abs(col("rz")) > cut, lit(false)))
  }
}
