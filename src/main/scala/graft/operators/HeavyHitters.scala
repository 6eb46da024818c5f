package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg

/** Exact ε-heavy hitters WITHOUT a full-cardinality shuffle — the
  * two-pass sketch-then-verify shape a 100 TB corpus with 10¹⁰
  * distinct keys needs (domain/token/fingerprint frequency audits):
  *
  *  1. candidate pass: one scan aggregating a [[MisraGriesAgg]]
  *     summary (capacity ⌈1/ε⌉) and the exact row count TOGETHER —
  *     map-side partials are k-entry summaries, so the shuffle carries
  *     `partitions × k` counters, never the key set. MG guarantees the
  *     summary is a SUPERSET of every key with frequency > ε·N.
  *  2. verify pass: exact counts of the ≤ k candidate keys only (an
  *     `isin` literal filter the scan pushes down; partial aggregation
  *     makes the shuffle `partitions × k` rows again), thresholded at
  *     ε·N exactly.
  *
  * The candidate SET depends on partitioning (any MG superset does),
  * but the verified OUTPUT is exact and deterministic — false
  * candidates are trimmed by their exact counts. Driver traffic is one
  * k-entry row (metadata-scale, like the other sketch collects).
  */
object HeavyHitters {

  /** Keys with exact frequency > `eps`·N among `df.select(key)`, as
    * `(key, cnt, freq)` — `cnt` exact, `freq` = cnt/N rounded to 4.
    * Null keys are ignored (no frequency semantics). */
  def heavyHitters(df: DataFrame, key: Column, eps: Double): DataFrame = {
    require(eps > 0 && eps < 1, s"eps must be in (0, 1), got $eps")
    val k = math.ceil(1.0 / eps).toInt
    val keyed = df.select(key.cast("string").as("key")).filter(col("key").isNotNull)
    val probe = keyed
      .agg(MisraGriesAgg(k, col("key")).as("mg"), count(lit(1)).as("n"))
      .head()
    val n = probe.getLong(1)
    val cands: Seq[String] = probe.getStruct(0).getSeq[org.apache.spark.sql.Row](0)
      .map(_.getString(0))
    verifyCandidates(keyed, cands, n, eps)
  }

  /** The exact verify pass over a candidate superset: exact counts of
    * the candidate keys only, thresholded at `eps`·`n`. Shared by
    * [[heavyHitters]] and the streaming path (q143), whose candidates
    * come from a driver-folded per-batch summary — the output is exact
    * for ANY candidate superset, which is what makes the sketch's
    * nondeterminism invisible. */
  def verifyCandidates(keyed: DataFrame, cands: Seq[String], n: Long,
                       eps: Double): DataFrame = {
    if (cands.isEmpty || n == 0L)
      return keyed.sparkSession.emptyDataFrame
        .select(lit("").as("key"), lit(0L).as("cnt"), lit(0.0).as("freq"))
    keyed.filter(col("key").isin(cands: _*))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > lit(eps) * n)
      .select(col("key"), col("cnt"),
        round(col("cnt").cast("double") / n, 4).as("freq"))
  }
}
