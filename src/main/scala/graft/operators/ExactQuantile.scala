package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** EXACT order statistics at scale by iterative range bracketing — the
  * third leg of the quantile story: `percentile` buffers every group
  * value (unrunnable at 100 TB), the t-digest ([[graft.functions.TDigest]])
  * is cheap but approximate; this computes the exact k-th value in
  * O(log_B(value range)) full scans with only (keys × B) counting
  * state per pass and NO sort. Selection by bracketing: histogram the
  * active [lo, hi] range into B buckets per key, find the bucket
  * containing the k-th rank, recurse into it with k reduced by the
  * mass below. Integer values ⇒ the bracket shrinks ≥ B-fold per pass
  * (cent-scale data: 2 passes at B = 4096); each pass is one
  * filter+count aggregation, shuffle of keys×B rows.
  *
  * Driver state is (lo, hi, k) per key — the operator targets
  * dimension-cardinality groups (or a global quantile); millions of
  * groups belong to `percentile_approx`/t-digest, not exact selection.
  */
object ExactQuantile {

  /** Value at rank k per key (k 1-based: smallest v with
    * count(≤ v) ≥ k), where k = ceil(q·n) per key. `valCol` must be an
    * integral column (fixed-point). Returns (key, n, rank k, value).
    *
    * DRIVER-STATE BOUND: the bracketing loop keeps ONE driver-side map
    * entry `(lo, hi, kth, n)` PER DISTINCT KEY (the pass-0 `collect`
    * below), and every pass collects up to keys×`buckets` count rows —
    * driver memory and broadcast size are linear in key cardinality,
    * not in data volume. That is the deliberate trade: exact selection
    * over DIMENSION-cardinality groups (event types, regions, status
    * codes — up to `maxKeys`). A high-cardinality key column (user
    * ids, doc ids) belongs on the distributed approximate path —
    * `percentile_approx` or the mergeable t-digest sketch
    * ([[graft.functions.TDigest]], whose state lives in the
    * aggregation buffers, never on the driver) — and the `maxKeys`
    * guard fails fast with that remedy instead of OOMing the driver
    * mid-loop.
    *
    * `maxKeys = 0` (the default) derives the bound FROM `buckets` so
    * the worst-case per-pass collect stays driver-sized regardless of
    * how the caller dials the bucket count: keys×buckets is capped at
    * ~16M count rows (≈ a few hundred MB of driver rows at the
    * default B = 4096 ⇒ 4096 keys). The guard itself reuses the
    * pass-0 aggregate (persisted, counted, then collected) — no
    * separate distinct() scan of the fact table.
    *
    * DEFAULT CHANGE (round 17): the default was a flat `maxKeys =
    * 100000`; it is now 0 = derived (4096 keys at the default bucket
    * count). A caller with 4097–100000 distinct keys who relied on
    * the old default must now size the driver and pass `maxKeys`
    * explicitly — the guard's message says so. Only 0 means
    * "derived"; a negative value is rejected (it was rejected before
    * the change too, and silently repurposing it would hide typos). */
  def atQuantile(spark: SparkSession, df: DataFrame, keyCol: String,
                 valCol: String, q: Double, buckets: Int = 4096,
                 maxKeys: Int = 0): DataFrame = {
    require(q > 0 && q <= 1, s"q must be in (0,1], got $q")
    require(buckets >= 2, s"buckets must be ≥ 2, got $buckets")
    require(maxKeys >= 0,
      s"maxKeys must be ≥ 0 (0 = derived from buckets), got $maxKeys")
    val keyBound =
      if (maxKeys > 0) maxKeys
      else math.max(1, (16L * 1024 * 1024 / buckets).toInt) // maxKeys == 0
    import spark.implicits._

    // nulls are excluded from ranks (standard quantile semantics) —
    // counting them in n while bracketing skipped them would send the
    // driver loop hunting for mass that never lands in any bucket
    val base = df.select(col(keyCol).cast("string").as("k"),
      col(valCol).cast("long").as("v"))
      .where(col("v").isNotNull)
    // pass 0: per-key extent and target rank — the per-distinct-key
    // driver map the scaladoc bounds. The aggregate is persisted so
    // the cardinality guard COUNTS it (distributed, never on the
    // driver) before the collect materializes it driver-side — a
    // high-cardinality key fails with the remedy, not a driver OOM,
    // and the fact table is scanned exactly once for pass 0
    val pass0 = base.groupBy($"k")
      .agg(min($"v").as("lo"), max($"v").as("hi"), count(lit(1)).as("n"))
      .persist()
    var state: Map[String, (Long, Long, Long, Long)] = // k -> (lo, hi, kth, n)
      try {
        val nKeys = pass0.count()
        require(nKeys <= keyBound,
          s"ExactQuantile.atQuantile: $keyCol has $nKeys distinct keys > " +
            s"$keyBound (maxKeys${if (maxKeys > 0) "" else
              s" derived from buckets=$buckets"}) — driver bracketing " +
            "state is per-key; for high-cardinality keys use " +
            "percentile_approx or the t-digest sketch " +
            "(graft.functions.TDigest), whose state stays in the " +
            "executors' aggregation buffers (pass maxKeys explicitly only " +
            "if the driver is provisioned for keys x buckets count rows " +
            "per pass)")
        pass0.collect().map { r =>
          val n = r.getLong(3)
          val kth = math.ceil(q * n).toLong.max(1L)
          r.getString(0) -> (r.getLong(1), r.getLong(2), kth, n)
        }.toMap
      } finally pass0.unpersist(): Unit

    // bracketing passes: scan-count-narrow until every key's range is
    // a single value; each pass shrinks ranges ≥ buckets-fold
    while (state.exists { case (_, (lo, hi, _, _)) => lo < hi }) {
      val active = state.filter { case (_, (lo, hi, _, _)) => lo < hi }
      val bounds = spark.sparkContext.broadcast(active)
      val counts = base
        .flatMap { row =>
          val key = row.getString(0); val v = row.getLong(1)
          bounds.value.get(key) match {
            case Some((lo, hi, _, _)) if v >= lo && v <= hi =>
              // width ≤ range/buckets rounded up keeps bucket < buckets
              val width = ((hi - lo) / buckets) + 1
              Some((key, (v - lo) / width))
            case _ => None
          }
        }
        .toDF("k", "b")
        .groupBy($"k", $"b").agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
      state = state.map {
        case (key, s @ (lo, hi, kth, n)) if lo < hi =>
          val width = ((hi - lo) / buckets) + 1
          val byBucket = counts.getOrElse(key, Array.empty)
            .map(r => r.getLong(1) -> r.getLong(2)).toMap
          var remaining = kth
          var b = 0L
          while (remaining > byBucket.getOrElse(b, 0L)) {
            remaining -= byBucket.getOrElse(b, 0L); b += 1
          }
          val newLo = lo + b * width
          val newHi = math.min(hi, newLo + width - 1)
          key -> (newLo, newHi, remaining, n)
        case other => other
      }
    }
    state.toSeq.map { case (key, (lo, _, _, n)) =>
      (key, n, math.ceil(q * n).toLong.max(1L), lo)
    }.toDF(keyCol, "n", "kth", "value")
  }
}
