package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mergeable t-digest quantile sketch (Dunning's merging-digest form):
  * centroids sized by the q(1-q) scale bound, so tail quantiles keep
  * near-exact resolution while the middle compresses — rank error is
  * O(q(1-q)/δ) for compression δ. The property that matters for the
  * engine: the digest is a VALUE — an aggregation state that can be
  * finished, PERSISTED as ordinary rows, and later merged across
  * shards/partitions/days without touching the raw data again. Spark's
  * built-in `percentile_approx` computes a one-shot approximation but
  * never surfaces its sketch, so incremental maintenance (yesterday's
  * digest + today's delta) and cross-table reuse are impossible with
  * it; this is the same persist-then-merge story as the HLL
  * completeness twin (Reports) and the Misra-Gries heavy-hitter
  * summaries (HeavyHitters), applied to quantiles.
  *
  * Determinism: a t-digest's exact centroid set depends on merge order
  * (Spark's partial-aggregation tree is nondeterministic), so gates
  * never hash raw estimates — they hash rank-error FLAGS with a margin
  * far above the structural bound (see QueriesScale q153), the
  * bounded-error pattern the HLL twin established. `TDigestSpec` pins
  * the bound itself across orderings.
  */
object TDigest {
  /** One centroid: mean and weight (count it stands for). */
  case class Cent(mean: Double, weight: Double)
  /** A finished digest; centroids sorted by mean, n = Σ weight. */
  case class Digest(n: Double, centroids: Seq[Cent])

  val empty: Digest = Digest(0.0, Seq.empty)

  /** Aggregation BUFFER for the point-feeding aggregators: a digest
    * plus the current centroid-list length. `len` exists because the
    * lazy-compress threshold check must be O(1) — the buffer list is a
    * List in the hot path and `.length` would be an O(pending)
    * traversal per input row (up to 8δ = 1600 cells at the default
    * δ=200), exactly the overhead the O(1) prepend is there to avoid.
    * Buffer-only: finish() still emits the plain [[Digest]], so
    * persisted digest schemas are unchanged. */
  case class Buf(n: Double, len: Int, centroids: Seq[Cent])
  private val emptyBuf: Buf = Buf(0.0, 0, Seq.empty)
  private def bufOf(d: Digest): Buf = Buf(d.n, d.centroids.length, d.centroids)

  /** Merge-compress a centroid soup to the δ bound with the k₁ scale
    * function `k(q) = δ/2π · asin(2q−1)`: sort by mean, walk left to
    * right, absorbing neighbours while the combined centroid spans at
    * most one unit of k. k₁'s slope is steepest at the extremes, so
    * tail centroids stay near-singleton (high p99 resolution) while the
    * middle compresses; the total k range is δ/2, which hard-bounds the
    * centroid count at ~δ/2 + 1 regardless of input size. */
  def compress(cents: Seq[Cent], compression: Double): Digest = {
    val sorted = cents.filter(_.weight > 0).sortBy(c => (c.mean, c.weight))
    val n = sorted.iterator.map(_.weight).sum
    if (sorted.isEmpty) return empty
    def kOf(q: Double): Double =
      compression / (2 * math.Pi) *
        math.asin(2 * math.min(1.0, math.max(0.0, q)) - 1)
    val out = Seq.newBuilder[Cent]
    var cur = sorted.head
    var done = 0.0 // weight fully emitted so far
    var kLeft = kOf(0.0)
    sorted.tail.foreach { c =>
      val proposed = cur.weight + c.weight
      if (kOf((done + proposed) / n) - kLeft <= 1.0) {
        // weighted mean; means are finite and weights positive by filter
        cur = Cent((cur.mean * cur.weight + c.mean * c.weight) / proposed, proposed)
      } else {
        out += cur; done += cur.weight; kLeft = kOf(done / n); cur = c
      }
    }
    out += cur
    Digest(n, out.result())
  }

  /** Quantile estimate by linear interpolation between centroid means,
    * treating each centroid's mass as centred on its mean (the standard
    * single-pass inversion). Exact at the extremes when the edge
    * centroids carry weight 1 (which the q(1-q) cap forces). */
  def quantile(d: Digest, q: Double): Double = {
    require(q >= 0 && q <= 1, s"quantile q must be in [0,1], got $q")
    val cs = d.centroids
    if (cs.isEmpty) return Double.NaN
    if (cs.length == 1) return cs.head.mean
    val target = q * d.n
    var cum = 0.0
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      val centre = cum + c.weight / 2
      if (target < centre) {
        if (i == 0) return cs.head.mean
        val p = cs(i - 1)
        val prevCentre = cum - p.weight / 2
        val f = (target - prevCentre) / (centre - prevCentre)
        return p.mean + f * (c.mean - p.mean)
      }
      cum += c.weight
      i += 1
    }
    cs.last.mean
  }

  /** Digest of raw Double values — the shard-building aggregation.
    * Buffered points compress lazily at 8δ so reduce stays amortized
    * O(1) appends between compressions; partial aggregation ships at
    * most ~δ/2 centroids per map partition into the exchange (the k₁
    * bound), never raw rows. */
  class Agg(compression: Double)
      extends Aggregator[Double, Buf, Digest] {
    require(compression >= 20, s"compression too low: $compression")
    override def zero: Buf = emptyBuf
    override def reduce(b: Buf, x: Double): Buf = {
      // PREPEND: centroids is a List in the hot path (zero = Seq.empty,
      // buffers stay deserialized within a partition), so +: is O(1)
      // where :+ would copy the whole buffer per row; compress sorts,
      // so order is irrelevant. The b.len counter keeps the threshold
      // check O(1) per row (no list traversal).
      val cents = Cent(x, 1.0) +: b.centroids
      if (b.len + 1 > 8 * compression) bufOf(compress(cents, compression))
      else Buf(b.n + 1, b.len + 1, cents)
    }
    override def merge(x: Buf, y: Buf): Buf =
      bufOf(compress(x.centroids ++ y.centroids, compression))
    override def finish(b: Buf): Digest =
      compress(b.centroids, compression)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Digest] = Encoders.product[Digest]
  }

  /** WEIGHTED digest — each observation carries a mass (tokens per
    * document, duration per session): the quantile surface then answers
    * "the length such that half the TOKENS sit in shorter documents",
    * not "half the documents are shorter". [[compress]] is already
    * weight-general; this Aggregator just feeds (value, weight) pairs
    * in. Zero/negative weights are dropped (compress filters them) —
    * a weightless observation carries no rank mass by definition. */
  class WeightedAgg(compression: Double)
      extends Aggregator[(Double, Double), Buf, Digest] {
    require(compression >= 20, s"compression too low: $compression")
    override def zero: Buf = emptyBuf
    override def reduce(b: Buf, xw: (Double, Double)): Buf = {
      val cents = Cent(xw._1, xw._2) +: b.centroids
      if (b.len + 1 > 8 * compression) bufOf(compress(cents, compression))
      else Buf(b.n + math.max(0.0, xw._2), b.len + 1, cents)
    }
    override def merge(x: Buf, y: Buf): Buf =
      bufOf(compress(x.centroids ++ y.centroids, compression))
    override def finish(b: Buf): Digest =
      compress(b.centroids, compression)
    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Digest] = Encoders.product[Digest]
  }

  /** Column form: weight-mass digest of (value, weight) columns. */
  def digestAggWeighted(x: Column, w: Column,
                        compression: Double = 200.0): Column =
    udaf(new WeightedAgg(compression),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
      .apply(x, w)

  /** Re-merge of FINISHED digests — the incremental/persisted path:
    * group previously-stored shard digests into coarser rollups
    * (per-day → global) without the raw data. */
  class MergeAgg(compression: Double)
      extends Aggregator[Digest, Digest, Digest] {
    override def zero: Digest = empty
    override def reduce(b: Digest, d: Digest): Digest =
      compress(b.centroids ++ d.centroids, compression)
    override def merge(x: Digest, y: Digest): Digest =
      compress(x.centroids ++ y.centroids, compression)
    override def finish(b: Digest): Digest = b
    override def bufferEncoder: Encoder[Digest] = Encoders.product[Digest]
    override def outputEncoder: Encoder[Digest] = Encoders.product[Digest]
  }

  /** Column form: digest of a Double column. Output struct
    * `{n, centroids: [{mean, weight}…]}` — persistable as-is. */
  def digestAgg(x: Column, compression: Double = 200.0): Column =
    udaf(new Agg(compression), Encoders.scalaDouble).apply(x)

  /** Column form: merge a column of digest structs. A product input
    * encoder makes the UDAF take the case-class FIELDS as separate
    * arguments, so the struct column is passed field-wise. */
  def digestMergeAgg(d: Column, compression: Double = 200.0): Column =
    udaf(new MergeAgg(compression), Encoders.product[Digest])
      .apply(d.getField("n"), d.getField("centroids"))
}
