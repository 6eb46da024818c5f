package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items summary as a true aggregation — the
  * sketch that finds heavy hitters over a key space too large to
  * group-by: an exact `groupBy(key).count` shuffles EVERY distinct key
  * to a reducer, which at 100 TB with 10¹⁰ distinct keys is the
  * bottleneck by itself. This Aggregator keeps at most `k` counters
  * per buffer, partial-aggregates map-side (each partition contributes
  * a k-entry summary, not its key set), and merges with the
  * summary-merge rule of Agarwal et al. (PODS '12, "Mergeable
  * Summaries"): pointwise-sum, then subtract the (k+1)-th largest
  * count and drop non-positives.
  *
  * Guarantee (classic MG, preserved under this merge): every counter
  * undercounts its key's true frequency by at most N/(k+1), so any key
  * with true count > N/(k+1) SURVIVES in the final summary. With
  * k = ⌈1/ε⌉ the summary is a guaranteed superset of the ε-heavy
  * hitters — which keys beyond those survive depends on partitioning,
  * so the summary itself is NOT deterministic; consumers re-count the
  * candidates exactly ([[graft.operators.HeavyHitters]]) and the final
  * output is.
  */
class MisraGriesAgg(k: Int)
    extends Aggregator[String, MisraGriesAgg.Buf, MisraGriesAgg.Buf] {
  require(k > 0, "capacity must be positive")
  import MisraGriesAgg.{Buf, Entry}

  override def zero: Buf = Buf(Seq.empty)

  override def reduce(buf: Buf, key: String): Buf = {
    if (key == null) return buf // nulls have no frequency semantics
    val idx = buf.items.indexWhere(_.key == key)
    if (idx >= 0)
      Buf(buf.items.updated(idx, Entry(key, buf.items(idx).n + 1)))
    else if (buf.items.length < k)
      Buf(buf.items :+ Entry(key, 1L))
    else // full and absent: decrement all, drop zeros (the MG step)
      Buf(buf.items.map(e => Entry(e.key, e.n - 1)).filter(_.n > 0))
  }

  override def merge(x: Buf, y: Buf): Buf =
    Buf(MisraGriesAgg.mergeItems(k, x.items, y.items))

  override def finish(buf: Buf): Buf = Buf(MisraGriesAgg.canon(buf.items))

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
}

object MisraGriesAgg {
  case class Entry(key: String, n: Long)
  case class Buf(items: Seq[Entry])

  private[functions] def canon(xs: Seq[Entry]): Seq[Entry] =
    xs.sortBy(e => (-e.n, e.key))

  /** The Agarwal et al. summary merge — pointwise-sum, subtract the
    * (k+1)-th largest count, drop non-positives. ONE implementation
    * shared by the Aggregator's partial-merge and by streaming
    * consumers that fold per-batch summaries driver-side
    * (q143): the mergeable-summaries property makes the fold over any
    * batching equal a valid MG(k) of the whole stream. */
  def mergeItems(k: Int, x: Seq[Entry], y: Seq[Entry]): Seq[Entry] = {
    val summed = (x ++ y).groupBy(_.key)
      .map { case (key, es) => Entry(key, es.map(_.n).sum) }.toSeq
    if (summed.length <= k) canon(summed)
    else {
      val cut = summed.map(_.n).sorted(Ordering[Long].reverse)(k)
      canon(summed.map(e => Entry(e.key, e.n - cut)).filter(_.n > 0))
    }
  }

  /** Column form: `{items: [{key, n}…]}`, count-desc/key-asc order.
    * Null keys are ignored, like every SQL aggregate. */
  def apply(k: Int, key: Column): Column =
    udaf(new MisraGriesAgg(k), Encoders.STRING).apply(key)
}
