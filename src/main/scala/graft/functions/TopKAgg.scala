package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded per-group top-k as a true aggregation.
  *
  * The window-function top-k (`row_number over (partition by g order by
  * score) <= k`) shuffles EVERY candidate row to its group's reducer
  * before discarding all but k. This Aggregator keeps at most k
  * (score, id) pairs in its buffer, so partial (map-side) aggregation
  * trims each partition's contribution to k rows before the shuffle —
  * for brute-force kNN that turns a |corpus|×|queries| exchange into a
  * k×|queries| exchange, the difference between impossible and cheap at
  * 100 TB. Merge is associative/commutative (merge two trimmed lists,
  * trim again), exactly the contract partial aggregation needs.
  *
  * Ordering: score descending, id ascending on ties — identical to the
  * deterministic window ordering used elsewhere. Output is the struct
  * `{items: array<{score, id}>}`, ready for `posexplode` into ranked
  * rows (see [[graft.operators.Similarity.bruteForceTopKAgg]]).
  */
class TopKAgg(k: Int)
    extends Aggregator[(Double, Long), TopKAgg.Buf, TopKAgg.Buf] {
  require(k > 0, "k must be positive")
  import TopKAgg.{Buf, Entry}

  private def better(a: Entry, b: Entry): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  private def trim(xs: Seq[Entry]): Buf = Buf(xs.sortWith(better).take(k))

  override def zero: Buf = Buf(Seq.empty)

  override def reduce(buf: Buf, a: (Double, Long)): Buf = {
    val e = Entry(a._1, a._2)
    // cheap reject before the sort: full buffer and e worse than the floor
    if (buf.items.length >= k && !better(e, buf.items.last)) buf
    else trim(buf.items :+ e)
  }

  override def merge(x: Buf, y: Buf): Buf = trim(x.items ++ y.items)

  override def finish(buf: Buf): Buf = buf

  override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
  override def outputEncoder: Encoder[Buf] = Encoders.product[Buf]
}

object TopKAgg {
  case class Entry(score: Double, id: Long)
  case class Buf(items: Seq[Entry])

  /** Column form: top-k `{items: [{score, id}…]}` per group, score
    * descending, id-ascending tie-break. */
  def apply(k: Int, score: Column, id: Column): Column =
    udaf(new TopKAgg(k), Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
      .apply(score, id)
}
