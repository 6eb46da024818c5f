package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Typed `Aggregator` reproducing the reference's `_get_err` with EXACT
  * file-order semantics: the first value ≠ `default` *in explicit row
  * order*, else `default` (`/root/reference/clean_encounterids.py:122-127`).
  *
  * [[graft.operators.Dedup.firstNonDefault]] is the order-free variant
  * (minimum non-default value) — sufficient when any representative
  * error value will do, and cheaper. This Aggregator is for callers that
  * must match the reference row-for-row: it carries an explicit order
  * key (stamped at ingest, e.g. `monotonically_increasing_id` or a file
  * line number), so the result is deterministic under any shuffle. The
  * merge is associative + commutative (keep the lowest-order non-default
  * candidate), which is exactly the contract Spark requires of partial
  * aggregation — this is how order-sensitive semantics survive a
  * distributed hash aggregation.
  */
class FirstNonDefaultAgg(default: String)
    extends Aggregator[(Long, String), (Long, String), String] {

  /** (order, value) of the best candidate so far; MaxValue = none. */
  override def zero: (Long, String) = (Long.MaxValue, default)

  override def reduce(b: (Long, String), a: (Long, String)): (Long, String) =
    if (a._2 != null && a._2 != default && a._1 < b._1) a else b

  override def merge(x: (Long, String), y: (Long, String)): (Long, String) =
    if (x._1 <= y._1) x else y

  override def finish(b: (Long, String)): String =
    if (b._1 == Long.MaxValue) default else b._2

  override def bufferEncoder: Encoder[(Long, String)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.STRING)
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

object FirstNonDefaultAgg {
  /** Column form: `firstNonDefaultOrdered(ord, value, "NA")`. */
  def apply(ord: Column, value: Column, default: String): Column =
    udaf(new FirstNonDefaultAgg(default),
      Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .apply(ord, value)
}
