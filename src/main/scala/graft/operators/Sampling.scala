package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling/splitting — how a large-scale
  * pipeline takes train/val/test splits and down-samples: a pure per-row
  * hash of the stable id, never `rand()`. The properties that matter at
  * 100 TB: no shuffle (a row's split is a function of its id alone),
  * stable across reruns/re-partitioning/engine versions, and
  * consistent — the same id lands in the same split in every table that
  * derives from it (join-safety across fact/dim/embedding tables).
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from the first 32 md5 bits of the
    * id rendered as a string. md5 on purpose: bit-identical in every
    * engine this pipeline is checked against (not xxhash64). */
  def hashBucket(id: Column, buckets: Int = 100): Column =
    conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Append a `split` label column. `fractions` are (label, percent)
    * with percents summing to ≤ 100; rows hashing past the last
    * threshold get the final label. Order matters and is part of the
    * split definition. */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      fractions: Seq[(String, Int)] = Seq(("train", 80), ("val", 10), ("test", 10))): DataFrame = {
    require(fractions.nonEmpty, "hashSplit needs at least one split")
    require(fractions.map(_._2).sum == 100,
      s"split percents must sum to 100, got ${fractions.map(_._2).sum}")
    val b = hashBucket(col(idCol))
    val thresholds = fractions.scanLeft(0)(_ + _._2).tail
    val labeled = fractions.zip(thresholds).init
      .foldLeft(when(lit(false), lit(""))) { case (acc, ((label, _), cut)) =>
        acc.when(b < cut, label)
      }
      .otherwise(fractions.last._1)
    df.withColumn("split", labeled)
  }
}
