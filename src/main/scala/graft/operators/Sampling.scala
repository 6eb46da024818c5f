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

  /** Stratified deterministic down-sampling: keep a per-stratum fraction
    * of rows (`rates` maps stratum value → keep-percent), decided by the
    * same id-hash as [[hashSplit]] — so the sample is rerun-stable,
    * shuffle-free, and join-consistent across derived tables. Strata
    * absent from `rates` are dropped (rate 0). The rate lookup is a
    * literal `when` chain — strata sets are small by definition; a
    * thousand-strata design would broadcast-join a rates dimension
    * instead. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       rates: Map[String, Int]): DataFrame = {
    require(rates.nonEmpty, "stratifiedSample needs at least one stratum rate")
    require(rates.values.forall(r => r >= 0 && r <= 100),
      s"rates must be percents in [0,100], got $rates")
    val rate = rates.toSeq.sortBy(_._1)
      .foldLeft(when(lit(false), lit(0))) { case (acc, (k, r)) =>
        acc.when(col(strataCol) === k, r)
      }.otherwise(lit(0))
    df.filter(hashBucket(col(idCol)) < rate)
  }

  /** Training-mixture up/down-sampling: replicate each row
    * `floor(weight)` times plus one fractional extra copy decided by the
    * id hash (`hashBucket(id, 1000) < frac·1000`), so a weight of 2.5
    * yields 2 copies always and a 3rd for a deterministic half of ids;
    * 0.25 keeps a quarter of rows. No shuffle — replication is a
    * per-row `sequence`+`explode` and the fractional pick is the same
    * rerun-stable hash as [[hashSplit]]. The emitted `copy` column
    * (1..n) keeps replicated rows distinguishable downstream.
    * `weight` must be non-negative; rows with a resolved count of 0 are
    * dropped. */
  def weightedMix(df: DataFrame, idCol: String, weight: Column): DataFrame = {
    val frac = weight - floor(weight)
    val extra = (hashBucket(col(idCol), 1000) < round(frac * 1000)).cast("long")
    df.withColumn("__n", floor(weight).cast("long") + extra)
      .filter(col("__n") >= 1)
      .withColumn("copy", explode(sequence(lit(1L), col("__n"))))
      .drop("__n")
  }

  /** Deterministic per-group uniform sample of exactly k ids: the k
    * smallest values of a 48-bit md5 prefix of the id, ties broken by
    * id. This is the order-independent replacement for reservoir
    * sampling — a classic reservoir depends on encounter/merge order,
    * so two runs (or two partitionings) of the same data disagree;
    * bottom-k-by-hash is a pure function of the id SET, rerun-stable
    * and engine-reproducible, yet still uniform (md5 is
    * permutation-uniform over ids).
    *
    * Scale shape: the selection is a true AGGREGATION via
    * [[graft.functions.TopKAgg]] (score = negated hash ⇒ its
    * score-desc order is hash-asc), so partial aggregation trims every
    * map partition's contribution to k rows BEFORE the shuffle — the
    * exchange carries ≤ k·partitions rows, not the corpus. The
    * window-function spelling (`row_number() ≤ k`) the oracle replays
    * would shuffle every row to its group's reducer first; at 100 TB
    * that difference is the whole game. 48 hash bits (not all 128):
    * exact in a Double mantissa, so the score survives the Aggregator's
    * Double lane bit-for-bit; prefix collisions fall to the id
    * tie-break, which the oracle orders identically. */
  def bottomKByHash(df: DataFrame, groupCol: String, idCol: String,
                    k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val h48 = conv(substring(md5(col(idCol).cast("string")), 1, 12), 16, 10)
      .cast("long")
    df.groupBy(col(groupCol))
      .agg(graft.functions.TopKAgg(k, -h48.cast("double"), col(idCol))
        .as("picks"))
      .select(col(groupCol), posexplode(col("picks.items")))
      .select(col(groupCol), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as(idCol))
  }

  /** Source-mix sampling plan: given per-source availability
    * (`tokensCol`) and target mix weights (`weightCol`), the keep rate
    * per source that fills a `budget` of tokens at the target
    * proportions — the planning step before [[stratifiedSample]] /
    * [[weightedMix]] executes the mix. `share = w/Σw`,
    * `want = share·budget`, `rate = min(1, want/tokens)` (an
    * under-supplied source caps at keeping everything — up-sampling
    * beyond 1 is [[weightedMix]] replication, a separate decision),
    * `planned = min(want, tokens)`.
    *
    * Scale shape: `stats` is one row per source — dimension-sized by
    * definition — so the Σw total joins back as a broadcast scalar
    * (the one legitimate crossJoin pattern, see Reports); everything
    * else is per-row arithmetic. The heavy input (per-source token
    * counts over the corpus) is the caller's one aggregation scan.
    *
    * Edge: a zero-token source yields rate 1.0 and planned 0.0 —
    * "keep everything of nothing", benign for the executing sampler.
    * The zero case is branched explicitly: Spark's `Divide` returns
    * NULL on a zero divisor (non-ANSI), so leaning on `least`'s
    * null-skipping would tie the edge to optimizer/ANSI settings. */
  def mixPlan(stats: DataFrame, weightCol: String, tokensCol: String,
              budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val tot = stats.agg(sum(col(weightCol)).as("__wsum"))
    stats.crossJoin(broadcast(tot))
      .withColumn("share", col(weightCol) / col("__wsum"))
      .withColumn("want", col("share") * budget)
      .withColumn("rate",
        when(col(tokensCol) === 0, lit(1.0))
          .otherwise(least(lit(1.0), col("want") / col(tokensCol))))
      .withColumn("planned", least(col("want"), col(tokensCol).cast("double")))
      .drop("__wsum")
  }
}
