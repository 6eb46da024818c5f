package graft

import org.apache.spark.sql.SparkSession

/** The engine's cluster-deployment configuration, in code: one place
  * declaring the Spark confs this library is designed to run under at
  * 100 TB, with the rationale attached to each. Local runs (tests,
  * Verify/Bench at local[32]) deliberately use small fixed values; this
  * object is what a production `spark-submit` applies instead.
  *
  * With one deliberate exception (the UTC session-timezone pin, which
  * exists to make timestamp semantics deployment-invariant), none of
  * these change query SEMANTICS — every catalog query hash-matches its
  * oracle under any of them; they change plan CHOICE (AQE) and
  * memory/shuffle behavior.
  */
object ScaleConf {

  /** Confs for a large cluster (order-of-1000 executors). */
  def clusterConfs(targetCores: Int): Map[String, String] = Map(
    // AQE re-plans at runtime from observed sizes: coalesces small
    // shuffle partitions, switches SMJ→broadcast when a side turns out
    // tiny, and splits skewed partitions — the engine leans on all three
    // (SURVEY §4; SkewJoin covers the pathological tail AQE can't).
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // start shuffles at ~2-3× total cores; AQE coalesces down, never up,
    // so overshooting is the safe direction
    "spark.sql.shuffle.partitions" -> (targetCores * 3).toString,
    // one scan task per ~128 MB keeps scan tasks uniform; parquet row
    // groups bound the effective floor
    "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString,
    // dimension tables (region/nation/supplier, issue lists, LSH band
    // maps, n-gram models) broadcast well past the 10 MB default
    "spark.sql.autoBroadcastJoinThreshold" -> (64L * 1024 * 1024).toString,
    // transformWithState requires RocksDB; it is also the right store
    // for any large streaming state (spills off-heap, incremental
    // checkpoints)
    "spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    // the engine's iterative operators (connectedComponents, Lloyd
    // fits) checkpoint per round; a reliable dir makes that
    // executor-loss-tolerant where localCheckpoint is not (production
    // submits should point this at durable storage, e.g. an HDFS/object
    // path; equivalently sparkContext.setCheckpointDir at startup)
    "spark.checkpoint.dir" -> "/tmp/graft-checkpoints",
    // pin timestamp-function semantics to UTC everywhere: to_timestamp /
    // unix_timestamp / window() are session-timezone-sensitive, so an
    // un-pinned cluster default (machine-local TZ) would make temporal
    // queries return different rows than the same code run elsewhere.
    // This is the one entry here that IS semantics-affecting — it exists
    // precisely to make semantics deployment-invariant, and it matches
    // the UTC pin Verify/Bench use locally.
    "spark.sql.session.timeZone" -> "UTC")

  /** Apply [[clusterConfs]] to a session builder. */
  def applyTo(builder: SparkSession.Builder, targetCores: Int): SparkSession.Builder =
    clusterConfs(targetCores).foldLeft(builder) {
      case (b, (k, v)) => b.config(k, v)
    }
}
