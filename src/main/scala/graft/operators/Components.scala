package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components over an undirected edge list — the transitive
  * closure of a near-duplicate pair graph, turning pairwise matches into
  * dedup CLUSTERS (canonical id = smallest member). The greedy
  * drop-the-greater-id rule ([[Curation.funnel]]) mis-handles chains
  * (A~B, B~C, A≁C); clustering is the production-grade answer.
  *
  * Algorithm: iterated min-label propagation. Every vertex starts
  * labeled with its own id; each round it takes the min of its label and
  * its neighbors' labels; fixpoint = per-component minimum. Rounds
  * needed = graph diameter, and each round is one shuffle-join + one
  * aggregation — for dedup graphs (tiny, shallow clusters) this
  * converges in a handful of rounds. The driver only ever sees a
  * changed-row COUNT per round (convergence test), never the data. For
  * adversarially long path graphs the alternating small-star/large-star
  * contraction halves the diameter per round; this implementation trades
  * that away for one join per round, and `maxIter` bounds the worst
  * case explicitly.
  */
object Components {

  /** Label every vertex of the `(aCol, bCol)` edge list with its
    * component's minimum vertex id. Returns `(id, comp)` — vertices that
    * appear in at least one edge only (isolated ids never enter the edge
    * list; callers left-join and coalesce to `id`). Fails fast if the
    * propagation has not converged within `maxIter` rounds rather than
    * return a partially-merged clustering. */
  def connectedComponents(
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 20): DataFrame = {
    require(maxIter > 0, s"maxIter must be positive, got $maxIter")
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .unionByName(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // materialize the edge cache ONCE before the loop: round 1 otherwise
    // references sym from two plan subtrees at once and the upstream
    // edge computation (for q58, the whole MinHash chain) runs per
    // subtree instead of filling the cache first
    sym.count()
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(min(col("comp")).as("nmin"))
      // localCheckpoint (eager) — NOT just persist: every round's plan
      // embeds the previous round's twice (once directly, once under the
      // neighbor aggregation), so without truncation the logical plan
      // DOUBLES per round and analysis time goes exponential long before
      // any data moves. Checkpointing cuts the plan to the materialized
      // result; on a cluster, reliable `checkpoint()` to HDFS serves the
      // same role with executor-loss tolerance.
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"),
          (col("nmin") < col("comp")).as("changed"))
        .localCheckpoint(true)
      converged = next.filter(col("changed")).count() == 0L
      labels.unpersist()
      labels = next.drop("changed")
      iter += 1
    }
    sym.unpersist()
    if (!converged)
      sys.error(s"connectedComponents did not converge in $maxIter rounds " +
        "(graph diameter exceeds maxIter); raise maxIter")
    labels
  }
}
