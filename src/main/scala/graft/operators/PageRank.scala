package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-point PageRank — graph centrality for the curation use cases
  * that rank entities by link structure (host/domain quality à la
  * Common Crawl ranking, supplier/customer importance, author graphs).
  *
  * Arithmetic is EXACT scaled integers, not floats: ranks live as
  * 10⁻⁹-scaled BIGINTs, contributions are integer divisions
  * (`rank div out_degree`), and the damping update is
  * `(100−d)% · 10⁹ + (d · Σcontrib) div 100`. Floating-point PageRank
  * sums contributions in partition order, so low-order bits differ
  * run-to-run and across engines — after three iterations that noise
  * is amplified into rank flips near ties. The fixed-point form is
  * deterministic on any partitioning and replayable in SQL verbatim
  * (the systematic ≤1-unit-per-division truncation is identical
  * everywhere and irrelevant at 10⁻⁹ scale).
  *
  * Scale shape: one join + one keyed aggregation per iteration (the
  * standard dataflow PageRank — contributions shuffle on dst, the
  * rank table is node-sized), ranks re-derived against the NODE set
  * each round so isolated-source nodes keep receiving the teleport
  * mass. DANGLING nodes (out-degree 0 — real web/host graphs always
  * have sinks) don't leak their mass: each iteration folds the sink
  * ranks into a one-row aggregate and redistributes `sinkMass div N`
  * to every node's incoming mass before damping — the standard
  * dangling-mass correction, kept exact-integer (the `div N` truncates
  * < N·10⁻⁹ of total mass per iteration, the same systematic
  * truncation the per-edge `div outdeg` already accepts). The sink
  * aggregate reaches the update as `crossJoin(broadcast(1-row))` — no
  * driver round-trip, no extra exchange on the node table. Iteration
  * plans are cut with `localCheckpoint` (the [[Components]] loop
  * pattern) so lineage stays bounded. */
object PageRank {

  private val Scale = 1000000000L

  /** `edges(src, dst)` — deduplicated directed edges. Nodes appearing
    * only as `dst` are sinks; their mass redistributes uniformly (see
    * object doc). Returns `(node, rank)`, rank 10⁻⁹-scaled (initial
    * mass `Scale` per node). */
  def pageRankFixedPoint(edges: DataFrame, iterations: Int,
                         dampingPct: Int = 85): DataFrame = {
    require(iterations >= 0, s"negative iterations: $iterations")
    val g = Graph(edges, dampingPct)
    var ranks = g.initial
    (1 to iterations).foreach(_ => ranks = g.step(ranks))
    ranks
  }

  /** CONVERGENCE-DRIVEN fixed point — the serving mode for graphs
    * whose mixing time is unknown: iterate until the EXACT-INTEGER L1
    * movement `Σ|rankᵢ − rankᵢ₋₁|` falls to `epsPerNode · |nodes|`
    * (per-node tolerance, so the stop iteration is roughly
    * scale-invariant), capped at `maxIterations`. The movement is an
    * integer total of integer ranks — partition-order-proof like the
    * ranks themselves, so the stop decision replays in SQL verbatim
    * (q195's oracle unrolls the cap, computes every movement, and
    * picks the same first-below-ε iteration). Per iteration this adds
    * one node-sized join + one scalar aggregate to the fixed-point
    * step; the scalar is the only driver round-trip. Returns
    * `(ranks, iterationsRun)`. */
  def pageRankConverged(edges: DataFrame, epsPerNode: Long,
                        maxIterations: Int,
                        dampingPct: Int = 85): (DataFrame, Int) = {
    require(maxIterations >= 1, s"need maxIterations >= 1, got $maxIterations")
    require(epsPerNode >= 0, s"negative epsPerNode: $epsPerNode")
    val g = Graph(edges, dampingPct)
    val epsTotal = epsPerNode * g.n
    var ranks = g.initial.localCheckpoint()
    var iters = 0
    var moved = Long.MaxValue
    while (moved > epsTotal && iters < maxIterations) {
      val next = g.step(ranks)
      moved = next.join(ranks.withColumnRenamed("rank", "prev"), Seq("node"))
        .agg(sum(abs(col("rank") - col("prev"))).as("d"))
        .head().getLong(0)
      ranks = next
      iters += 1
    }
    (ranks, iters)
  }

  /** The shared per-iteration machinery: ONE implementation of the
    * damped, dangling-corrected update for both the fixed-iteration
    * and the convergence-driven faces — their arithmetic cannot
    * drift. */
  private case class Graph(edges: DataFrame, dampingPct: Int) {
    require(dampingPct > 0 && dampingPct < 100, s"bad damping $dampingPct")
    private val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint()
    private val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint()
    private val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    private val srcNodes = deg.select(col("src").as("node"))
    // node count: one scalar, fixed across iterations (nodes is
    // checkpointed, so this is a cheap count over materialized rows)
    val n: Long = nodes.count()
    private val teleport = (100L - dampingPct) * Scale / 100L
    def initial: DataFrame = nodes.select(col("node"), lit(Scale).as("rank"))
    def step(ranks: DataFrame): DataFrame = {
      val contrib = e.join(deg, Seq("src"))
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      // total rank sitting on out-degree-0 nodes this iteration (0 when
      // the graph has no sinks — the correction is then the identity)
      val sinkMass = ranks.join(srcNodes, Seq("node"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0L)).as("sink_mass"))
      nodes
        .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
        .crossJoin(broadcast(sinkMass))
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampingPct * (coalesce(in_mass, 0L) + sink_mass div $n)) div 100"))
            .as("rank"))
        .localCheckpoint()
    }
  }
}
