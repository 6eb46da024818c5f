package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-operator custom Catalyst stack for per-key top-k selection —
  * the §2.10(c) preference-order demonstration: a logical node, an
  * optimizer rule, a planner strategy, and a two-phase physical
  * operator, installable through [[GraftExtensions]] or at runtime.
  *
  * Why an operator and not a window: `row_number() OVER (PARTITION BY
  * key ORDER BY score)` shuffles EVERY candidate row, then sorts each
  * partition, then filters. For selection workloads (pick 3 of millions
  * per key from 100 TB) the winning plan trims each map partition to k
  * rows with a bounded heap BEFORE the exchange — the same
  * partial/final split as an aggregation, with shuffle traffic
  * O(keys·k) instead of O(rows), and no sort anywhere. The
  * [[graft.functions.TopKAgg]] UDAF gets the same dataflow through the
  * aggregation machinery; this operator plans it natively, keeping rows
  * as rows (no struct packing) and showing the full plug-in surface.
  *
  * Memory contract: each task holds (distinct keys in its partition)×k
  * rows — the selection regime. A key-explosive input should use the
  * window form instead; the operator is the fast path, not a universal
  * replacement.
  */
/** `withTies = false` is `row_number() ≤ k`: exactly k rows. `withTies
  * = true` is SQL's FETCH FIRST k WITH TIES / `rank() ≤ k`: every row
  * whose order-tuple equals the k-th row's tuple also survives —
  * variable row count, but still bounded map-side state of k rows plus
  * the boundary tie group (an all-equal-keys input degenerates exactly
  * as rank() itself does). */
case class TopKPerKey(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    withTies: Boolean,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = if (withTies) None else child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKPerKey {

  /** Public builder: per-`keys` top-`k` rows of `df` under `orderBy`
    * (`(column, descending?)` pairs; ties broken by later columns — make
    * the order total for deterministic results). Registers the planner
    * pieces on `df`'s session idempotently. */
  def of(df: DataFrame, keys: Seq[String], orderBy: Seq[(String, Boolean)],
         k: Int, withTies: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    register(spark)
    val plan = df.queryExecution.analyzed
    def attr(n: String): Attribute = plan.output.find(_.name == n).getOrElse(
      sys.error(s"TopKPerKey: no column '$n' in ${plan.output.map(_.name).mkString(", ")}"))
    val node = TopKPerKey(
      keys.map(attr),
      orderBy.map { case (n, desc) =>
        SortOrder(attr(n), if (desc) Descending else Ascending)
      },
      k, withTies, plan)
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark, node)
  }

  /** Runtime installation via the PUBLIC experimental hooks — the
    * counterpart of the [[GraftExtensions]] plugin path for sessions the
    * harness has already built. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    if (!exp.extraOptimizations.contains(CombineTopK))
      exp.extraOptimizations = exp.extraOptimizations :+ CombineTopK
    if (!exp.extraOptimizations.contains(WindowTopKRewrite))
      exp.extraOptimizations = exp.extraOptimizations :+ WindowTopKRewrite
  }
}

/** Optimizer rule: the NAIVE window spelling of per-key top-k —
  * `row_number() OVER (PARTITION BY … ORDER BY …)` filtered to `≤ k`
  * with the rank column then pruned away — rewrites to [[TopKPerKey]],
  * so a user who writes the textbook form gets the bounded-heap plan
  * (map-side trim, O(keys·k) exchange, no sort) instead of
  * shuffle-everything-sort-filter. Preconditions, all checked:
  * exactly one window expression and it is `row_number` over the
  * standard running row frame; the filter compares that rank to an
  * integer literal (≤ / < and their flipped forms); and the project
  * above DROPS the rank, so the operator's child-only output is
  * sufficient. Keep-the-rank queries are left alone — they need the
  * rank values the operator doesn't produce. Semantics under non-total
  * orderings are unchanged: both forms pick an arbitrary
  * representative among order-ties, deterministic forms stay
  * deterministic. `rank() ≤ k` rewrites to the WITH-TIES heap (every
  * boundary tie survives, matching rank's variable row count);
  * `dense_rank()` stays unrewritten — its ≤ k bounds distinct VALUES,
  * which neither heap form reproduces. An EMPTY partition spec (global
  * `row_number() OVER (ORDER BY …) ≤ k`) rewrites too: the operator's
  * empty-grouping form demands AllTuples, giving map-side trim + one
  * single-partition final heap instead of Spark's
  * single-partition-window-over-everything plan. */
object WindowTopKRewrite extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window}
  import org.apache.spark.sql.types.IntegerType

  /** The single rank-like window expression, plus whether its ≤ k
    * filter keeps boundary ties: `row_number` → exact k; `rank` → WITH
    * TIES (its ≤ k filter retains every row tied with the k-th, which
    * the tie-aware heap reproduces). `dense_rank` is NOT matched — its
    * ≤ k keeps the top k distinct VALUES, a different bound. */
  private def rankOf(w: Window): Option[(Alias, Boolean)] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(f,
          WindowSpecDefinition(_, order,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _))
          if order.nonEmpty => f match {
        case _: RowNumber => Some((a, false))
        case _: Rank => Some((a, true))
        case _ => None
      }
      case _ => None
    }

  /** `cond` as "rank ≤ k" with k an int literal, any comparison spelling. */
  private def boundOf(cond: Expression, rank: Alias): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rank.exprId => Some(k)
    case LessThan(a: AttributeReference, Literal(k: Int, IntegerType))
        if a.exprId == rank.exprId => Some(k - 1)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.exprId == rank.exprId => Some(k)
    case GreaterThan(Literal(k: Int, IntegerType), a: AttributeReference)
        if a.exprId == rank.exprId => Some(k - 1)
    case _ => None
  }

  /** Spark's own rank-limit pushdown (`InferWindowGroupLimit`) may
    * have already slid a sort-based WindowGroupLimit under the Window;
    * the heap subsumes it, so strip it — otherwise the rewritten plan
    * would trim twice (once by sorting every map partition, once by
    * heap). */
  private def stripNativeLimit(child: LogicalPlan): LogicalPlan = child match {
    case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit =>
      wgl.child
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projList, Filter(cond, w: Window)) =>
      (for {
        (rank, ties) <- rankOf(w)
        k <- boundOf(cond, rank) if k > 0
        // the project must drop the rank and need only child columns
        if projList.forall(_.references.subsetOf(w.child.outputSet))
      } yield Project(projList,
        TopKPerKey(w.partitionSpec, w.orderSpec, k, ties,
          stripNativeLimit(w.child)))
      ).getOrElse(p)
  }
}

/** Optimizer rule: adjacent TopKPerKey nodes over the same key/order
  * collapse to the smaller k (a user composing `top 10` over `top 3`
  * gets one operator). */
object CombineTopK extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case TopKPerKey(g1, o1, k1, t1, TopKPerKey(g2, o2, k2, t2, child))
        if t1 == t2 &&
          g1.map(_.canonicalized) == g2.map(_.canonicalized) &&
          o1.map(_.canonicalized) == o2.map(_.canonicalized) =>
      TopKPerKey(g1, o1, math.min(k1, k2), t1, child)
  }
}

/** Planner strategy: logical TopKPerKey → partial heap (map side) →
  * exchange (inserted by EnsureRequirements from the final node's
  * required distribution) → final heap. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(g, o, k, ties, child) =>
      TopKExec(g, o, k, ties, partial = false,
        TopKExec(g, o, k, ties, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** Physical bounded-heap top-k per key. `partial = true` runs on the
  * map side over whatever partitioning arrives; the final instance
  * demands clustering on the grouping keys, so EnsureRequirements
  * places one exchange carrying at most keys·k rows per upstream
  * partition. */
case class TopKExec(
    grouping: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    withTies: Boolean,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // empty grouping = GLOBAL top-k: the final heap must see every
    // partial survivor, and ClusteredDistribution(Nil) is rejected by
    // Spark's own require (single-partition demands are spelled
    // AllTuples). The resulting plan — map-side trim to k rows per
    // partition, one k·partitions-row exchange, single final heap — is
    // the global-selection analogue of the per-key shape.
    else if (grouping.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(grouping) :: Nil

  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val groupingExprs = grouping
    val sortOrders = ordering
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      // execute()'s contract is InternalRow, not UnsafeRow — normalize
      // through an identity projection instead of casting so a child
      // emitting e.g. GenericInternalRow still works (the projection is
      // a no-op copy-through for rows that are already Unsafe-backed)
      val toUnsafe = UnsafeProjection.create(childOutput, childOutput)
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      // generated comparator over the UNBOUND sort orders bound here to
      // the child schema: rows compare "better" when ordered first
      val ord = GenerateOrdering.generate(sortOrders, childOutput)
      // max-heap on the sort order: peek() is the WORST kept row, so a
      // candidate enters iff it beats the worst once the heap is full.
      // withTies adds a side buffer of rows EQUAL to the current heap
      // max: such rows share the k-th rank (strictly-better count
      // ≤ k−1) and must survive; the buffer clears whenever the heap
      // max strictly improves, because the old boundary value then has
      // ≥ k strictly-better rows and falls out of rank ≤ k.
      val keepTies = withTies
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val tieBufs = new java.util.HashMap[UnsafeRow, java.util.ArrayList[UnsafeRow]]()
      while (iter.hasNext) {
        val row = toUnsafe(iter.next())
        val key = keyProj.apply(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](limit + 1, ord.reversed())
          heaps.put(key.copy(), heap)
          if (keepTies) tieBufs.put(key.copy(), new java.util.ArrayList[UnsafeRow]())
        }
        if (heap.size < limit) heap.add(row.copy())
        else {
          val cmp = ord.compare(row, heap.peek())
          if (cmp < 0) {
            val ejected = heap.poll()
            heap.add(row.copy())
            if (keepTies) {
              val ties = tieBufs.get(key)
              if (ord.compare(ejected, heap.peek()) == 0) {
                // boundary value unchanged (duplicates remain in heap):
                // the ejected copy still shares the k-th rank
                ties.add(ejected)
              } else {
                // boundary strictly improved → old boundary's rank > k
                ties.clear()
              }
            }
          } else if (keepTies && cmp == 0) {
            tieBufs.get(key).add(row.copy())
          }
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.entrySet().iterator().asScala.flatMap { e =>
        val heap = e.getValue
        // drain to sorted order (worst-first heap → reverse) so each
        // key's rows emit best-first; k is small by contract
        val buf = new Array[UnsafeRow](heap.size)
        var i = heap.size - 1
        while (i >= 0) { buf(i) = heap.poll(); i -= 1 }
        val ties =
          if (keepTies) tieBufs.get(e.getKey).iterator().asScala else Iterator.empty
        buf.iterator ++ ties
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKExec =
    copy(child = newChild)
}
