package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryComparison, Expression, Literal, MicrosToTimestamp, TimestampDiff}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Restores parquet predicate pushdown through the events `ts` repair
  * ([[graft.Tables.repairTs]], NTZ branch).
  *
  * The repair rewrites an NTZ column as
  * `timestamp_micros(timestampdiff(MICROSECOND, TIMESTAMP_NTZ epoch,
  * ts))` — a pure REINTERPRETATION: the produced TIMESTAMP carries the
  * exact internal microsecond value of the NTZ input (wall-clock µs
  * since the epoch), order-preserving and bijective. But the scan
  * planner only pushes predicates over RAW columns, so `repaired(ts) >
  * C` reaches the parquet reader as an opaque expression and every row
  * group is read — measured: `PushedFilters: [IsNotNull(ts)]` only. At
  * 100 TB a time-range query loses all row-group/page pruning, which is
  * most of what makes time-series scans cheap.
  *
  * This rule rewrites `cmp(repaired(ts), TIMESTAMP literal)` (either
  * side) into `cmp(ts, TIMESTAMP_NTZ literal)` with the SAME internal
  * microsecond value — exactly equivalent by the reinterpretation
  * argument, and now a plain column-vs-literal comparison the parquet
  * filter API accepts. Runs as a user-provided optimization (after the
  * main batches have already substituted the repair expression through
  * projections into the filter), installed idempotently by
  * [[graft.Tables.events]] so every consumer of the events table gets
  * the pruning without opting in; `PlanShapeSpec` pins the resulting
  * `PushedFilters` entry, `EventsEncodingSpec` the unchanged results.
  *
  * The ns-as-INT64 branch (`timestamp_micros(ts DIV 1000)`) is not
  * rewritten: the floor division makes bound adjustment direction-
  * dependent, and no current fixture ships that encoding — documented
  * rather than speculatively implemented. */
object RepairTsPushdown extends Rule[LogicalPlan] {

  /** The NTZ repair shape → the raw NTZ column underneath. The analyzer
    * wraps `timestampdiff`'s NTZ operands in implicit TIMESTAMP casts
    * (the epoch literal folds to `Literal(0L, TimestampType)`, the
    * column to `cast(ts as timestamp)`), so the matcher accepts both
    * the pre- and post-cast shapes. */
  private object RepairedNtz {
    private def rawNtz(e: Expression): Option[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.Cast(ts, TimestampType, _, _)
        if ts.dataType == TimestampNTZType => Some(ts)
      case ts if ts.dataType == TimestampNTZType => Some(ts)
      case _ => None
    }
    private def isEpoch(e: Expression): Boolean = e match {
      case Literal(0L, TimestampType) => true
      case Literal(0L, TimestampNTZType) => true
      case org.apache.spark.sql.catalyst.expressions.Cast(
        Literal(0L, TimestampNTZType), TimestampType, _, _) => true
      case _ => false
    }
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(TimestampDiff("MICROSECOND", s, end, _))
        if isEpoch(s) => rawNtz(end)
      case _ => None
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case cmp: BinaryComparison =>
      (cmp.left, cmp.right) match {
        case (RepairedNtz(ts), TsLit(v)) =>
          cmp.withNewChildren(Seq(ts, Literal(v, TimestampNTZType)))
        case (TsLit(v), RepairedNtz(ts)) =>
          cmp.withNewChildren(Seq(Literal(v, TimestampNTZType), ts))
        case _ => cmp
      }
  }

  /** Idempotent runtime installation (the [[TopKPlan.register]]
    * pattern); also injected by the [[GraftExtensions]] plugin path. */
  def install(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(RepairTsPushdown))
      exp.extraOptimizations = exp.extraOptimizations :+ RepairTsPushdown
  }
}
