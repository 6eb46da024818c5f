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
  * The ns-as-INT64 branch (`timestamp_micros(ts DIV 1000)`) is also
  * rewritten, with exact truncating-division bound arithmetic: for a
  * literal `c` µs, `ts DIV 1000 ≥ c ⟺ ts ≥ c·1000` when `c > 0` and
  * `ts ≥ c·1000 − 999` otherwise (`DIV` truncates toward zero, so the
  * negative side shifts); `≤` mirrors, strict forms shift the literal
  * by one first, and equality becomes the two-sided range. Bounds are
  * computed at rewrite time on the driver and guarded against µs→ns
  * overflow (any in-range ns-representable literal is safe — INT64 ns
  * itself only reaches year 2262). */
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

  /** The ns-as-INT64 repair shape (`timestamp_micros(ts DIV 1000)`) →
    * the raw LongType nanosecond column. */
  private object RepairedNs {
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    import org.apache.spark.sql.types.{IntegerType, LongType}
    private def is1000(e: Expression): Boolean = e match {
      case Literal(1000L, LongType) => true
      case Literal(1000, IntegerType) => true
      case org.apache.spark.sql.catalyst.expressions.Cast(
        Literal(1000, IntegerType), LongType, _, _) => true
      case _ => false
    }
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(ts, d, _))
        if is1000(d) && ts.dataType == LongType => Some(ts)
      case _ => None
    }
  }

  // exact inverse images of {ts DIV 1000 cmp c} under truncating
  // division; c is the literal micros, the result a nanosecond bound
  private val MaxSafeMicros = Long.MaxValue / 1000 - 1
  private def nsGe(c: Long): Long = if (c > 0) c * 1000 else c * 1000 - 999
  private def nsLe(c: Long): Long = if (c < 0) c * 1000 else c * 1000 + 999

  private def rewriteNs(cmp: BinaryComparison, ts: Expression, c: Long,
                        litLeft: Boolean): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{And, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
    import org.apache.spark.sql.types.LongType
    def lit(v: Long) = Literal(v, LongType)
    // normalize literal-left comparisons to column-op-literal form
    val op = (cmp, litLeft) match {
      case (_: GreaterThan, true) => classOf[LessThan]
      case (_: GreaterThanOrEqual, true) => classOf[LessThanOrEqual]
      case (_: LessThan, true) => classOf[GreaterThan]
      case (_: LessThanOrEqual, true) => classOf[GreaterThanOrEqual]
      case _ => cmp.getClass
    }
    op match {
      case x if x == classOf[GreaterThanOrEqual] => GreaterThanOrEqual(ts, lit(nsGe(c)))
      case x if x == classOf[GreaterThan] => GreaterThanOrEqual(ts, lit(nsGe(c + 1)))
      case x if x == classOf[LessThanOrEqual] => LessThanOrEqual(ts, lit(nsLe(c)))
      case x if x == classOf[LessThan] => LessThanOrEqual(ts, lit(nsLe(c - 1)))
      case _ => // EqualTo: the two-sided range (null semantics preserved:
                // a null ts nulls both sides, And(null, null) = null)
        And(GreaterThanOrEqual(ts, lit(nsGe(c))), LessThanOrEqual(ts, lit(nsLe(c))))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case cmp: BinaryComparison =>
      import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
      def supportedNs = cmp.isInstanceOf[GreaterThan] ||
        cmp.isInstanceOf[GreaterThanOrEqual] || cmp.isInstanceOf[LessThan] ||
        cmp.isInstanceOf[LessThanOrEqual] || cmp.isInstanceOf[EqualTo]
      (cmp.left, cmp.right) match {
        case (RepairedNtz(ts), TsLit(v)) =>
          cmp.withNewChildren(Seq(ts, Literal(v, TimestampNTZType)))
        case (TsLit(v), RepairedNtz(ts)) =>
          cmp.withNewChildren(Seq(Literal(v, TimestampNTZType), ts))
        case (RepairedNs(ts), TsLit(v))
          if supportedNs && !cmp.isInstanceOf[EqualNullSafe] &&
            math.abs(v) < MaxSafeMicros =>
          rewriteNs(cmp, ts, v, litLeft = false)
        case (TsLit(v), RepairedNs(ts))
          if supportedNs && !cmp.isInstanceOf[EqualNullSafe] &&
            math.abs(v) < MaxSafeMicros =>
          rewriteNs(cmp, ts, v, litLeft = true)
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
