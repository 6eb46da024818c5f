package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2-D Hilbert curve index of two
  * pre-quantized non-negative long coordinates on a 2^bits × 2^bits
  * grid (the classic iterative xy→d walk — high bit to low bit,
  * quadrant digit + sub-square rotation per level).
  *
  * Why beside Z-order ([[graft.sources.Layout.zValue]]): both are
  * space-filling curves used for multi-dimensional file clustering, but
  * the Z curve takes a long jump between quadrant halves at EVERY
  * level, so a file owning a contiguous curve segment can span a wide
  * bounding box whenever its segment crosses one of those seams. The
  * Hilbert curve is continuous — consecutive indices are always
  * grid-adjacent — so equal-length segments have provably tighter
  * bounding boxes on average, which is exactly the quantity parquet
  * min/max row-group skipping feeds on (measured in `LayoutSpec`:
  * smaller per-file span product than Z-order on the same data).
  *
  * §2.10 preference order (b): custom scalar expression. The per-row
  * loop (≤ 31 iterations of shift/mask arithmetic) stays in a JVM
  * static call, like the built-in `levenshtein`; the expression itself
  * participates in whole-stage codegen. Null if either input is null.
  */
case class HilbertIndex2D(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 31, s"bits must be in [1,31], got $bits")

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == LongType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two long arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_index"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertIndex2D.xy2d(bits, a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.plans.HilbertIndex2D.xy2d($bits, $x, $y)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex2D =
    copy(left = newLeft, right = newRight)
}

object HilbertIndex2D {

  /** (x, y) → Hilbert distance on the 2^bits square. Inputs are
    * clamped into the grid (quantization upstream already bounds them;
    * the clamp makes the expression total). Called from both eval and
    * generated code. */
  def xy2d(bits: Int, xIn: Long, yIn: Long): Long = {
    val n = 1L << bits
    var x = if (xIn < 0) 0L else if (xIn >= n) n - 1 else xIn
    var y = if (yIn < 0) 0L else if (yIn >= n) n - 1 else yIn
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the sub-square so the next level's quadrant walk keeps
      // curve continuity; reflecting with n-1-v is equivalent to
      // s-1-v on the bits later levels read (n ≡ 0 mod s)
      if (ry == 0) {
        if (rx == 1) {
          x = n - 1 - x
          y = n - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
