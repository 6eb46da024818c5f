package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode normalization (JDK
  * `java.text.Normalizer`) of a string column to a fixed form.
  *
  * Why it exists: exact dedup and shingle fingerprints key on raw
  * bytes, so NFC vs NFD spellings of the SAME text (`é` precomposed vs
  * `e` + combining acute) — or full-width compatibility variants
  * (`ＡＢＣ` vs `ABC`) — defeat duplicate detection entirely. Canonical
  * practice for corpus curation is NFKC ahead of any fingerprint:
  * canonical composition PLUS compatibility folding (full-width forms,
  * ligatures, super/subscripts) collapse to one spelling.
  *
  * Spark ships no Unicode-normalization function, and a Scala udf would
  * break whole-stage codegen on what is by definition a
  * every-row-of-the-corpus scan; this expression stays in the codegen
  * span with one static JVM call per row. The JDK normalizer is an
  * ASCII-fast-path implementation (`Normalizer.isNormalized` short-
  * circuits), so the common all-ASCII row costs one scan of the string.
  *
  * The form is pinned at construction (plan literal): NFC | NFD |
  * NFKC | NFKD. Registered by name as `unicode_normalize(str, form)`
  * via [[GraftFunctions]] for SQL-text callers.
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.forms.contains(form),
    s"unicode_normalize form must be one of ${UnicodeNormalize.forms.mkString("/")}, got $form")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = child.dataType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(java.text.Normalizer.normalize(" +
        s"$c.toString(), java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object UnicodeNormalize {
  val forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** Builder for the function registry: second argument must be a
    * foldable string literal naming the form. */
  def fromChildren(children: Seq[Expression]): UnicodeNormalize = {
    require(children.length == 2,
      s"unicode_normalize takes (string, form), got ${children.length} args")
    val form = children(1) match {
      case e if e.foldable && e.dataType.isInstanceOf[StringType] =>
        String.valueOf(e.eval(null)).toUpperCase
      case other =>
        throw new IllegalArgumentException(
          s"unicode_normalize form must be a string literal, got $other")
    }
    UnicodeNormalize(children(0), form)
  }
}
