package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE subword counter — the production escalation of
  * [[graft.operators.BpeTrain.encode]]'s higher-order-function chain
  * (HOFs are CodegenFallback; a per-merge fold chain interprets one
  * lambda call per symbol per merge). This expression applies the
  * WHOLE learned merge list in one tight JVM loop per row: for each
  * whitespace token, symbols start as characters (or UTF-8 bytes in
  * byte-level mode — see below) and each merge runs one greedy
  * left-to-right non-overlapping pass IN LEARNED ORDER — semantics
  * identical to the fold (spec-pinned equal), an order of magnitude
  * faster, and O(merges) per symbol instead of per lambda frame.
  *
  * Input contract: an ALREADY-normalized text column
  * ([[graft.functions.TextAnalysis.normalizeText]] — single spaces,
  * trimmed); the merge table is constructor metadata riding the plan
  * (codegen embeds it via a reference object), so tokenizing 100 TB
  * stays one scan with no model join. Returns the total subword count
  * across the row's tokens.
  *
  * `byteLevel = true` seeds one symbol per UTF-8 BYTE, each rendered
  * as a two-char lowercase hex pair ("c3","a9" for é) — the
  * production-tokenizer base alphabet (fixed 256 symbols, so NO
  * out-of-vocabulary character can ever exist). The hex rendering is
  * the cross-engine-replayable form: a SQL oracle restates the seed as
  * substrings of `hex(encode(word))`, and merge products concatenate
  * hex pairs exactly like char-mode products concatenate characters. */
case class BpeSubwordCount(child: Expression, merges: Seq[(String, String)],
                           byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_subword_count"

  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b) }.toArray

  override def nullSafeEval(s: Any): Any =
    BpeSubwordCount.subwords(s.asInstanceOf[UTF8String], mergeArr, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.BpeSubwordCount.subwords($c, $ref, $byteLevel)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSubwordCount =
    copy(child = newChild)
}

object BpeSubwordCount {

  /** Back-compat char-mode entry point (pre-byte-level signature). */
  def subwords(text: UTF8String, merges: Array[Array[String]]): Long =
    subwords(text, merges, byteLevel = false)

  /** The kernel: per token, seed symbols → each merge one greedy
    * left-to-right pass → count. Called from both interpreted eval and
    * generated code. */
  def subwords(text: UTF8String, merges: Array[Array[String]],
               byteLevel: Boolean): Long = {
    val s = text.toString
    var total = 0L
    var start = 0
    val n = s.length
    while (start <= n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val syms = seedSymbols(s, start, end, byteLevel)
        total += mergePass(syms, syms.length, merges)
      }
      start = end + 1
      if (end == n) start = n + 1
    }
    total
  }

  private val HEX = "0123456789abcdef".toCharArray

  /** Seed one token's symbol array. Char mode: one symbol per CODE
    * POINT, not per UTF-16 unit — the fold twin (`split(w, "")` keeps
    * surrogate pairs whole) and the oracle's `string_split` both work
    * per code point, so a supplementary-plane char must stay one
    * mergeable symbol, not two lone surrogates. Byte mode: one symbol
    * per UTF-8 byte as a lowercase hex pair. */
  private[graft] def seedSymbols(s: String, from: Int, until: Int,
                                 byteLevel: Boolean): Array[String] = {
    if (byteLevel) {
      val bytes = s.substring(from, until)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        val b = bytes(i) & 0xff
        out(i) = new String(Array(HEX(b >> 4), HEX(b & 0xf)))
        i += 1
      }
      out
    } else {
      val len = until - from
      val syms = new Array[String](len) // code points ≤ UTF-16 units
      var i = from
      var size = 0
      while (i < until) {
        val cp = s.codePointAt(i)
        val cw = Character.charCount(cp)
        syms(size) = s.substring(i, i + cw)
        i += cw
        size += 1
      }
      if (size == len) syms else java.util.Arrays.copyOf(syms, size)
    }
  }

  /** Apply every merge in learned order to `syms[0, size)` IN PLACE;
    * returns the post-merge symbol count (live prefix of `syms`). */
  private[graft] def mergePass(syms: Array[String], size0: Int,
                               merges: Array[Array[String]]): Int = {
    var size = size0
    var m = 0
    while (m < merges.length && size > 1) {
      val a = merges(m)(0)
      val b = merges(m)(1)
      var read = 0
      var write = 0
      while (read < size) {
        if (write > 0 && read < size && syms(write - 1) == a && syms(read) == b) {
          // greedy: the merged cell stays live as the new "last", so it
          // may merge again with the NEXT symbol — same as the fold
          syms(write - 1) = a + b
          read += 1
        } else {
          syms(write) = syms(read)
          read += 1
          write += 1
        }
      }
      size = write
      m += 1
    }
    size
  }
}
