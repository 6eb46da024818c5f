package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE tokenizer emitting TOKEN-ID ARRAYS — the missing half of
  * the training-data pipeline after [[BpeSubwordCount]] (which only
  * counts): normalized text → whitespace tokens → per-token greedy
  * merge replay (identical kernel, [[BpeSubwordCount.mergePass]]) →
  * each surviving symbol mapped to its vocabulary id → one flat
  * `array<int>` per document, words concatenated in order. This is the
  * row a pretraining pipeline feeds to packing ([[graft.operators.Packing]])
  * and sequence assembly.
  *
  * The vocabulary rides the plan as a reference object (an id lookup
  * table, not a join): tokenizing 100 TB stays ONE codegen'd scan with
  * no shuffle and no model broadcast round-trip. Id assignment is the
  * deterministic scheme [[graft.operators.BpeTrain.buildVocab]] fixes
  * (base symbols in UTF-8-byte order = ids `0..B-1`; merge `k`'s
  * product = `B+k-1`, first assignment wins), so a SQL oracle can
  * rebuild the identical table and replay every id. Symbols absent
  * from the vocabulary encode as -1 — impossible when the vocab was
  * built from the same corpus (char mode) or by construction in
  * byte-level mode (the 256-byte base alphabet covers any input — the
  * byte-fallback guarantee production tokenizers rely on). */
case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
                        vocab: Map[String, Int], byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "bpe_encode_ids"

  @transient private lazy val mergeArr: Array[Array[String]] =
    merges.map { case (a, b) => Array(a, b) }.toArray
  @transient private lazy val vocabMap: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](vocab.size * 2)
    vocab.foreach { case (s, i) => m.put(s, Integer.valueOf(i)) }
    m
  }

  override def nullSafeEval(s: Any): Any =
    BpeEncodeIds.encode(s.asInstanceOf[UTF8String], mergeArr, vocabMap, byteLevel)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergeArr, "java.lang.String[][]")
    val vRef = ctx.addReferenceObj("bpeVocab", vocabMap, "java.util.HashMap")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.BpeEncodeIds.encode($c, $mRef, $vRef, $byteLevel)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeIds =
    copy(child = newChild)
}

object BpeEncodeIds {

  /** Kernel: whole-document token-id emission in one pass. */
  def encode(text: UTF8String, merges: Array[Array[String]],
             vocab: java.util.HashMap[String, Integer],
             byteLevel: Boolean): GenericArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[Integer](s.length / 2 + 4)
    var start = 0
    val n = s.length
    while (start <= n) {
      var end = s.indexOf(' ', start)
      if (end < 0) end = n
      if (end > start) {
        val syms = BpeSubwordCount.seedSymbols(s, start, end, byteLevel)
        val size = BpeSubwordCount.mergePass(syms, syms.length, merges)
        var i = 0
        while (i < size) {
          val id = vocab.get(syms(i))
          out.add(if (id == null) Integer.valueOf(-1) else id)
          i += 1
        }
      }
      start = end + 1
      if (end == n) start = n + 1
    }
    val arr = new Array[Any](out.size())
    var i = 0
    while (i < arr.length) { arr(i) = out.get(i).intValue(); i += 1 }
    new GenericArrayData(arr)
  }
}
